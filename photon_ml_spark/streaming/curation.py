"""Streaming corpus curation: near-dup dedup over a document stream.

The batch side of this flow already exists — ``save_minhash_index``
builds the persisted LSH state, ``incremental_neardup`` joins a new
batch against it, ``drop_new_duplicates`` resolves keepers — so the
streaming surface is a thin ``foreachBatch`` composition: Structured
Streaming supplies ordered, replayable micro-batches, and each batch
runs the SAME incremental-dedup code a daily batch job would run.
(The reference is batch-only — SURVEY §2.8 — this module is part of
the rebuild's streaming extension, like streaming/events.py.)

Semantics (first-seen-wins, the near-dup analog of ``first_seen``):

- a new doc near-matching any already-indexed doc is dropped;
- within a batch, near-dup clusters keep the canonical min-id doc;
- survivors are appended to the output AND to the index state, so the
  next micro-batch (or tomorrow's batch job — the state is shared)
  sees them.

Fault tolerance: ``foreachBatch`` is at-least-once, so a replayed
micro-batch must be idempotent. Docs whose ids are already indexed are
filtered out up front — a retried batch finds its own survivors in the
index, drops them as already-present, and appends nothing new. (The
parquet appends themselves can leave duplicate FILES on a crash
between the two writes; production hardening would stage per-batch-id
subdirectories — the standard foreachBatch idempotence recipe — which
is orthogonal to the dedup logic and omitted here.)

State growth: the index gains one signature row and one shingle-set
per SURVIVING doc — the same O(corpus) state the batch index carries;
LSH banding keeps per-batch join cost O(|batch| · bucket occupancy),
never a corpus scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _hadoop_exists(spark: SparkSession, path: str) -> bool:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    return p.getFileSystem(conf).exists(p)


def neardup_process_batch(
    batch: DataFrame,
    index_path: str,
    out_path: str,
    batch_id: int = 0,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    num_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Process ONE micro-batch (or one daily batch — same function):
    drop near-dups against the index, publish survivors under
    ``out_path`` and their dedup state under ``index_path``.
    Bootstraps the index (and its parameter manifest) from the first
    batch when ``index_path`` is empty.

    ``batch_id`` is the replay-stable batch identity (Structured
    Streaming's foreachBatch id; a date ordinal for daily jobs). Every
    write is an OVERWRITE of the batch's own ``batch=<id>`` staging
    subdirectory — the standard foreachBatch exactly-once recipe — so
    a replay after a crash at ANY point rewrites identical content
    instead of appending duplicates (survivor sets are deterministic
    given the batch and the prior index state, which a failed attempt
    never mutates outside its own staging dirs)."""
    from photon_ml_spark.operators.dedup import (
        cluster_and_keep,
        drop_new_duplicates,
        incremental_neardup,
        minhash_lsh_dedup,
        minhash_signatures,
        token_ids_hashed,
        write_index_params,
    )

    spark = batch.sparkSession
    if batch.isEmpty():
        return

    def publish(survivors, sids):
        keep_sids = sids.join(
            survivors.select(id_col), id_col, "left_semi"
        )
        survivors.write.mode("overwrite").parquet(
            f"{out_path}/batch={int(batch_id)}"
        )
        keep_sids.write.mode("overwrite").parquet(
            f"{index_path}/doc_sids/batch={int(batch_id)}"
        )
        minhash_signatures(keep_sids, id_col, num_hashes).write.mode(
            "overwrite"
        ).parquet(f"{index_path}/signatures/batch={int(batch_id)}")

    if not _hadoop_exists(spark, f"{index_path}/signatures"):
        # bootstrap: batch-internal LSH dedup, survivors found the index
        sids = token_ids_hashed(batch, id_col, text_col, n).persist()
        try:
            pairs = minhash_lsh_dedup(
                batch, threshold=threshold, n=n, id_col=id_col,
                text_col=text_col, num_hashes=num_hashes, bands=bands,
                doc_sids=sids,
            )
            survivors = (
                cluster_and_keep(batch, pairs, id_col=id_col)
                .filter("is_keep")
                .drop("cluster_id", "is_keep")
            )
            write_index_params(
                spark, index_path, n=n, num_hashes=num_hashes
            )
            publish(survivors, sids)
        finally:
            sids.unpersist()
        return

    # Replay safety: the prior index state is the stored relations
    # MINUS this batch's own staging partition — a replayed batch (even
    # after a crash mid-publish) recomputes against exactly the state
    # it saw the first time, so the staged overwrites rewrite identical
    # content. (A per-doc "already indexed" prefilter would NOT be
    # safe: docs dropped as duplicates never enter the index, so the
    # filter would shrink the batch on replay and the overwrite would
    # wipe the original survivors.)
    not_mine = F.col("batch") != int(batch_id)
    old_sigs = spark.read.parquet(f"{index_path}/signatures").filter(not_mine)
    old_sids = spark.read.parquet(f"{index_path}/doc_sids").filter(not_mine)
    # one shingle-id relation serves detection AND the index append;
    # explicitly unpersisted so a long-running stream doesn't leak one
    # cached frame per trigger
    sids = token_ids_hashed(batch, id_col, text_col, n).persist()
    try:
        pairs = incremental_neardup(
            batch, index_path, threshold=threshold, id_col=id_col,
            text_col=text_col, n=n, num_hashes=num_hashes, bands=bands,
            new_sids=sids, old_sids=old_sids, old_sigs=old_sigs,
        )
        survivors = drop_new_duplicates(
            batch, pairs, old_sigs.select(id_col), id_col=id_col
        ).persist()
        publish(survivors, sids)
        survivors.unpersist()
    finally:
        sids.unpersist()


def stream_neardup(
    docs_stream: DataFrame,
    index_path: str,
    out_path: str,
    checkpoint_path: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    num_hashes: int = 16,
    bands: int = 4,
):
    """Attach the near-dedup sink to a streaming document source and
    start it (availableNow trigger — drain the backlog, then stop; use
    the returned query's ``awaitTermination``). Each micro-batch runs
    ``neardup_process_batch`` against the shared index state."""

    def _process(batch: DataFrame, batch_id: int) -> None:
        neardup_process_batch(
            batch, index_path, out_path, batch_id=batch_id,
            threshold=threshold, id_col=id_col, text_col=text_col,
            n=n, num_hashes=num_hashes, bands=bands,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
