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
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 1,
    num_hashes: int = 16,
    bands: int = 4,
) -> None:
    """Process ONE micro-batch (or one daily batch — same function):
    drop near-dups against the index, append survivors to ``out_path``
    and their dedup state to ``index_path``. Bootstraps the index from
    the first batch when ``index_path`` is empty."""
    from photon_ml_spark.operators.dedup import (
        cluster_and_keep,
        drop_new_duplicates,
        incremental_neardup,
        minhash_lsh_dedup,
        minhash_signatures,
        save_minhash_index,
        token_ids_hashed,
    )

    spark = batch.sparkSession
    if batch.isEmpty():
        return
    if not _hadoop_exists(spark, f"{index_path}/signatures"):
        # bootstrap: batch-internal LSH dedup, survivors found the index
        pairs = minhash_lsh_dedup(
            batch, threshold=threshold, n=n, id_col=id_col,
            text_col=text_col, num_hashes=num_hashes, bands=bands,
        )
        survivors = (
            cluster_and_keep(batch, pairs, id_col=id_col)
            .filter("is_keep")
            .drop("cluster_id", "is_keep")
        )
        survivors.write.mode("append").parquet(out_path)
        save_minhash_index(
            survivors, index_path, id_col=id_col, text_col=text_col,
            n=n, num_hashes=num_hashes,
        )
        return

    # at-least-once idempotence: ids already indexed were handled by a
    # prior (possibly partially-failed) run of this same batch
    indexed_ids = spark.read.parquet(f"{index_path}/signatures").select(id_col)
    fresh = batch.join(indexed_ids, id_col, "left_anti")
    if fresh.isEmpty():
        return
    # one shingle-id relation serves detection AND the index append;
    # explicitly unpersisted so a long-running stream doesn't leak one
    # cached frame per trigger
    sids = token_ids_hashed(fresh, id_col, text_col, n).persist()
    try:
        pairs = incremental_neardup(
            fresh, index_path, threshold=threshold, id_col=id_col,
            text_col=text_col, n=n, num_hashes=num_hashes, bands=bands,
            new_sids=sids,
        )
        survivors = drop_new_duplicates(
            fresh, pairs, indexed_ids, id_col=id_col
        ).persist()
        survivors.write.mode("append").parquet(out_path)
        keep_sids = sids.join(
            survivors.select(id_col), id_col, "left_semi"
        )
        keep_sids.write.mode("append").parquet(f"{index_path}/doc_sids")
        minhash_signatures(keep_sids, id_col, num_hashes).write.mode(
            "append"
        ).parquet(f"{index_path}/signatures")
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
            batch, index_path, out_path,
            threshold=threshold, id_col=id_col, text_col=text_col,
            n=n, num_hashes=num_hashes, bands=bands,
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
