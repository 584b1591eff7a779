"""Streaming near-dedup: the foreachBatch composition must match the
same incremental-dedup code run as sequential daily batches, and a
replayed batch must be a no-op (at-least-once idempotence)."""

import glob
import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from photon_ml_spark.streaming.curation import (
    neardup_process_batch,
    stream_neardup,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
DOC_SCHEMA = "doc_id long, source string, lang string, text string"


def _write_single_file(df, dst_dir, name):
    """Write df as exactly one parquet file named ``name`` in dst_dir."""
    tmp = os.path.join(dst_dir, f"__tmp_{name}")
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
    out = os.path.join(dst_dir, name)
    shutil.copyfile(part, out)
    shutil.rmtree(tmp)
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "lang", "text"
    )


def test_stream_neardup_matches_sequential_batches(spark, tmp_path_factory, docs):
    root = str(tmp_path_factory.mktemp("stream_neardup"))
    src = os.path.join(root, "src")
    os.makedirs(src)
    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    f_a = _write_single_file(half_a, src, "batch_a.parquet")
    f_b = _write_single_file(half_b, src, "batch_b.parquet")
    # the file source orders micro-batches by modification time — pin it
    now = time.time()
    os.utime(f_a, (now - 100, now - 100))
    os.utime(f_b, (now, now))

    # reference: the SAME function as two sequential daily batches
    idx_b = os.path.join(root, "index_batch")
    out_b = os.path.join(root, "out_batch")
    for i, half in enumerate((half_a, half_b)):
        neardup_process_batch(
            half, idx_b, out_b, batch_id=i, threshold=0.5, n=2, bands=8
        )
    batch_ids = sorted(
        r.doc_id for r in spark.read.parquet(out_b).select("doc_id").collect()
    )

    # stream: one micro-batch per file
    idx_s = os.path.join(root, "index_stream")
    out_s = os.path.join(root, "out_stream")
    stream = (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_neardup(
        stream, idx_s, out_s, os.path.join(root, "ckpt"),
        threshold=0.5, n=2, bands=8,
    )
    q.awaitTermination(300)
    stream_ids = sorted(
        r.doc_id for r in spark.read.parquet(out_s).select("doc_id").collect()
    )

    assert len(stream_ids) == len(set(stream_ids))  # no dup survivors
    assert 0 < len(stream_ids) < docs.count()  # dedup actually dropped docs
    assert stream_ids == batch_ids

    # index state covers exactly the survivors
    idx_ids = sorted(
        r.doc_id
        for r in spark.read.parquet(f"{idx_s}/signatures")
        .select("doc_id")
        .collect()
    )
    assert idx_ids == stream_ids

    # at-least-once replay: re-running the last batch changes nothing
    neardup_process_batch(
        half_b, idx_b, out_b, batch_id=1, threshold=0.5, n=2, bands=8
    )
    again = sorted(
        r.doc_id for r in spark.read.parquet(out_b).select("doc_id").collect()
    )
    assert again == batch_ids
