"""Unit tests for the shared JVM zip_with_index device
(operators/indexing.py) — the ordinal assigner behind the feature
dictionary (S3/S4) and the dedup shingle vocabulary."""

from pyspark.sql import functions as F

from photon_ml_spark.operators.indexing import zip_with_index


def _frame(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_dense_ids_in_sort_order(spark):
    vals = ["pear", "apple", "fig", "banana", "date", "cherry"]
    out, total = zip_with_index(_frame(spark, vals), "k", id_col="i")
    assert total == 6
    rows = out.orderBy("i").collect()
    assert [r.i for r in rows] == list(range(6))
    assert [r.k for r in rows] == sorted(vals)


def test_start_offset_and_multiple_partitions(spark):
    vals = [f"k{j:04d}" for j in range(257)]
    out, total = zip_with_index(
        _frame(spark, vals), "k", id_col="i", start=1, n_partitions=7
    )
    assert total == 257
    agg = out.agg(
        F.min("i").alias("lo"),
        F.max("i").alias("hi"),
        F.countDistinct("i").alias("nd"),
    ).collect()[0]
    assert (agg.lo, agg.hi, agg.nd) == (1, 257, 257)
    # spot-check order: id of the minimum key is `start`
    first = out.orderBy("k").first()
    assert first.k == "k0000" and first.i == 1


def test_empty_input(spark):
    out, total = zip_with_index(
        _frame(spark, []).filter("k IS NOT NULL"), "k", id_col="i"
    )
    assert total == 0
    assert out.count() == 0
    assert dict(out.dtypes)["i"] == "bigint"


def test_extra_columns_preserved(spark):
    df = spark.createDataFrame(
        [("b", 20), ("a", 10), ("c", 30)], "k string, v int"
    )
    out, _ = zip_with_index(df, "k", id_col="i")
    rows = {r.k: (r.i, r.v) for r in out.collect()}
    assert rows == {"a": (0, 10), "b": (1, 20), "c": (2, 30)}


def test_single_data_shuffle_plan(spark):
    """The round-8 scale fix, pinned: the only data shuffle is the
    range exchange INSIDE the checkpoint build, so the post-checkpoint
    id job (the plan probed here — localCheckpoint truncates lineage
    to a Scan ExistingRDD) must add ZERO further exchanges of the
    data. The earlier row_number-over-pid window forced a full
    hashpartitioning exchange here — 10.9x wall for 3.3x keys at 100M
    (BASELINE round 8)."""
    df = spark.range(10_000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k")
    )
    out, _ = zip_with_index(df, "k", id_col="i", n_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    # shuffle exchanges only — BroadcastExchange (the offset relation)
    # is the cheap intended path, not a data shuffle
    data_exchanges = re.findall(
        r"\bExchange (hashpartitioning|rangepartitioning|"
        r"SinglePartition)", plan
    )
    assert data_exchanges == [], plan
    # offsets arrive by broadcast hash join, never a shuffle join
    assert "BroadcastHashJoin" in plan
    assert "Window" not in plan


def test_reserved_names_rejected(spark):
    import pytest

    df = spark.createDataFrame([("a", 1)], "k string, __mid int")
    with pytest.raises(ValueError, match="__mid"):
        zip_with_index(df, "k")
    clean = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError, match="__off"):
        zip_with_index(clean, "k", id_col="__off")
    # Spark resolves column names case-insensitively by default, so an
    # upper-cased variant collides just as silently — the guard must
    # catch it too.
    upper = spark.createDataFrame([("a", 1)], "k string, __PID int")
    with pytest.raises(ValueError, match="__pid"):
        zip_with_index(upper, "k")
    with pytest.raises(ValueError, match="__mid"):
        zip_with_index(clean, "k", id_col="__MID")
