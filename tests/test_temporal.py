"""Semantic tests for the temporal join operators (operators/temporal.py)."""

import pytest
from pyspark.sql import functions as F

from photon_ml_spark.operators.temporal import as_of_join, range_join


def test_as_of_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 5, "c"), (2, 15, "d"), (3, 9, "e")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100.0), (1, 20, 200.0), (2, 30, 300.0)],
        "k long, ts long, v double",
    )
    out = {
        r.tag: (r.asof_ts, r.asof_v)
        for r in as_of_join(left, right, on="k").collect()
    }
    assert out["a"] == (5, 100.0)    # latest snapshot at/before 10
    assert out["b"] == (20, 200.0)   # equal ts is inclusive
    assert out["c"] == (5, 100.0)    # exactly at the snapshot
    assert out["d"] == (None, None)  # only future snapshots → unmatched
    assert out["e"] == (None, None)  # key with no right rows at all
    assert len(out) == 5             # left join: every left row survives


def test_as_of_join_matches_sql_correlated(spark):
    """Window rendering must equal the quadratic correlated-subquery
    definition on real data."""
    ev = spark.range(0, 500).select(
        (F.col("id") % 7).alias("k"),
        ((F.col("id") * 37) % 1000).alias("ts"),
        F.col("id").alias("uid"),
    )
    right = ev.filter(F.col("uid") % 3 == 0).groupBy("k", "ts").agg(
        F.max("uid").alias("v")
    )
    left = ev.filter(F.col("uid") % 3 != 0)
    got = {
        r.uid: (r.asof_ts, r.asof_v)
        for r in as_of_join(left, right, on="k").collect()
    }
    # naive quadratic reference: join every candidate, keep the latest
    from pyspark.sql import Window

    j = (
        left.join(
            right.select("k", F.col("ts").alias("rts"), "v"), "k"
        ).filter(F.col("rts") <= F.col("ts"))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("uid").orderBy(F.desc("rts"))
            ),
        )
        .filter("rn = 1")
    )
    matched = {r.uid: (r.rts, r.v) for r in j.collect()}
    want = {
        r.uid: matched.get(r.uid, (None, None)) for r in left.collect()
    }
    assert got == want and any(v != (None, None) for v in want.values())


@pytest.mark.parametrize("bucket_width", [1, 7, 100, 10_000])
def test_range_join_matches_naive(spark, bucket_width):
    """Bucketed decomposition must equal the raw BETWEEN join for any
    bucket width (width only changes cost, never the result)."""
    left = spark.range(0, 300).select(
        (F.col("id") % 5).alias("k"),
        ((F.col("id") * 13) % 500).alias("t"),
        F.col("id").alias("uid"),
    )
    right = spark.range(0, 40).select(
        (F.col("id") % 5).alias("k"),
        ((F.col("id") * 29) % 400).alias("t_start"),
        (((F.col("id") * 29) % 400) + 50).alias("t_end"),
        F.col("id").alias("rid"),
    )
    got = {
        (r.uid, r.rid)
        for r in range_join(
            left, right, on="k", left_ts="t",
            right_start="t_start", right_end="t_end",
            bucket_width=bucket_width,
        ).collect()
    }
    naive = {
        (r.uid, r.rid)
        for r in left.join(right, "k")
        .filter((F.col("t") >= F.col("t_start")) & (F.col("t") <= F.col("t_end")))
        .collect()
    }
    assert got == naive and naive
