"""Skew salting equivalence + bucketed-join shuffle elimination."""

import io
import contextlib

from pyspark.sql import functions as F

from photon_ml_spark.operators.skew import salted_join, two_stage_agg
from photon_ml_spark.sources.bucketing import cojoin_bucketed, write_bucketed


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_salted_join_matches_plain_join(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_quantity"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_nationkey"
    )
    plain = li.join(sup, "l_suppkey").groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(li, sup, "l_suppkey", n_salts=4).groupBy(
        "s_nationkey"
    ).agg(F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("q"))
    a = {r.s_nationkey: (r.n, r.q) for r in plain.collect()}
    b = {r.s_nationkey: (r.n, r.q) for r in salted.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark):
    big = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (99, "d")], "k long, v string"
    )
    small = spark.createDataFrame([(1, "X"), (2, "Y")], "k long, s string")
    out = salted_join(big, small, "k", n_salts=3, how="left")
    rows = {(r.k, r.v, r.s) for r in out.collect()}
    assert (99, "d", None) in rows and len(rows) == 4


def test_two_stage_agg_matches_single_stage(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    single = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list("o_orderkey")).alias("o_orderkeys")
    )
    staged = two_stage_agg(o, "o_custkey", "o_orderkey", n_salts=4)
    diff = single.exceptAll(staged).count() + staged.exceptAll(single).count()
    assert diff == 0


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    write_bucketed(li, "bktest.li_b", "l_orderkey", n_buckets=8)
    write_bucketed(o, "bktest.o_b", "l_orderkey", n_buckets=8)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the shuffle-join path so the plan shows what bucketing
        # buys (at real scale neither side would be broadcastable)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cojoin_bucketed(spark, "bktest.li_b", "bktest.o_b", "l_orderkey")
        plan = _explain(joined)
        assert "SortMergeJoin" in plan
        # the co-location point: neither side re-shuffles
        assert "Exchange" not in plan
        assert joined.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bktest.li_b")
        spark.sql("DROP TABLE IF EXISTS bktest.o_b")
