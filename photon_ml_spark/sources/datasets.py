"""Derive GAME-style training frames from the driver's synthetic tables.

The reference trains on Avro rows carrying (name, term, value) feature
arrays (TrainingExampleAvro.avsc). We derive an equivalent frame from
the TPC-H-ish testdata so every pipeline stage is exercised on real
parquet: label from ``l_returnflag``, numeric line-item measures as a
feature bag, customer/supplier keys as random-effect id tags.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def _ntv(name: str, term: str, value):
    """One (name, term, value) feature struct (FeatureAvro.avsc shape)."""
    return F.struct(
        F.lit(name).alias("name"), F.lit(term).alias("term"),
        value.cast("double").alias("value"),
    )


def lineitem_training_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem ⋈ orders → (uid, response, offset, weight, tags, features).

    - ``uid``: deterministic row_number over a unique column ordering.
      (The engine path for uid assignment is
      ``monotonically_increasing_id`` — P2, GameConverters.scala:62
      zipWithUniqueId equivalent; tests/oracle need a *stable* id, so
      this derivation sorts. Test scaffolding only — not a pattern for
      100 TB ingest.)
    - ``response``: 1.0 when the line was returned (l_returnflag = 'R').
    - feature bag ``features``: scaled numeric measures.
    - id tags: ``suppkey`` / ``custkey`` for per-entity (random-effect)
      coordinates.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    df = li.join(orders, li.l_orderkey == orders.o_orderkey, "inner")
    uid_order = Window.orderBy(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    return df.select(
        F.row_number().over(uid_order).cast("long").alias("uid"),
        F.when(F.col("l_returnflag") == "R", 1.0).otherwise(0.0).alias("response"),
        F.lit(0.0).alias("offset"),
        F.lit(1.0).alias("weight"),
        F.col("l_suppkey").cast("string").alias("suppkey"),
        F.col("o_custkey").cast("string").alias("custkey"),
        F.array(
            _ntv("li", "qty", F.col("l_quantity") / 50.0),
            _ntv("li", "price", F.col("l_extendedprice") / 100000.0),
            _ntv("li", "discount", F.col("l_discount")),
            _ntv("li", "tax", F.col("l_tax")),
            _ntv("ord", "total", F.col("o_totalprice") / 500000.0),
        ).alias("features"),
    )
