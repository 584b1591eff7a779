"""Skew mitigation (SURVEY §4: the reference hand-builds a bin-packing
partitioner for skewed entities, RandomEffectDatasetPartitioner.scala:
98-170; Spark-first the first line of defense is AQE skew-join, and
these helpers cover what AQE cannot rewrite).

- ``salted_join``: replicate the small side k ways, salt the big side's
  key deterministically — a skewed key's rows spread over k reducers.
  For joins where the small side is too big to broadcast but the big
  side has heavy keys.
- ``two_stage_agg``: pre-aggregate on (key, salt) then finalize on key.
  Useful when a non-algebraic aggregation (collect_list/set) on a
  heavy key would overload one reducer; algebraic aggs (sum/count/
  min/max) already partial-aggregate map-side and don't need this.

Salts derive from ``xxhash64`` of stable columns — deterministic across
retries (the reference's byteswap64-seed discipline,
RandomEffectDataset.scala:504-511).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def salt_col(n_salts: int, *cols: Column | str) -> Column:
    """Deterministic salt in [0, n_salts) from stable column values."""
    return F.pmod(F.xxhash64(*cols), F.lit(n_salts)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
    how: str = "inner",
    salt_by: list[str] | None = None,
) -> DataFrame:
    """Equi-join with key salting: ``big`` rows get a deterministic salt
    (from ``salt_by`` columns, default all of big's columns), ``small``
    is replicated once per salt value. Result equals
    ``big.join(small, key, how)`` for inner/left joins.

    Cost: small side × n_salts shuffle volume — choose k ≈ (heaviest
    key rows) / (target rows per task).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    sb = [F.col(c) for c in (salt_by or big.columns)]
    b = big.withColumn("__salt", salt_col(n_salts, *sb))
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return b.join(s, [key, "__salt"], how).drop("__salt")


def two_stage_agg(
    df: DataFrame,
    key: str,
    list_col: str,
    n_salts: int = 8,
    out_col: str | None = None,
) -> DataFrame:
    """Skew-safe ``groupBy(key).collect_list(list_col)``: collect per
    (key, salt) first, then flatten per key — a heavy key's rows are
    gathered by ``n_salts`` tasks instead of one. Output order within
    the list is normalized by ``array_sort`` (collect_list order is
    non-deterministic either way)."""
    out = out_col or f"{list_col}s"
    partial = (
        df.withColumn("__salt", salt_col(n_salts, F.col(list_col)))
        .groupBy(key, "__salt")
        .agg(F.collect_list(list_col).alias("__part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.array_sort(F.flatten(F.collect_list("__part"))).alias(out))
    )
