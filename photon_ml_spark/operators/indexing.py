"""Dense sequential id assignment, entirely JVM-side.

The one device shared by every "give each distinct key a contiguous
ordinal" consumer (feature dictionaries, shingle vocabularies):
``ROW_NUMBER() OVER (ORDER BY key)`` computed WITHOUT a
single-partition window and WITHOUT leaving Tungsten — the
zipWithIndex two-job trick (count partitions, then number within
each) expressed as DataFrame ops:

1. ``repartitionByRange`` on the order columns — a range-partitioned
   sort, so partition p holds keys strictly below partition p+1;
2. ``localCheckpoint`` — range boundaries come from sampling, and the
   count job and the id job MUST read the same partitioning
   (re-execution could legally resample);
3. one tiny collect of per-partition counts (n_partitions rows, never
   data rows) → driver prefix sum → each partition's start offset;
4. per-partition ``row_number`` plus a **broadcast-joined** (pid,
   offset) relation. A broadcast hash join is O(1) per row; the
   earlier inline ``create_map`` literal was a linear scan over
   n_partitions entries per row — measurable extra work on the
   largest relation in a dedup pipeline once a real cluster runs
   thousands of shuffle partitions.

The reference needed PalDB off-heap stores above ~200k features
(FeatureIndexingDriver.scala:41-42) because its index map lived on
the driver; here the vocabulary never leaves the executors and the
only driver traffic is the n_partitions-row count collect, so the
same code path serves 100 features and 100M.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def zip_with_index(
    df: DataFrame,
    order_cols: str | list[str],
    id_col: str = "idx",
    start: int = 0,
    n_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Attach a dense sequential long ``id_col`` in ``order_cols``
    order (ids = start, start+1, ...). Returns ``(frame, total_count)``
    — the count is free (it is the prefix-sum total), so callers never
    pay a second ``count()`` job to learn the dictionary size.

    Equivalent to ``ROW_NUMBER() OVER (ORDER BY order_cols) - 1 +
    start`` with no single-partition bottleneck: the sort is
    range-partitioned across ``n_partitions`` (default cluster
    parallelism) and each partition numbers its own rows.
    """
    if isinstance(order_cols, str):
        order_cols = [order_cols]
    spark = df.sparkSession
    n_parts = n_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, *order_cols)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    total = sum(counts.values())
    if not counts:  # empty input: no window, no join
        return ranged.drop("__pid").withColumn(
            id_col, F.lit(start).cast("long")
        ).limit(0), 0
    offsets, acc = [], 0
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    # JVM literal construction (inline over a struct array) instead of
    # createDataFrame: keeps the whole job free of Scan ExistingRDD /
    # Python row serialization — the plan-probe tests assert this.
    off_df = spark.range(1).select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(pid).cast("int").alias("__pid"),
                        F.lit(off).cast("long").alias("__off"),
                    )
                    for pid, off in offsets
                ]
            )
        )
    )
    w = Window.partitionBy("__pid").orderBy(*order_cols)
    # row_number is IntegerType: cast to long BEFORE the addition so a
    # vocabulary crossing 2^31 ids cannot wrap int32 mid-expression
    out = (
        ranged.join(F.broadcast(off_df), "__pid")
        .withColumn(
            id_col,
            F.row_number().over(w).cast("long")
            - F.lit(1).cast("long")
            + F.col("__off")
            + F.lit(start).cast("long"),
        )
        .drop("__pid", "__off")
    )
    return out, total
