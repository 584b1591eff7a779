"""Wide-dictionary stress: build_feature_dictionary at millions of
distinct feature keys — the reference's own scale hazard (it swaps to
off-heap PalDB stores above ~200k features, FeatureIndexingDriver.
scala:41-42; SURVEY flags 100M-feature vocabularies).

Times the S3/S4 dictionary job over a synthetic corpus of N unique
(name, term) keys (one per row, so the distinct is the full N) and
prints one JSON line. A/B usage against another commit's package:

    PYTHONPATH=. DICT_KEYS=10000000 python scripts/stress_dictionary.py
    PYTHONPATH=/path/to/r6-worktree DICT_KEYS=10000000 \
        python scripts/stress_dictionary.py

The timing covers the FULL dictionary job — explode/distinct, the
ordinal assignment, and a noop-write materialization — plus a
validation pass (count + contiguity probe) outside the timer.
"""

from __future__ import annotations

import json
import os
import time


def main() -> None:
    n_keys = int(os.environ.get("DICT_KEYS", "10000000"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    # sweep knobs (round-9 residual attribution): range-exchange
    # partition count of the ordinal job, and shuffle partitions for
    # the distinct stage — vary one at a time against the 24g/32-part
    # baseline to separate plan cost from spill IO
    range_parts = os.environ.get("DICT_RANGE_PARTS")
    range_parts = int(range_parts) if range_parts else None
    shuffle_parts = os.environ.get("DICT_SHUFFLE_PARTS")
    shuffle_parts = int(shuffle_parts) if shuffle_parts else None

    from pyspark.sql import functions as F

    from photon_ml_spark.session import get_spark
    from photon_ml_spark.sources.featurize import build_feature_dictionary

    spark = get_spark(
        app_name="stress-dictionary", master=f"local[{cpus}]",
        shuffle_partitions=shuffle_parts,
    )
    spark.sparkContext.setLogLevel("WARN")
    par = spark.sparkContext.defaultParallelism

    # N rows, each carrying ONE unique feature key -> vocabulary == N.
    # xxhash-based name scrambles the key order relative to generation
    # order so the range-partitioned sort does real work.
    corpus = spark.range(n_keys).repartition(par).select(
        F.array(
            F.struct(
                F.concat(
                    F.lit("f"), F.xxhash64("id").cast("string")
                ).alias("name"),
                F.col("id").cast("string").alias("term"),
                F.lit(1.0).alias("value"),
            )
        ).alias("features")
    )

    # warmup: JVM/codegen on an unrelated tiny job
    spark.range(1000).groupBy((F.col("id") % 7).alias("k")).count().collect()

    t0 = time.perf_counter()
    d = build_feature_dictionary(
        corpus, ["features"], has_intercept=True, n_partitions=range_parts
    )
    d.write.format("noop").mode("overwrite").save()
    wall = round(time.perf_counter() - t0, 2)

    # validation outside the timer: dense contiguous 0..N ids
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("feature_index").alias("lo"),
        F.max("feature_index").alias("hi"),
        F.countDistinct("feature_index").alias("nd"),
    ).collect()[0]
    assert stats.n == n_keys + 1, stats  # +1 intercept
    assert (stats.lo, stats.hi, stats.nd) == (0, n_keys, n_keys + 1), stats

    print(
        json.dumps(
            {
                "metric": "dictionary_build_sec",
                "value": wall,
                "unit": "sec",
                "n_keys": n_keys,
                "parallelism": par,
                "range_parts": range_parts or par,
                "shuffle_parts": shuffle_parts,
                "driver_mem": os.environ.get("SPARK_GRAFT_DRIVER_MEM"),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
