"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are staples of training-data assembly — attach the most recent
feature/model snapshot to each example (as-of), or attach every
campaign/session/window a row falls inside (range) — and both have
well-known scalable renderings on a shuffle engine:

- **as-of**: union both sides tagged, one shuffle on the key, one
  per-key ordered window pass carrying the latest right-side payload
  forward (``last(..., ignorenulls)``). This IS the merge-join shape a
  native engine uses, expressed declaratively; no point-in-time
  windowing tricks, no per-key collect.
- **range**: a raw `l.ts BETWEEN r.start AND r.end` predicate gives
  Catalyst nothing to hash on → BroadcastNestedLoopJoin (quadratic).
  Bucketizing time into fixed-width buckets and exploding each right
  interval over the buckets it covers turns it into an equi-join on
  (key, bucket) + exact-predicate filter — the standard interval-join
  decomposition (Flink's interval join and DuckDB's IEJoin solve the
  same problem; this is the shuffle-engine rendering).

No driver state, no collects; every shuffle is on (key) or
(key, bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload_cols: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same key group (backward
    as-of, inclusive — DuckDB/pandas ``ASOF JOIN`` semantics). Left
    rows with no prior right row keep NULL payloads (left join).

    ``payload_cols`` defaults to every right column except the keys and
    timestamp; matched columns come back as ``{prefix}{col}`` plus
    ``{prefix}ts`` (the matched snapshot time).

    Scale shape: ONE shuffle on the key (the union), ONE per-key sort
    (the window) — identical cost to a sort-merge equi-join. At equal
    timestamps the right row sorts first, so a snapshot taken at
    exactly t is visible to a left row at t. The right side must be
    unique per (key, right_ts); pre-aggregate otherwise (enforced by
    the caller, checked cheaply here only in the sort order being
    deterministic).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if payload_cols is None:
        payload_cols = [
            c for c in right.columns if c not in keys and c != right_ts
        ]
    r = right.select(
        *keys,
        F.col(right_ts).alias("__t"),
        F.lit(0).alias("__side"),  # right first at equal ts (inclusive)
        F.col(right_ts).alias(f"{prefix}ts"),
        *[F.col(c).alias(f"{prefix}{c}") for c in payload_cols],
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(f"__l_{c}")
            for c in left.columns
        ],
    )
    l_ = left.select(
        *keys,
        F.col(left_ts).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(dict(right.dtypes)[right_ts]).alias(f"{prefix}ts"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{prefix}{c}")
            for c in payload_cols
        ],
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy("__t", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = r.unionByName(l_).select(
        "*",
        *[
            F.last(F.col(c), ignorenulls=True).over(w).alias(f"__f_{c}")
            for c in [f"{prefix}ts"] + [f"{prefix}{c}" for c in payload_cols]
        ],
    )
    out_cols = [F.col(f"__l_{c}").alias(c) for c in left.columns] + [
        F.col(f"__f_{prefix}ts").alias(f"{prefix}ts")
    ] + [
        F.col(f"__f_{prefix}{c}").alias(f"{prefix}{c}") for c in payload_cols
    ]
    return filled.filter(F.col("__side") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str | None,
    left_ts: str,
    right_start: str,
    right_end: str,
    bucket_width: int,
) -> DataFrame:
    """Inner join of left rows to every right interval containing them:
    ``right_start ≤ left_ts ≤ right_end`` (inclusive both ends), with
    optional equality keys ``on``.

    ``bucket_width`` (same unit as the timestamps — seconds for
    ``long`` epochs, etc.) trades explosion factor against candidate
    density: each right interval is exploded over the
    ``⌈len/width⌉ + 1`` buckets it covers, each left row hashes to
    exactly one bucket, and the join is a plain equi-join on
    (keys, bucket) followed by the exact range filter. Pick the width
    near the typical interval length so the explosion factor stays
    O(1). Degenerates gracefully: intervals much longer than the width
    explode into more buckets (cost ∝ interval length — unavoidable,
    that interval really does match more rows).
    """
    keys = [] if on is None else ([on] if isinstance(on, str) else list(on))
    bw = F.lit(int(bucket_width))
    r = right.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(right_start) / bw),
                F.floor(F.col(right_end) / bw),
            )
        ),
    )
    l_ = left.withColumn("__bucket", F.floor(F.col(left_ts) / bw))
    joined = l_.join(r, [*keys, "__bucket"]).filter(
        (F.col(left_ts) >= F.col(right_start))
        & (F.col(left_ts) <= F.col(right_end))
    )
    return joined.drop("__bucket")
