"""Structured-Streaming extension (SURVEY §2.8).

The reference is batch-only — time exists only as daily directory
partitions (IOUtils.scala:115-164). This module is the rebuild's
optional streaming surface: every transformation is written against a
plain DataFrame so THE SAME CODE runs in batch (tests, oracle checks)
and under ``readStream`` (production). Scoring is stateless, windowed
aggregation uses event-time + watermark, sessionization uses
``session_window`` — all JVM-side operators, no Python state.

Scale notes: windowed aggregation shuffles on (window, key) — state
store size is bounded by watermark eviction; scoring adds no state at
all (the model joins in as a broadcast or literal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def stream_source(
    spark: SparkSession,
    path: str,
    schema: str,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
) -> DataFrame:
    """File-based streaming source (parquet dir). ``maxFilesPerTrigger``
    bounds per-micro-batch input — the knob that keeps batch size
    (and thus state-update volume) constant as the backlog grows.
    ``glob`` filters file names within the directory (the source
    requires a directory path)."""
    reader = spark.readStream.schema(schema).format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if glob is not None:
        reader = reader.option("pathGlobFilter", glob)
    return reader.load(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "15 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + exact value sums per key.

    Batch/stream dual-use: pass ``watermark`` only on a streaming
    DataFrame (bounds state retention; late rows beyond it drop).
    Value sums go through a cents-grid round so window totals are
    order-independent (exactness convention).
    """
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(F.window(ts_col, window).alias("win"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0)) / 100).alias("value_sum"),
        )
        .select(
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            F.col(key_col),
            "n_events",
            "value_sum",
        )
    )


def sessionize(
    events: DataFrame,
    gap: str = "5 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session aggregation via ``session_window`` (merging
    windows that close ``gap`` after the last event). Stateful under
    streaming; identical semantics in batch."""
    src = events.withWatermark(ts_col, watermark) if watermark else events
    return (
        src.groupBy(
            F.session_window(F.col(ts_col), gap).alias("win"), F.col(user_col)
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0)) / 100).alias("value_sum"),
        )
        .select(
            F.col(user_col),
            F.date_format(F.col("win.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "value_sum",
        )
    )


def user_session_stats(sessions: DataFrame, user_col: str = "user_id") -> DataFrame:
    """Roll sessions up to per-user stats (n_sessions, events in the
    largest session, total events)."""
    return sessions.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.max("n_events").alias("max_session_events"),
        F.sum("n_events").cast("long").alias("total_events"),
    )


def extract_props(
    events: DataFrame, fields: dict[str, str], props_col: str = "props"
) -> DataFrame:
    """Typed JSON property extraction: {out_col: json_path} — the F3
    map-value-cast analog (AvroDataReader.scala:453-468) for the JSON
    payloads a real event stream carries. ``get_json_object`` is
    JVM-side (Jackson), codegen-friendly."""
    out = events
    for name, path in fields.items():
        out = out.withColumn(name, F.get_json_object(F.col(props_col), path))
    return out


RUNNING_STATS_SCHEMA = (
    "user_id long, n_events long, value_sum double, max_value double"
)
_RUNNING_STATE_SCHEMA = "n long, vsum double, vmax double"


def running_user_stats(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful streaming operator via
    ``applyInPandasWithState``: a per-user running (count, exact
    cents-grid value sum, max) maintained across micro-batches — the
    pattern for stateful logic the built-in windowed aggregations can't
    express (per-key model state, decaying counters, session ML
    features). Emits the updated per-user row every batch; state never
    expires here (NoTimeout) — add a timeout for unbounded key spaces.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def update(key, pdfs, state):
        n, vsum, vmax = (
            state.get if state.exists else (0, 0.0, float("-inf"))
        )
        for pdf in pdfs:
            n += len(pdf)
            vsum += float((pdf["value"] * 100).round(0).sum()) / 100
            if len(pdf):
                vmax = max(vmax, float(pdf["value"].max()))
        state.update((n, vsum, vmax))
        yield pd.DataFrame(
            {
                "user_id": [key[0]],
                "n_events": [n],
                "value_sum": [vsum],
                "max_value": [vmax],
            }
        )

    src = events.withWatermark(ts_col, watermark) if events.isStreaming else events
    return src.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def first_seen(
    events: DataFrame,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming exact-dedup bookkeeping: one row per logical event key
    carrying its FIRST occurrence (earliest (ts, id) — deterministic
    tie-break) and the occurrence count.

    Batch/stream dual-use: a plain groupBy + min(struct) + count, so
    under ``readStream`` it is a watermark-boundable stateful agg whose
    state is ONE (ts, id, count) triple per key — the scalable form of
    streaming dropDuplicates, with the duplicate count the dedup
    report needs. (Built-in ``dropDuplicatesWithinWatermark`` keeps
    arrival order — nondeterministic under replay; this keeps
    event-time order.)"""
    key_cols = key_cols or ["user_id", "event_type"]
    first = F.min(
        F.struct(F.col(ts_col).alias("ts"), F.col(id_col).alias("id"))
    ).alias("__first")
    return (
        events.groupBy(*[F.col(c) for c in key_cols])
        .agg(first, F.count(F.lit(1)).alias("n_occurrences"))
        .select(
            *key_cols,
            F.date_format("__first.ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
            F.col("__first.id").alias("first_event_id"),
            "n_occurrences",
        )
    )


def score_events(
    events: DataFrame,
    coefficients: list[float],
    intercept: float,
    feature_cols: list[str],
) -> DataFrame:
    """Stateless streaming scoring (the GameScoringDriver analog over a
    stream): literal-coefficient dot product — no state, no shuffle,
    survives any trigger cadence."""
    margin = F.lit(float(intercept))
    for c, b in zip(feature_cols, coefficients):
        margin = margin + F.col(c).cast("double") * float(b)
    return events.withColumn("score", margin)


def interval_join_events(
    left: DataFrame,
    right: DataFrame,
    on: str = "user_id",
    gap: str = "10 minutes",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Batch/stream dual-use interval join: each left event pairs with
    every same-key right event whose time falls in
    ``[left_ts, left_ts + gap]`` — the session-stitching / attribution
    join (click → conversions within the window).

    Streaming: pass ``watermark`` and both sides get event-time
    watermarks; the range condition inside the join predicate is
    exactly what Structured Streaming's stream-stream join needs to
    bound its state (rows age out once the watermark passes
    ``left_ts + gap``). Append output mode only, per the engine's
    stream-stream join contract.

    Batch: identical code path minus the watermarks; Catalyst plans
    the equi-key part as a hash join with the range as a post-filter
    (for huge skewless batch runs prefer ``operators/temporal.
    range_join``'s bucket decomposition — same semantics).
    """
    l_ = left.select(
        F.col(on).alias("__k"),
        F.col(ts_col).alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
    )
    r_ = right.select(
        F.col(on).alias("__rk"),
        F.col(ts_col).alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
    )
    if watermark:
        l_ = l_.withWatermark("l_ts", watermark)
        r_ = r_.withWatermark("r_ts", watermark)
    cond = (
        (F.col("__k") == F.col("__rk"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {gap}"))
    )
    return (
        l_.join(r_, cond, "inner")
        .select(
            F.col("__k").alias(on),
            "l_event_id", "r_event_id",
            F.date_format("l_ts", "yyyy-MM-dd HH:mm:ss").alias("l_ts"),
            F.date_format("r_ts", "yyyy-MM-dd HH:mm:ss").alias("r_ts"),
        )
    )
