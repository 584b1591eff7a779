"""Streaming extension: the batch-verified operators must produce the
same results when run as Structured Streaming micro-batches (file
source, availableNow trigger, memory sink)."""

import os

import pytest
from pyspark.sql import functions as F

from photon_ml_spark.sources.datasets import normalize_event_ts
from photon_ml_spark.streaming.events import (
    score_events,
    sessionize,
    stream_source,
    user_session_stats,
    windowed_event_counts,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SMOKE_SF_DIR", "/root/testdata/sf0.001")
# ts arrives as a raw epoch long (micros or nanos depending on the
# data generation; normalize_event_ts detects the unit by magnitude)
EVENT_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, "
    "value double, props string"
)


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def _assert_frames_equal(a, b, sort_cols):
    pa = a.orderBy(*sort_cols).toPandas()
    pb = b.orderBy(*sort_cols).toPandas()
    assert pa.columns.tolist() == pb.columns.tolist()
    assert len(pa) == len(pb)
    for c in pa.columns:
        assert pa[c].tolist() == pb[c].tolist(), f"column {c} differs"


@pytest.fixture(scope="module")
def events_batch(spark):
    return normalize_event_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))


@pytest.fixture(scope="module")
def events_stream(spark):
    return normalize_event_ts(
        stream_source(
            spark, SF_DIR, EVENT_SCHEMA, max_files_per_trigger=1,
            glob="events.parquet",
        )
    )


def test_normalize_event_ts_ambiguous_magnitude_raises(spark):
    """Outside the documented 1971..2200 window the micros/nanos
    magnitude heuristic is unsound — must fail fast, not silently
    pick a unit (e.g. 1969 nanos would read as year-2286+ micros)."""
    ok = spark.createDataFrame([(1_700_000_000_000_000,)], "ts long")
    assert normalize_event_ts(ok).count() == 1  # 2023, in-window
    bad = spark.createDataFrame([(10_000_000_000,)], "ts long")  # 1970-04
    with pytest.raises(Exception, match="ambiguous epoch magnitude"):
        normalize_event_ts(bad).collect()


def test_windowed_counts_stream_matches_batch(spark, events_batch, events_stream):
    batch = windowed_event_counts(events_batch)
    stream = windowed_event_counts(events_stream, watermark="2 hours")
    got = _run_stream(spark, stream, "win_counts")
    _assert_frames_equal(batch, got, ["window_start", "event_type"])


def test_sessionize_stream_matches_batch(spark, events_batch, events_stream):
    batch = sessionize(events_batch)
    stream = sessionize(events_stream, watermark="2 hours")
    got = _run_stream(spark, stream, "sessions")
    _assert_frames_equal(batch, got, ["user_id", "session_start"])


def test_user_session_stats(spark, events_batch):
    stats = user_session_stats(sessionize(events_batch))
    row = stats.agg(
        F.sum("total_events").alias("total"), F.count(F.lit(1)).alias("users")
    ).first()
    assert row.total == events_batch.count()
    assert row.users == events_batch.select("user_id").distinct().count()


def test_score_events_is_stateless_on_stream(spark, events_stream):
    scored = score_events(
        events_stream, coefficients=[0.5], intercept=-1.0, feature_cols=["value"]
    )
    q = (
        scored.writeStream.format("memory")
        .queryName("scored_events")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT count(*) AS n, sum(abs(score - (value * 0.5 - 1.0))) AS err "
        "FROM scored_events"
    ).first()
    assert out.n > 0
    assert out.err < 1e-9


def test_first_seen_stream_matches_batch(spark, events_batch, events_stream):
    from photon_ml_spark.streaming.events import first_seen

    got = _run_stream(spark, first_seen(events_stream), "first_seen_t")
    _assert_frames_equal(
        first_seen(events_batch), got, ["user_id", "event_type"]
    )


def test_running_user_stats_stateful(spark, events_batch, events_stream):
    """applyInPandasWithState custom stateful operator: the final
    per-user state after draining the stream equals the batch
    aggregate."""
    from photon_ml_spark.streaming.events import running_user_stats

    stream = running_user_stats(events_stream)
    q = (
        stream.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # update mode appends one row per (user, batch); keep the latest
    got = spark.sql(
        """
        SELECT user_id, n_events, value_sum, max_value FROM (
          SELECT *, ROW_NUMBER() OVER (
            PARTITION BY user_id ORDER BY n_events DESC) AS rn
          FROM running_stats) WHERE rn = 1
        """
    )
    expected = events_batch.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.sum(F.round(F.col("value") * 100, 0)) / 100).alias("value_sum"),
        F.max("value").alias("max_value"),
    )
    _assert_frames_equal(
        expected.select("user_id", "n_events", "value_sum", "max_value"),
        got,
        ["user_id"],
    )


def test_interval_join_stream_matches_batch(spark, events_batch, events_stream):
    """Stream-stream interval join (watermarked, append mode — inner
    matches emit as found) must equal the batch join."""
    from photon_ml_spark.streaming.events import interval_join_events

    def sides(src):
        return (
            src.filter(F.col("event_id") % 3 == 0),
            src.filter(F.col("event_id") % 5 == 0),
        )

    lb, rb = sides(events_batch)
    batch = interval_join_events(lb, rb, gap="10 minutes")
    ls, rs = sides(events_stream)
    stream = interval_join_events(
        ls, rs, gap="10 minutes", watermark="2 hours"
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("ivj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT * FROM ivj")
    _assert_frames_equal(
        batch, got, ["user_id", "l_event_id", "r_event_id"]
    )
