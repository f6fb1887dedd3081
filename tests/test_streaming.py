"""Structured Streaming: the windowed ops run incrementally with a
watermark, and batch vs streaming results agree on the same input."""

import os
import time

import pyspark.sql.functions as F
import pytest

from inform_spark.streaming.windows import (
    session_window_agg,
    sessionize,
    sliding_counts,
    tumbling_counts,
)


@pytest.fixture(scope="module")
def events(spark):
    from inform_spark.session import DEFAULT_SHUFFLE_PARTITIONS  # noqa: F401

    return spark.read.parquet("/root/testdata/sf0.001/events.parquet").cache()


def test_tumbling_batch_matches_sql_window(spark, events):
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(events).collect()
    }
    want = {
        (r["ws"], r["event_type"]): (r["n"], r["s"])
        for r in events.groupBy(
            F.date_trunc("hour", "ts").alias("ws"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"), F.round(F.sum("value"), 6).alias("s"))
        .collect()
    }
    assert got == want


def test_sessionize_gap_semantics(spark):
    rows = [
        (1, 10, "2024-01-01 00:00:00"),
        (2, 10, "2024-01-01 00:10:00"),   # same session (10 min gap)
        (3, 10, "2024-01-01 01:00:00"),   # new session (50 min gap)
        (4, 11, "2024-01-01 00:00:00"),   # other user
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    out = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in sessionize(df).collect()
    }
    assert out == {(10, 1): 2, (10, 2): 1, (11, 1): 1}


def test_streaming_tumbling_with_watermark(spark, events, tmp_path):
    """The SAME tumbling_counts plan over a file stream: incremental
    execution, watermark-gated state, complete-mode memory sink equals the
    batch result."""
    src = str(tmp_path / "stream-src")
    events.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = tumbling_counts(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumble_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from tumble_smoke").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in tumbling_counts(events).collect()
    }
    assert got == want


def test_sliding_hop_membership(spark, events):
    """Hopping windows (1h width, 30m slide): every event lands in exactly
    width/slide = 2 windows, and each hop window's count equals the sum of
    its two constituent 30-minute tumbling buckets."""
    hop = sliding_counts(events, width="1 hour", slide="30 minutes")
    n_events = events.count()
    assert hop.agg(F.sum("n_events")).collect()[0][0] == 2 * n_events
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in hop.collect()
    }
    half = {
        (r["ws"], r["event_type"]): r["n"]
        for r in events.groupBy(
            F.window("ts", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .select(F.col("w.start").alias("ws"), "event_type", "n")
        .collect()
    }
    from datetime import timedelta

    for (ws, et), n in got.items():
        want = half.get((ws, et), 0) + half.get(
            (ws + timedelta(minutes=30), et), 0
        )
        assert n == want, (ws, et)


def test_streaming_sliding_with_watermark(spark, events, tmp_path):
    """The SAME sliding_counts plan over a file stream equals batch."""
    src = str(tmp_path / "slide-src")
    events.coalesce(1).write.parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    agg = sliding_counts(stream, watermark="2 hours")
    q = (
        agg.writeStream.format("memory")
        .queryName("slide_smoke")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("select * from slide_smoke").collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in sliding_counts(events).collect()
    }
    assert got == want


def test_session_window_agg_streamable(spark, events):
    # native session_window path: every event accounted for exactly once
    out = session_window_agg(events, gap="30 minutes")
    assert out.agg(F.sum("n_events")).collect()[0][0] == events.count()
