"""Event-time windowed analytics — same logical ops for batch and
Structured Streaming DataFrames.

The reference has no streaming operators (its loop is processing-time
batch, SURVEY §2.7); these are the event-stream ops a crawl/metrics
pipeline needs at scale: tumbling-window rollups of fetch metrics, and
gap-based sessionization of per-host activity. Each function takes a plain
DataFrame — pass a ``readStream`` DataFrame (with ``with_watermark=True``)
and the same plan runs incrementally with state cleanup; pass a batch
DataFrame and the identical results are DuckDB-checkable
(``__spark_entry__.oracle_sql``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key tumbling-window count + value sum. Epoch-aligned windows, so
    a '1 hour' window start equals date_trunc('hour', ts) — the property the
    DuckDB oracle uses. Map-side partial aggregation; one shuffle on
    (window, key)."""
    df = events
    if watermark is not None:
        # watermarks require TIMESTAMP (not NTZ); session tz is UTC
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    width: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Per-key HOPPING-window count + value sum (width > slide ⇒ each event
    lands in width/slide overlapping windows). Spark's ``F.window(ts,
    width, slide)`` expands each row into its windows BEFORE the shuffle,
    so map-side partial aggregation still applies — one shuffle on
    (window, key), fan-out bounded by width/slide.

    Epoch-aligned window starts (same property as :func:`tumbling_counts`),
    which makes the op exactly SQL-checkable: a hop of width W and slide S
    equals the UNION of W/S tumbling rollups offset by i·S — the DuckDB
    oracle formulation in ``__spark_entry__.oracle_sql``."""
    df = events
    if watermark is not None:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, width, slide).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key_col,
            "n_events",
            "sum_value",
        )
    )


def sessionize(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessions per user (batch formulation): a new session starts
    when the previous event is more than ``gap_minutes`` away; session_id is
    the running count of session starts. One shuffle (partition by user);
    the per-user window never becomes a single global partition.

    Streaming equivalent: ``F.session_window(ts, gap)`` — kept separate in
    :func:`session_window_agg` because its output contract (window bounds)
    differs from the analytic-window formulation DuckDB can check."""
    w = Window.partitionBy(user_col).orderBy(ts_col, "event_id")
    gap_s = gap_minutes * 60
    prev = F.lag(ts_col).over(w)
    # full-precision epoch seconds (micros preserved) — matches DuckDB
    # epoch(); the intermediate cast handles TIMESTAMP_NTZ parquet columns
    # (session tz is UTC)
    def _epoch(c):
        return c.cast("timestamp").cast("double")

    is_start = (
        prev.isNull() | ((_epoch(F.col(ts_col)) - _epoch(prev)) > gap_s)
    ).cast("int")
    with_sess = events.withColumn("__start", is_start).withColumn(
        "session_id", F.sum("__start").over(w).cast("long")
    )
    return (
        with_sess.groupBy(user_col, "session_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
        )
    )


def session_window_agg(
    events: DataFrame,
    ts_col: str = "ts",
    user_col: str = "user_id",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Native Spark session windows (streaming-capable with watermark)."""
    df = events
    if watermark is not None:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("w"), F.col(user_col))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            user_col,
            "n_events",
        )
    )
