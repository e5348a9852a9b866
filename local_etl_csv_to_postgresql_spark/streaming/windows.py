"""Time-windowed aggregation operators, shared between batch and
Structured Streaming.

The reference is batch-only (SURVEY §2.10; reference
docs/LESSONS_LEARNED.md:65-67 lists streaming as unbuilt future work), so
these operators are the engine's forward-looking streaming surface built
the Spark-native way: one declarative plan that runs identically over a
batch DataFrame (for tests / oracle comparison) and a streaming DataFrame
(with watermarks applied only when ``df.isStreaming``).

Scale notes (100 TB / 1000-executor):
- Tumbling/sliding rollups are partial-aggregated map-side before the
  shuffle on (window, key) — no per-event shuffle amplification.
- Watermarks bound state: late events beyond the watermark are dropped,
  so state store size is O(active windows × keys), not O(stream length).
- ``session_window`` state is per-key and merges adjacent sessions;
  skewed users (bot traffic) are the risk — cap with a downstream filter
  or pre-filter on event quotas, not by widening the gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _maybe_watermark(df: DataFrame, ts_col: str, watermark: str | None) -> DataFrame:
    """Watermarks are only legal (and only meaningful) on streaming
    plans; batch plans simply see every row."""
    if watermark and df.isStreaming:
        return df.withWatermark(ts_col, watermark)
    return df


def tumbling_rollup(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Non-overlapping fixed windows: count + sum per (window, key).

    Batch twin of the reference-era ``q21_events_hourly`` — but expressed
    with ``F.window`` so the identical plan runs under ``readStream``.
    """
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(18,6)")).cast("double"), 4
            ).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "event_count",
            "total_value",
        )
    )


def sliding_rollup(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, duration, slide).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            key_col,
            "event_count",
        )
    )


def session_rollup(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Native session windows: a session extends while successive events
    arrive within ``gap`` of the previous event (inclusive — an event at
    exactly last_event + gap merges); the window closes at
    last_event + gap. One output row per (user, session).

    Batch semantics match the gaps-and-islands formulation (new session
    when ts - prev_ts > gap) — that formulation is the DuckDB oracle
    twin in streaming/queries.py.
    """
    df = _maybe_watermark(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "event_count",
        )
    )


def session_summary(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Per-user session statistics derived from ``session_rollup`` —
    the aggregate the oracle hash-checks (window bounds themselves are
    second-precision timestamps, stable across engines, but the compact
    per-user summary is the analytics-facing result)."""
    sessions = session_rollup(events, gap, ts_col, key_col, watermark=None)
    return (
        sessions.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("session_count"),
            F.sum("event_count").alias("event_count"),
            F.max("event_count").alias("max_session_events"),
        )
        .orderBy(key_col)
    )
