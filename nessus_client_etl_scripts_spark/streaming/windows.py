"""Streaming window operators (SURVEY.md §2.9's extension surface).

``windowed_severity_counts`` is the streaming twin of the batch hourly
rollup (testdata_queries q18): same tumbling-window semantics via
``F.window``, plus an event-time watermark so state is bounded and late
documents beyond the horizon are dropped deterministically.

``sessionized_stream`` is the streaming twin of the batch
sessionization (q19): ``F.session_window`` with a gap — state closes a
session when no event lands within the gap + watermark.

Both take EITHER a batch or a streaming DataFrame: the expressions are
identical (that's the point — one semantics, two execution modes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def windowed_severity_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    watermark: str = "2 hours",
    group_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Watermarked tumbling-window counts/sums.

    State bound: one row per (window, group) within the watermark
    horizon; partial aggregation happens map-side before the keyed
    state store, so the shuffle carries partial sums, not events.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.window(ts_col, window).alias("w"), *group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *group_cols,
            "n_events",
            "total_value",
        )
    )


def sessionized_stream(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Gap-based sessions via ``session_window`` — the built-in stateful
    operator; no custom applyInPandasWithState needed for plain gap
    semantics (custom state logic lives in stateful.py)."""
    src = events
    if events.isStreaming:
        src = events.withWatermark(ts_col, watermark)
    return (
        src.groupBy(F.session_window(ts_col, gap).alias("w"), key_col)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("session_value"),
        )
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "session_value",
        )
    )
