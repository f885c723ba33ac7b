"""Watermarked event-time windowed aggregation over a change stream.

The engine's MERGE path needs no streaming state (the per-row ``_lsn``
high-water mark in the target table self-corrects late/out-of-order events —
SURVEY.md §2.9), but stream OBSERVABILITY does: per-window per-key event
rates with bounded state. This is the idiomatic Structured Streaming shape —
``withWatermark`` bounds how late an event may arrive, append mode emits a
window only once it can no longer change, and state for closed windows is
dropped, so the aggregation runs forever in bounded memory.

Late-data contract (verified by ``tests/test_streaming.py``): an event
arriving after ``watermark_delay`` past its window close is DROPPED from the
windowed counts — by design; the MERGE path still applies it correctly via
LWW, the two surfaces are deliberately decoupled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def windowed_event_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "source",
    window_duration: str = "10 seconds",
    watermark_delay: str = "10 seconds",
    count_col: str = "n_events",
) -> DataFrame:
    """(window.start, window.end, key, n_events) with bounded state.

    Works on streaming and batch frames alike (batch ignores the watermark),
    so the same definition serves the streaming job and its batch oracle."""
    src = stream
    if stream.isStreaming:
        src = stream.withWatermark(ts_col, watermark_delay)
    w = F.window(F.col(ts_col), window_duration)
    return (
        src.groupBy(w.alias("_w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias(count_col))
        .select(
            F.col("_w.start").alias("window_start"),
            F.col("_w.end").alias("window_end"),
            key_col,
            count_col,
        )
    )
