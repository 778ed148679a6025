"""Watermarked event-time window aggregation over a stream.

The late-data story for streaming analytics on the engine's tables:
event-time tumbling windows with a watermark bound the state Structured
Streaming keeps, and rows arriving later than the watermark are dropped
(exactly the task's "watermarks + windowed aggs for late data"). In
append mode a window's aggregate emits once, when the watermark passes
the window end — so downstream consumers (e.g. encode_stream into a
blocks table) see each window exactly once.

Scale shape: groupBy(window, keys) is an ordinary hash aggregation with
partial aggregation map-side; state is sharded by (window, keys) across
executors and bounded by watermark horizon x key cardinality.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def windowed_event_stats(stream_df: DataFrame, ts_col: str = "ts",
                         window: str = "1 minute",
                         watermark: str = "5 minutes",
                         keys: Sequence[str] = (),
                         value_col: str = None) -> DataFrame:
    """Tumbling event-time windows with late-data tolerance `watermark`.

    Returns (window_start, window_end, *keys, n_events[, sum_value]).
    Works on static DataFrames too (withWatermark is a no-op there), so
    the same query is unit-testable in batch."""
    agg = [F.count("*").alias("n_events")]
    if value_col is not None:
        agg.append(F.sum(value_col).alias("sum_value"))
    out = (stream_df.withWatermark(ts_col, watermark)
           .groupBy(F.window(ts_col, window), *[F.col(k) for k in keys])
           .agg(*agg))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        *[F.col(k) for k in keys],
        *[F.col(c) for c in (["n_events"]
                             + (["sum_value"] if value_col else []))])
