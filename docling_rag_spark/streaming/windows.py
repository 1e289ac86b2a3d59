"""Watermarked tumbling-window aggregation over an event stream.

The late-data surface of Structured Streaming: per (window, event_type)
counts with an event-time watermark. Events later than the watermark delay
are dropped by the engine; windows finalize (emit, in append mode) once the
watermark passes their end — the batch twin is ``queries/relational.py::
events_hourly``. State is the open windows only, so memory is bounded by
(delay / window) × key cardinality regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(events: DataFrame,
                    window: str = "1 hour",
                    watermark_delay: str = "2 hours") -> DataFrame:
    """events stream (ts, event_type, value) → finalized window rows."""
    return (events
            .withWatermark("ts", watermark_delay)
            .groupBy(F.window("ts", window).alias("w"), "event_type")
            .agg(F.count("*").alias("n"),
                 F.sum(F.floor(F.col("value") * 1000).cast("bigint"))
                  .alias("value_milli"))
            .select(F.col("w.start").alias("window_start"),
                    F.col("w.end").alias("window_end"),
                    "event_type", "n", "value_milli"))
