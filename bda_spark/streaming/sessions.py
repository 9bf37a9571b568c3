"""Streaming session windows (SURVEY.md §2.9 T2's data-driven sibling).

The reference's windows are all CLOCK-driven (fixed 10-minute tumbling
buckets — reference: NEW_train_offset_3_10min.py:149-171). Session
windows are the data-driven class: a window extends while events keep
arriving within ``gap`` of the last one and closes when the stream
goes quiet — trading-burst detection, user-session analytics. Batch
form is plans/timeseries.events_sessionize; this is the LIVE form:
``F.session_window`` under a watermark, where the state store merges
adjacent windows as ticks arrive and the watermark both bounds state
and finalizes sessions (a session is emittable in append mode once
the watermark passes its end — no new tick can extend it anymore).

State economics at scale: one open session row per active key, merged
in place — not one row per event — and closed sessions leave the
store at watermark passage; an infinite stream holds state
proportional to ACTIVE keys only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.timeutils import event_time_from_millis


def sessionize_ticks(
    ticks: DataFrame,
    gap: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-symbol session aggregation over a (streaming or batch) tick
    frame: sessions close after ``gap`` of silence; the watermark is
    only applied when the input actually streams, so the same function
    is its own batch oracle (identical plan minus the watermark node).
    """
    with_time = ticks.withColumn(
        "event_time", event_time_from_millis("timestamp")
    )
    if ticks.isStreaming:
        with_time = with_time.withWatermark("event_time", watermark)
    return (
        with_time.groupBy("symbol", F.session_window("event_time", gap))
        .agg(
            F.count("*").alias("n_ticks"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
        )
        .select(
            "symbol",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_ticks",
            "min_price",
            "max_price",
        )
    )
