"""Time expressions (SURVEY.md §2.8 F4-F6, F9).

Epoch-millis handling mirrors the reference's
``(col("timestamp")/1000).cast(TimestampType())``
(reference: NEW_train_offset_3_10min.py:118-121) but uses
``timestamp_millis`` which is exact (no double rounding).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def event_time_from_millis(col: str = "timestamp") -> Column:
    """Exact epoch-millis -> timestamp (avoids the reference's /1000 double)."""
    return F.timestamp_millis(F.col(col).cast("long"))


def time_bucket(col: str, duration: str) -> Column:
    """Tumbling time bucket as a plain column (reference builds the same with
    window() outside groupBy — joined_streams.py:60,80). window_time-free:
    produces struct<start,end> usable both as join key and group key."""
    return F.window(F.col(col), duration)


def floor_to(col: str, seconds: int) -> Column:
    """Floor a timestamp column to an N-second grid (pandas
    ``dt.floor('5s')`` equivalent — stream_eda.ipynb cell 14)."""
    return F.timestamp_seconds(
        # cast: NTZ/LTZ-indifferent (unix_timestamp is LTZ-only; no-op
        # on already-LTZ input, exact under the UTC session pin).
        (F.unix_timestamp(F.col(col).cast("timestamp")) / seconds).cast("long")
        * seconds
    )
