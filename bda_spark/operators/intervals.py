"""Bucketed interval (range) join — the missing join class between
equi (hash/sort-merge) and as-of (nearest-preceding): "every point
inside [start, end)". Spark has no native interval join; the naive
formulation (non-equi theta predicate) plans as a nested-loop join —
O(points x intervals) compares, a non-starter at 100 TB.

The standard scale rewrite (Flink's interval join / KDB window join
families): quantize time into fixed buckets, explode each interval
into the buckets it overlaps (intervals are short relative to the
data span, so the fan-out is small and bounded by ceil(len/bucket)+1),
equi-join points to interval-fragments on (keys..., bucket) — a plain
hash shuffle join — then refine with the exact range predicate. The
bucket size trades fragment fan-out (too small) against candidate
false positives killed by the refine filter (too large); set it near
the TYPICAL interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start: str,
    end: str,
    keys: list[str] | None = None,
    bucket_seconds: int = 3600,
    closed_end: bool = False,
) -> DataFrame:
    """Inner-join each point row to every interval row that contains
    it: same ``keys`` and ``start <= point_ts < end`` (``<= end`` when
    ``closed_end``). Returns points columns + the interval's columns.

    Bucket ids are plain epoch arithmetic (floor(unix_seconds /
    bucket_seconds) — NOT ``F.window``, whose analyzer forbids two
    window expressions in one projection and which would build a
    struct per row just to take its start), so both sides agree by
    construction; the interval side explodes via ``sequence`` over
    its overlapped bucket ids. The only shuffle is the
    (keys, bucket) equi-join — skew follows the bucket population,
    which AQE's skew-join split handles like any hot key."""
    keys = list(keys or [])
    secs = int(bucket_seconds)

    def bucket_of(c: Column) -> Column:
        return F.floor(F.unix_timestamp(c.cast("timestamp")) / secs).cast("long")

    p = points.withColumn("_ij_bucket", bucket_of(F.col(point_ts)))

    # degenerate/empty intervals can't match any point and would feed
    # sequence() a stop before its start — drop them up front
    nonempty = (
        (F.col(end) >= F.col(start)) if closed_end else (F.col(end) > F.col(start))
    )
    intervals = intervals.filter(nonempty)

    last_contained = (
        F.col(end)
        if closed_end
        else F.col(end) - F.expr("INTERVAL 1 MICROSECOND")
    )
    i = intervals.withColumn(
        "_ij_bucket",
        F.explode(
            F.sequence(bucket_of(F.col(start)), bucket_of(last_contained))
        ),
    )

    cond = [p["_ij_bucket"] == i["_ij_bucket"]] + [
        p[k] == i[k] for k in keys
    ]
    range_pred = (p[point_ts] >= i[start]) & (
        (p[point_ts] <= i[end]) if closed_end else (p[point_ts] < i[end])
    )
    joined = p.join(i, cond).filter(range_pred)
    # project: all point columns + interval columns minus duplicated keys
    out_cols = [p[c] for c in points.columns] + [
        i[c] for c in intervals.columns if c not in keys
    ]
    return joined.select(*out_cols)
