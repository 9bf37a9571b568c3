"""Time-grid gap interpolation (SURVEY.md §2.5 W2) and first/last-valid
coverage trim (W3) — the pandas ``resample().interpolate()`` /
``first_valid_index``/``last_valid_index`` pair the reference applies to
every symbol before modeling (reference: Deliverable_3/stream_eda.ipynb
cells 19, 24, 29-30), re-expressed as pure window algebra.

SURVEY risk #3 flags this as the one operator Spark has no built-in for.
The construction:

1. bucket observations to an N-second grid (``floor_to``), avg per cell
2. per key, build the full grid spine with ``sequence()`` between the
   first and last OBSERVED cell — the spine's bounds ARE the W3 trim
   (no leading/trailing extrapolation rows are ever materialized)
3. left-join observations onto the spine -> interior gaps are nulls
4. one ordered window per direction carries (last valid value, its
   timestamp) forward and (first valid value, its timestamp) backward
5. linear blend: v = pv + (nv - pv) * (t - pt) / (nt - pt)

Scale shape: everything partitions by the series key — the windows are
``partitionBy(key).orderBy(grid_ts)``, so no partitionless sort; the
spine explode is per-key and proportional to that key's time span, and
the join back is a co-partitioned hash join on (key, grid_ts). At
100 TB the only hazard is a single key spanning years at a fine grid
(sequence cap 2^31); chunk the spine by day via an extra crossJoin key
if that ever binds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.timeutils import floor_to


def trim_to_valid(
    df: DataFrame, key_col: str, order_col: str, value_col: str
) -> DataFrame:
    """W3: drop each key's rows before its first / after its last
    non-null ``value_col`` (pandas first_valid_index/last_valid_index —
    reference: stream_eda.ipynb cell 29-30). Interior nulls survive
    (they're W2's job). Single shuffle on ``key_col``."""
    marker = F.when(F.col(value_col).isNotNull(), F.col(order_col))
    w = Window.partitionBy(key_col)
    return (
        df.withColumn("_first_valid", F.min(marker).over(w))
        .withColumn("_last_valid", F.max(marker).over(w))
        .filter(
            F.col(order_col).between(F.col("_first_valid"), F.col("_last_valid"))
        )
        .drop("_first_valid", "_last_valid")
    )


def _blend(t: Column, pv: Column, pt: Column, nv: Column, nt: Column) -> Column:
    """Linear interpolation between the carried neighbors; exact at the
    endpoints because the blend is only applied to gap rows."""
    frac = (t.cast("double") - pt.cast("double")) / (
        nt.cast("double") - pt.cast("double")
    )
    return pv + (nv - pv) * frac


def grid_interpolate(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    grid_seconds: int,
    bucket_ndigits: int | None = None,
) -> DataFrame:
    """W2: per-key uniform time grid with linearly interpolated gaps.

    Returns (key_col, grid_ts, value, is_interpolated). Grid cells that
    had observations carry their cell average; empty interior cells get
    the linear blend of the nearest valid neighbors. The spine spans
    exactly [first observed cell, last observed cell] per key (W3).

    ``bucket_ndigits`` rounds the cell averages before blending — the
    oracle-comparison policy (identical blend inputs on both engines
    make the IEEE blend arithmetic bit-identical); leave None in
    pipelines."""
    # null measurements are non-observations: a cell whose values are
    # ALL null must become a gap (interpolated), not a null-valued
    # "observed" cell — and it must not extend the spine's bounds, or
    # leading/trailing null cells would leak null output rows labeled
    # is_interpolated=true
    df = df.where(F.col(value_col).isNotNull())
    avg_v = F.avg(value_col)
    if bucket_ndigits is not None:
        avg_v = F.round(avg_v, bucket_ndigits)
    buckets = (
        df.groupBy(
            F.col(key_col), floor_to(ts_col, grid_seconds).alias("grid_ts")
        )
        .agg(avg_v.alias("_v"))
    )
    bounds = buckets.groupBy(key_col).agg(
        F.min("grid_ts").alias("_t0"), F.max("grid_ts").alias("_t1")
    )
    step = F.expr(f"INTERVAL {grid_seconds} SECONDS")
    spine = bounds.select(
        key_col, F.explode(F.sequence("_t0", "_t1", step)).alias("grid_ts")
    )
    g = spine.join(buckets, [key_col, "grid_ts"], "left")

    wp = (
        Window.partitionBy(key_col)
        .orderBy("grid_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy(key_col)
        .orderBy("grid_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    valid_ts = F.when(F.col("_v").isNotNull(), F.col("grid_ts"))

    def ut(c):
        # NTZ/LTZ-indifferent epoch seconds: unix_timestamp is LTZ-only,
        # and callers may pass frames the source boundary didn't
        # canonicalize (the cast is a no-op on LTZ input).
        col = F.col(c) if isinstance(c, str) else c
        return F.unix_timestamp(col.cast("timestamp"))

    filled = (
        g.withColumn("_pv", F.last("_v", ignorenulls=True).over(wp))
        .withColumn("_pt", F.last(valid_ts, ignorenulls=True).over(wp))
        .withColumn("_nv", F.first("_v", ignorenulls=True).over(wf))
        .withColumn("_nt", F.first(valid_ts, ignorenulls=True).over(wf))
    )
    value = F.when(F.col("_v").isNotNull(), F.col("_v")).otherwise(
        _blend(
            ut("grid_ts"), F.col("_pv"), ut(F.col("_pt")), F.col("_nv"), ut(F.col("_nt"))
        )
    )
    return filled.select(
        key_col,
        "grid_ts",
        value.alias("value"),
        F.col("_v").isNull().alias("is_interpolated"),
    )
