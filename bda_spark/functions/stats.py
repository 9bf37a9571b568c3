"""Statistical aggregates (SURVEY.md §2.4 A4, A7, A8, A12).

All single-pass DataFrame aggregations — no collect() loops. Spearman is
rank-window + Pearson (exact at test scale; at 100 TB swap the global
rank for an ``approxQuantile``-bucketed rank, same API).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def null_count_vector(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row: null/NaN count per column, single pass
    (replaces the reference's per-column loop — stream_and_historical_model.py:316-319)."""
    cols = cols or df.columns
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        is_null = F.col(c).isNull()
        if dtypes[c] in ("double", "float"):
            is_null = is_null | F.isnan(F.col(c))
        aggs.append(F.count(F.when(is_null, F.lit(1))).alias(c))
    return df.agg(*aggs)


def profile_stats(
    df: DataFrame, group_cols: list[str], metric_cols: list[str], ndigits: int = 2
) -> DataFrame:
    """Per-group min/max/mean/stddev for each metric, rounded
    (reference: EDA_silver.ipynb cell 18 — 20 aggregates in one pass)."""
    aggs = []
    for m in metric_cols:
        aggs += [
            F.round(F.min(m), ndigits).alias(f"min_{m}"),
            F.round(F.max(m), ndigits).alias(f"max_{m}"),
            F.round(F.avg(m), ndigits).alias(f"mean_{m}"),
            F.round(F.stddev(m), ndigits).alias(f"std_{m}"),
        ]
    return df.groupBy(*group_cols).agg(*aggs)


def pearson(df: DataFrame, x: str, y: str, by: list[str] | None = None) -> DataFrame:
    """Pearson correlation aggregate (reference: joined_streams.py:108-110)."""
    if by:
        return df.groupBy(*by).agg(F.corr(x, y).alias("correlation"))
    return df.agg(F.corr(x, y).alias("correlation"))


def avg_ranks(
    df: DataFrame, col: str, out: str = "avg_rank", num_ranges: int = 32,
    bounds: list[float] | None = None, materialize: bool = True,
    counts: DataFrame | None = None,
) -> DataFrame:
    """Average (tie-adjusted) rank per distinct value of ``col``.

    avg_rank(v) = #{x < v} + (count(v)+1)/2 — exactly the mean of the
    row_numbers inside v's tie group, computed WITHOUT any global sort:

    1. histogram: groupBy(col) -> per-value counts (hash shuffle)
    2. range-partition the histogram on col (``repartitionByRange``
       assigns ascending value ranges to ascending partition ids)
    3. local cumsum inside each range partition — the ordered window is
       ``partitionBy(pid)``, so every task sorts only its own range
    4. cross-partition offsets from the per-partition totals — a
       ``num_ranges``-row frame, cumsummed and broadcast-joined back

    No partitionless window ever sees more than (distinct values /
    num_ranges) rows, which holds even for continuous columns where the
    histogram is as large as the table — the shape the dashboard's
    Spearman needs at 100 TB.

    Bucket boundaries come from ``approxQuantile`` (not
    ``repartitionByRange``, whose sampled boundaries are not guaranteed
    identical across the two plan branches that reuse the histogram) —
    the bucket is then a pure deterministic expression of the value, so
    every copy of a value lands in exactly one bucket.

    Null rows are excluded up front (standard rank semantics: nulls are
    unranked); without the filter they'd land in the first bucket's
    cumsum and shift every offset while the null value itself dropped
    out of the join back.

    Three r16 pass-count cuts (guide §2.4 "remove shuffles outright" /
    §1.2 step 1 "don't compute things twice"), together taking the
    exact Spearman from six corpus passes to two:

    - The histogram is MATERIALIZED once: ``counts`` feeds two
      consumers — the local cumsum window and the per-partition totals
      — and without a materialization boundary Catalyst re-derives the
      whole scan → groupBy(col) → Exchange subtree for each (runtime
      exchange reuse does not fire across these separately-scheduled
      AQE jobs; profiled r16: four corpus aggregation stages per
      spearman call where two suffice). The checkpoint holds one
      (value, cnt) row per DISTINCT value — at most the bytes the
      histogram exchange already shuffles — and cuts a full corpus
      scan + corpus-wide shuffle per ranked column.
      ``materialize=False`` keeps the plan lazy end to end (plan-audit
      twin of the same knob on spearman_approx).
    - Bucket BOUNDS come from the materialized histogram, not from an
      approxQuantile pass over the corpus: the ordered windows below
      sort DISTINCT VALUES, so balancing them wants quantiles of the
      distinct-value set — which the histogram IS. One cheap action
      over checkpointed rows replaces a full corpus scan, and it
      balances better on skewed data (a hot value no longer drags
      row-weighted boundaries). avg_rank values are unchanged by ANY
      bucketing: offset + local_before + (cnt+1)/2 is exact integer
      arithmetic whose result is bucket-independent.
    - ``counts`` lets a caller hand in a precomputed (col, cnt)
      histogram so several rank tables can share one corpus pass
      (``spearman`` builds both of its histograms with one
      grouping-sets aggregation).

    Fault-tolerance trade (ADVICE r16): the histogram checkpoint is
    distinct-values-sized — ~corpus-sized for a continuous column —
    and ``localCheckpoint`` stores blocks on executor-local storage
    with NON-RECOMPUTABLE lineage, so on a real cluster an executor
    loss during the downstream jobs fails the query (rerun it). Pass
    ``materialize=False`` to keep the plan lazy end to end when that
    trade is wrong for the deployment (pays re-derivation per
    consumer — the pre-r16 shape).
    """
    if counts is None:
        df = df.where(F.col(col).isNotNull())
        counts = df.groupBy(col).agg(F.count("*").alias("cnt"))
        if materialize:
            counts = counts.localCheckpoint(eager=True)
    if bounds is None:
        probs = [i / num_ranges for i in range(1, num_ranges)]
        if materialize:
            # distinct-value quantiles off the checkpointed histogram
            bounds = counts.stat.approxQuantile(col, probs, 0.001)
        else:
            bounds = df.stat.approxQuantile(col, probs, 0.001)
    bounds = sorted(set(bounds))
    bucket = F.lit(0)
    for b in bounds:
        bucket = bucket + (F.col(col) > F.lit(b)).cast("int")
    counts = counts.withColumn("_pid", bucket)
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local_before = F.coalesce(F.sum("cnt").over(w_local), F.lit(0))
    # tiny frame: one row per range partition; its ordered window is
    # bounded by num_ranges rows regardless of data size
    totals = counts.groupBy("_pid").agg(F.sum("cnt").alias("_total"))
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_pid", F.coalesce(F.sum("_total").over(w_off), F.lit(0)).alias("_offset")
    )
    return (
        counts.withColumn("_local_before", local_before)
        .join(F.broadcast(offsets), "_pid")
        .select(
            col,
            (
                F.col("_offset") + F.col("_local_before") + (F.col("cnt") + 1) / 2.0
            ).alias(out),
        )
    )


def spearman(df: DataFrame, x: str, y: str, materialize: bool = True) -> DataFrame:
    """Spearman rank correlation: average-rank both columns, then Pearson.

    Matches the dashboard's pandas ``corr(method='spearman')``
    (reference: app_2 NEW with joined.py:450-462), average-rank tie
    convention. Ranks come from per-column distinct-value histograms
    (see ``avg_ranks``) joined back on the value — no full-table global
    sort anywhere in the plan.

    Corpus passes: TWO (r16; was six). Both columns' histograms come
    out of ONE grouping-sets aggregation — the Expand emits an
    (x,)-keyed and a (y,)-keyed tuple per row, partial aggregation
    collapses both map-side, and the single result frame checkpoints
    (distinct-values-sized) before splitting into the two rank tables
    — and the only other corpus touch is the final join-back. Bucket
    bounds derive from the checkpointed histograms (see avg_ranks), so
    no approxQuantile pass over the corpus remains.

    r17 BUILT and MEASURED the one-pass fusion the r16 VERDICT
    proposed (#5: aggregate the joint (x, y) pair histogram once;
    marginals and the rank join-back derive from it; weighted Pearson
    over centered ranks replaces the corpus join-back) and REJECTED
    it on the numbers: interleaved A/B at sf0.1, warm min 2.14 s
    (this two-pass shape) vs 3.14 s fused (3.41 s with lazy
    marginals). The fusion's premise — (x, y)-distinct pairs << corpus
    rows — fails for continuous columns (events.value x user_id is
    ~100% pair-distinct), so the "saved" corpus scan (a ~50 ms
    columnar re-read) was traded for a full-width extra shuffle, a
    pair-histogram checkpoint, and wider rank joins; the same premise
    governs at 100 TB, and a general-purpose operator cannot assume a
    compressing pair space. Numerical note from the build: the
    weighted corr over ranks centered at the exact mean rank (n+1)/2
    agreed with F.corr to ~1e-11 — the reformulation is sound; the
    data shape is what rejects it.

    Fault-tolerance knob (ADVICE r16): ``materialize=False`` keeps the
    plan lazy end to end — see avg_ranks' docstring for the
    executor-local localCheckpoint trade (non-recomputable lineage on
    a real cluster); the default materializes once, the right call
    wherever re-derivation costs a corpus pass.
    """
    # pairwise-complete semantics (what pandas corr(method='spearman')
    # computes): rank AFTER dropping rows where either side is null/NaN
    # — ranking each column over its own non-null rows and then inner-
    # joining would feed the correlation ranks computed on different
    # populations
    df = df.where(
        F.col(x).isNotNull()
        & F.col(y).isNotNull()
        & ~F.isnan(F.col(x).cast("double"))
        & ~F.isnan(F.col(y).cast("double"))
    )
    # one corpus pass for BOTH histograms; the pairwise-complete filter
    # above guarantees x/y carry no real NULLs, so a row of the joint
    # frame belongs to the (x) grouping set exactly when x is non-null
    joint = df.groupingSets([[x], [y]], x, y).agg(F.count("*").alias("cnt"))
    if materialize:
        joint = joint.localCheckpoint(eager=True)
    hx = joint.filter(F.col(x).isNotNull()).select(x, "cnt")
    hy = joint.filter(F.col(y).isNotNull()).select(y, "cnt")
    rx = avg_ranks(df, x, "rx", counts=hx, materialize=materialize)
    ry = avg_ranks(df, y, "ry", counts=hy, materialize=materialize)
    ranked = df.select(x, y).join(rx, x).join(ry, y)
    return ranked.agg(F.corr("rx", "ry").alias("spearman"))


def spearman_approx(
    df: DataFrame,
    x: str,
    y: str,
    num_bins: int = 256,
    rel_err: float = 1e-3,
    materialize: bool = True,
) -> DataFrame:
    """Approximate Spearman — the 100 TB fallback SURVEY §7 (risk 4)
    names: bin both columns on ``percentile_approx`` quantile
    boundaries (a mergeable sketch pass), treat every value inside a
    bin as one tie group at the bin's average rank, and compute the
    weighted Pearson over the ``num_bins x num_bins`` contingency
    table.

    Error is the within-bin rank distortion, O(1/num_bins) on a
    continuous column; when a column has FEWER distinct values than
    bins, each value gets its own bin and the binned tie-rank IS the
    exact average rank, so the estimate degrades only where binning
    actually coarsens. |approx - exact| is pinned in
    tests/test_functions.py on both regimes.

    Scale shape vs the exact ``spearman``: no per-distinct-value
    histogram is ever built and nothing joins back to full rows — the
    full-width data path is ONE narrow projection to (bin_x, bin_y)
    and ONE count aggregation; every ordered window downstream runs on
    <= num_bins-row marginal frames (same bounded-frame pattern as
    ``avg_ranks``' offsets). No Sort node ever touches the raw
    columns, which the plan audit asserts."""
    # same pairwise-complete population as the exact spearman
    df = df.where(
        F.col(x).isNotNull()
        & F.col(y).isNotNull()
        & ~F.isnan(F.col(x).cast("double"))
        & ~F.isnan(F.col(y).cast("double"))
    )
    probs = [i / num_bins for i in range(1, num_bins)]
    bx_bounds, by_bounds = df.stat.approxQuantile([x, y], probs, rel_err)

    def bucket(col: str, bounds: list[float]):
        # vectorized binary search per Arrow batch: np.searchsorted
        # side='left' counts bounds strictly below the value — exactly
        # the bin id. The builtin alternatives both lose: a 255-term
        # chained `+` blows up codegen depth (measured 4x slower), and
        # an F.aggregate HOF loop over a boundary array evaluates
        # INTERPRETED at 255 iterations per row (it was ~80% of this
        # function's runtime). Same justified-pandas_udf discipline as
        # the IVF centroid matmul.
        from pyspark.sql.functions import pandas_udf

        b = np.asarray(sorted(set(bounds)), dtype=np.float64)

        @pandas_udf("int")
        def _bin(s: pd.Series) -> pd.Series:
            return pd.Series(
                np.searchsorted(
                    b, s.to_numpy(dtype=np.float64), side="left"
                ).astype(np.int32)
            )

        return _bin(F.col(col).cast("double"))

    d = df.select(
        bucket(x, bx_bounds).alias("_bx"), bucket(y, by_bounds).alias("_by")
    )
    # The contingency table is consumed by three branches (two marginal
    # rank tables + the weighted join); it is at most num_bins^2 tiny
    # rows, so materialize it once — the corpus-wide binning pass runs
    # exactly once, and no downstream plan transform can push the
    # higher-order bucket lambdas past the aggregation boundary.
    # ``materialize=False`` keeps the plan lazy end-to-end so the
    # no-raw-column-Sort property can actually be audited (a checkpoint
    # truncates the explained plan at Scan ExistingRDD, which would
    # make any plan assertion vacuous).
    cells = d.groupBy("_bx", "_by").agg(F.count("*").alias("_w"))
    if materialize:
        cells = cells.localCheckpoint(eager=True)

    def rank_table(key: str) -> DataFrame:
        m = cells.groupBy(key).agg(F.sum("_w").alias("_cnt"))
        w = Window.orderBy(key).rowsBetween(Window.unboundedPreceding, -1)
        return m.select(
            key,
            (
                F.coalesce(F.sum("_cnt").over(w), F.lit(0))
                + (F.col("_cnt") + 1) / 2.0
            ).alias(f"_r{key}"),
        )

    j = (
        cells.join(F.broadcast(rank_table("_bx")), "_bx")
        .join(F.broadcast(rank_table("_by")), "_by")
        .select(
            F.col("_w").cast("double").alias("w"),
            F.col("_r_bx").alias("rx"),
            F.col("_r_by").alias("ry"),
        )
    )
    agg = j.agg(
        F.sum("w").alias("n"),
        F.sum(F.col("w") * F.col("rx")).alias("sx"),
        F.sum(F.col("w") * F.col("ry")).alias("sy"),
        F.sum(F.col("w") * F.col("rx") * F.col("rx")).alias("sxx"),
        F.sum(F.col("w") * F.col("ry") * F.col("ry")).alias("syy"),
        F.sum(F.col("w") * F.col("rx") * F.col("ry")).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return agg.select((num / den).alias("spearman"))


def rmse(df: DataFrame, pred: str = "prediction", label: str = "label") -> DataFrame:
    """sqrt(mean((pred-label)^2)) (reference: app_2 NEW with joined.py:233-236)."""
    return df.agg(
        F.sqrt(F.avg(F.pow(F.col(pred) - F.col(label), F.lit(2)))).alias("rmse")
    )
