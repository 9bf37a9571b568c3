"""Statistical aggregates (SURVEY.md §2.4 A4, A7, A8, A12).

All single-pass DataFrame aggregations — no collect() loops. Spearman is
rank-window + Pearson (exact at test scale; at 100 TB swap the global
rank for an ``approxQuantile``-bucketed rank, same API).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def null_count_vector(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """One row: null/NaN count per column, single pass
    (replaces the reference's per-column loop — stream_and_historical_model.py:316-319)."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        is_null = F.col(c).isNull()
        if dict(df.dtypes)[c] in ("double", "float"):
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


def avg_ranks(df: DataFrame, col: str, out: str = "avg_rank") -> DataFrame:
    """Average (tie-adjusted) rank per distinct value of ``col``.

    avg_rank(v) = #{x < v} + (count(v)+1)/2 — exactly the mean of the
    row_numbers inside v's tie group, but computed from the distinct-value
    histogram (groupBy + windowed cumsum), so the only ordered window runs
    over distinct values, not the full table. That replaces the
    partitionless full-table ``Window.orderBy`` (one task holding every
    row) with a hash-shuffle histogram: the 100 TB-safe shape.
    """
    counts = df.groupBy(col).agg(F.count("*").alias("cnt"))
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
    cum_before = F.coalesce(F.sum("cnt").over(w), F.lit(0))
    return counts.select(col, (cum_before + (F.col("cnt") + 1) / 2.0).alias(out))


def spearman(df: DataFrame, x: str, y: str) -> DataFrame:
    """Spearman rank correlation: average-rank both columns, then Pearson.

    Matches the dashboard's pandas ``corr(method='spearman')``
    (reference: app_2 NEW with joined.py:450-462), average-rank tie
    convention. Ranks come from per-column distinct-value histograms
    (see ``avg_ranks``) joined back on the value — no full-table global
    sort anywhere in the plan.
    """
    rx = avg_ranks(df, x, "rx")
    ry = avg_ranks(df, y, "ry")
    ranked = df.select(x, y).join(rx, x).join(ry, y)
    return ranked.agg(F.corr("rx", "ry").alias("spearman"))


def rmse(df: DataFrame, pred: str = "prediction", label: str = "label") -> DataFrame:
    """sqrt(mean((pred-label)^2)) (reference: app_2 NEW with joined.py:233-236)."""
    return df.agg(
        F.sqrt(F.avg(F.pow(F.col(pred) - F.col(label), F.lit(2)))).alias("rmse")
    )
