"""OLAP extensions: the aggregation/window shapes SURVEY.md §2.4/§2.5
lists as *absent* in the reference ("no grouping sets / cube / rollup /
percentiles", "no rank/dense_rank/row_number") but built-in to Spark —
closing them as first-class, oracle-backed queries.

All three are single-shuffle shapes that scale: rollup adds the
super-aggregate rows inside the same hash-aggregate (one Expand + one
Exchange, partial aggregation map-side); exact percentiles group-shuffle
once and sort only within each (small) group; ranked top-k partitions by
the group key so each window sorts locally, never globally.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query, r6, t


@query(
    "orders_rollup_totals",
    """
    SELECT grouping_id(o_orderstatus, o_orderpriority)   AS gid,
           coalesce(o_orderstatus, 'ALL')                AS status,
           coalesce(o_orderpriority, 'ALL')              AS priority,
           count(*)                                      AS n_orders,
           round(sum(o_totalprice), 6)                   AS total_price
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def orders_rollup_totals(spark, sf_dir):
    """ROLLUP over (status, priority): per-cell, per-status, and grand
    totals in ONE aggregate (SURVEY §2.4 'absent: grouping sets/rollup').
    grouping_id disambiguates a real NULL key from a super-aggregate row;
    the coalesce'd labels make the result portable SQL. The plan is a
    single Expand + hash-aggregate — no extra shuffle per grouping set."""
    o = t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            r6(F.sum("o_totalprice")).alias("total_price"),
        )
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_price",
        )
    )


@query(
    "lineitem_quantity_quantiles",
    """
    SELECT l_linestatus,
           round(quantile_cont(l_quantity, 0.25), 6) AS q25,
           round(quantile_cont(l_quantity, 0.50), 6) AS q50,
           round(quantile_cont(l_quantity, 0.75), 6) AS q75,
           round(avg(l_quantity), 6)                 AS mean_qty
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def lineitem_quantity_quantiles(spark, sf_dir):
    """Exact grouped percentiles (SURVEY §2.4 'absent: percentiles').
    Spark's exact ``percentile`` and DuckDB's ``quantile_cont`` share the
    linear-interpolation definition, so values hash-match under the r6
    policy. Exact is the oracle-able baseline; at 100 TB the same query
    swaps in ``percentile_approx`` (single-pass sketch, no per-group
    sort) — the approximate twin is benched, not oracled."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        r6(F.percentile("l_quantity", F.lit(0.25))).alias("q25"),
        r6(F.percentile("l_quantity", F.lit(0.50))).alias("q50"),
        r6(F.percentile("l_quantity", F.lit(0.75))).alias("q75"),
        r6(F.avg("l_quantity")).alias("mean_qty"),
    )


@query(
    "orders_rank_topk",
    """
    SELECT priority, o_orderkey, o_totalprice, rn, drk
    FROM (
        SELECT o_orderpriority AS priority, o_orderkey,
               round(o_totalprice, 6) AS o_totalprice,
               row_number() OVER w AS rn,
               dense_rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC) AS drk
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice DESC, o_orderkey)
    )
    WHERE rn <= 3
    """,
)
def orders_rank_topk(spark, sf_dir):
    """Top-3 orders by price per priority via row_number + dense_rank
    (SURVEY §2.5 'absent: rank/row_number/ntile'). o_orderkey tiebreak
    makes row_number deterministic. Partitioned window = per-group local
    sort after one hash partition; the rn<=3 filter collapses to a
    per-partition top-k under AQE — no global sort anywhere."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    wd = Window.partitionBy("o_orderpriority").orderBy(F.col("o_totalprice").desc())
    return (
        o.select(
            F.col("o_orderpriority").alias("priority"),
            "o_orderkey",
            r6(F.col("o_totalprice")).alias("o_totalprice"),
            F.row_number().over(w).alias("rn"),
            F.dense_rank().over(wd).alias("drk"),
        )
        .filter(F.col("rn") <= 3)
    )
