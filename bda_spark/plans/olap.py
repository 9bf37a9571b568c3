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

from .registry import query, r6, t, xsum


@query(
    "orders_rollup_totals",
    """
    SELECT grouping_id(o_orderstatus, o_orderpriority)   AS gid,
           coalesce(o_orderstatus, 'ALL')                AS status,
           coalesce(o_orderpriority, 'ALL')              AS priority,
           count(*)                                      AS n_orders,
           round(sum(CAST(round((o_totalprice) * 1000000) AS BIGINT)) / 1000000.0, 6) AS total_price
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
            xsum(F.col("o_totalprice")).alias("total_price"),
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
    "orders_cube_customers",
    """
    SELECT grouping_id(o_orderstatus, o_orderpriority)   AS gid,
           coalesce(o_orderstatus, 'ALL')                AS status,
           coalesce(o_orderpriority, 'ALL')              AS priority,
           count(*)                                      AS n_orders,
           count(DISTINCT o_custkey)                     AS n_customers
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def orders_cube_customers(spark, sf_dir):
    """CUBE over (status, priority) with a count-DISTINCT measure: all
    four grouping sets — per-cell, per-status, per-priority, grand —
    in one aggregate (SURVEY §2.4 'absent: grouping sets/cube'). CUBE
    produces the per-priority marginals ROLLUP cannot. The distinct
    measure makes the plan the two-level Expand + partial-agg shape:
    custkeys dedup map-side within (gid, keys, custkey) before the
    final count, so the shuffle carries distinct keys, not rows —
    the count-distinct-under-grouping-sets shape a 100 TB cube needs.
    This row also carries the registry's count(DISTINCT) coverage
    (count_distinct_custkeys is its ungrouped special case)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "n_customers",
        )
    )


# Pivot values are DECLARED, not discovered: a values-less pivot() runs
# an eager distinct scan just to learn the column list — at 100 TB
# that is a full extra pass, and an unbounded type domain would explode
# the schema. The five event types are the producer contract
# (schemas.py), so the pivot compiles straight into one conditional
# aggregate, one shuffle, no discovery job.
EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "orders_grouping_sets_margins",
    """
    SELECT grouping_id(o_orderstatus, o_orderpriority)   AS gid,
           coalesce(o_orderstatus, 'ALL')                AS status,
           coalesce(o_orderpriority, 'ALL')              AS priority,
           count(*)                                      AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT)                               AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
    """,
)
def orders_grouping_sets_margins(spark, sf_dir):
    """Explicit GROUPING SETS — the per-status and per-priority
    MARGINALS only, a set combination neither ROLLUP nor CUBE
    expresses (rollup adds the cells, cube adds cells + grand total).
    Same single Expand + hash-aggregate plan as its rollup/cube
    siblings: Expand emits one replica per grouping set, partial
    aggregation combines map-side, one shuffle total.

    The price measure is summed in exact integer cents (per-row
    quantization BEFORE the sum, the report_weekly_rollup discipline)
    so no double-summation order can differ between engines.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    o = t(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("bigint")
    return (
        o.withColumn("_cents", cents)
        .groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n_orders"),
            F.sum("_cents").alias("total_cents"),
        )
        .select(
            "gid",
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            "n_orders",
            "total_cents",
        )
    )


@query(
    "events_mode_daily",
    """
    WITH d AS (
      SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), r AS (
      SELECT day, event_type, n,
             row_number() OVER (PARTITION BY day
                                ORDER BY n DESC, event_type) AS rn
      FROM d
    )
    SELECT day, event_type AS mode_event_type, n AS n_occurrences
    FROM r WHERE rn = 1
    """,
)
def events_mode_daily(spark, sf_dir):
    """Deterministic mode(): the most frequent event_type per day,
    ties broken by lexicographically smallest type. Spark 3.4's builtin
    ``mode()`` aggregate is tie-NONdeterministic (hash-map iteration
    order), which makes it untestable and irreproducible — this is the
    two-level shape that fixes that: count per (day, type) — map-side
    combined — then a row_number window over the COLLAPSED (day, type)
    grid (|days|x|types| rows, not events) with a total order.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    ev = t(spark, sf_dir, "events")
    d = ev.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("day").orderBy(F.desc("n"), "event_type")
    return (
        d.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "day",
            F.col("event_type").alias("mode_event_type"),
            F.col("n").alias("n_occurrences"),
        )
    )


@query(
    "events_pivot_daily",
    """
    SELECT CAST(ts AS DATE) AS day,
           round(avg(CASE WHEN event_type = 'click'    THEN value END), 6) AS avg_click,
           round(avg(CASE WHEN event_type = 'error'    THEN value END), 6) AS avg_error,
           round(avg(CASE WHEN event_type = 'purchase' THEN value END), 6) AS avg_purchase,
           round(avg(CASE WHEN event_type = 'signup'   THEN value END), 6) AS avg_signup,
           round(avg(CASE WHEN event_type = 'view'     THEN value END), 6) AS avg_view
    FROM events
    GROUP BY 1
    """,
)
def events_pivot_daily(spark, sf_dir):
    """Long-to-wide pivot: one row per day, one avg-value column per
    event type (SURVEY §2.4 — the reference reshapes long→wide in
    pandas driver-side, app_2 NEW with joined.py pivot_table; here the
    ENGINE pivots). Spark compiles declared-values pivot into two
    aggregates: partial avg by (day, type) — map-side combine collapses
    the table to |days×types| rows before anything shuffles — then a
    PivotFirst by day. Both shuffles carry only the collapsed grid
    (~150 rows/partition here), never events; the finer first key also
    spreads a hot day across reducers, which the oracle's single
    conditional-aggregate shape cannot."""
    ev = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    wide = (
        ev.groupBy("day")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.round(F.avg("value"), 6))
    )
    return wide.select(
        "day", *[F.col(c).alias(f"avg_{c}") for c in EVENT_TYPES]
    )


@query(
    "docs_unpivot_stats",
    """
    WITH wide AS (
      SELECT source, count(*) AS n_docs,
             round(avg(n_chars), 6) AS avg_chars,
             CAST(max(n_chars) AS DOUBLE) AS max_chars
      FROM documents GROUP BY source
    )
    SELECT source, 'n_docs' AS metric, CAST(n_docs AS DOUBLE) AS value FROM wide
    UNION ALL
    SELECT source, 'avg_chars' AS metric, avg_chars AS value FROM wide
    UNION ALL
    SELECT source, 'max_chars' AS metric, max_chars AS value FROM wide
    """,
)
def docs_unpivot_stats(spark, sf_dir):
    """Wide-to-long unpivot (melt) of a per-source stats panel via
    Spark's native ``unpivot`` — the inverse reshape of
    events_pivot_daily, closing both directions engine-side. unpivot is
    a narrow Expand (3 output rows per input row, no shuffle, no UNION
    re-scan): the aggregate runs ONCE and the reshape is free, vs the
    oracle's 3-way UNION which DuckDB can afford only because the CTE
    is materialized. Values are cast to one type (double) — unpivot's
    single-value-column contract."""
    d = t(spark, sf_dir, "documents")
    wide = d.groupBy("source").agg(
        F.count("*").cast("double").alias("n_docs"),
        r6(F.avg("n_chars")).alias("avg_chars"),
        F.max("n_chars").cast("double").alias("max_chars"),
    )
    return wide.unpivot(
        ["source"], ["n_docs", "avg_chars", "max_chars"], "metric", "value"
    )


@query(
    "events_argmax_daily",
    """
    SELECT event_type, event_id AS max_event_id, user_id AS max_user_id,
           round(value, 6) AS max_value
    FROM (
      SELECT event_type, event_id, user_id, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def events_argmax_daily(spark, sf_dir):
    """Argmax aggregate: WHICH event (id, user) carried each stream's
    maximum value, via ``max_by`` over a (value, event_id) struct —
    the composite makes the winner deterministic under value ties
    (max event_id wins, mirroring the oracle's two-key DESC sort).
    max_by aggregates partially BEFORE the shuffle — the exchange
    carries one row per (input-partition, type), never events. The
    struct ordering has no fixed-width hash buffer, so Spark plans a
    per-partition SortAggregate (local sort by the 5-value group key,
    no data movement); the windowed formulation the oracle uses (and
    the reference's pandas idxmax, app_2 NEW with joined.py) would
    instead hash-partition EVERY row into 5 reducers and sort there —
    at 100 TB that is a full-table shuffle onto 5 machines vs a
    32-row exchange."""
    ev = t(spark, sf_dir, "events")
    tie = F.struct(F.col("value"), F.col("event_id"))
    return ev.groupBy("event_type").agg(
        F.max_by("event_id", tie).alias("max_event_id"),
        F.max_by("user_id", tie).alias("max_user_id"),
        r6(F.max("value")).alias("max_value"),
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


@query(
    "customer_balance_ntiles",
    """
    SELECT c_mktsegment, quartile, count(*) AS n,
           round(min(c_acctbal), 6) AS lo, round(max(c_acctbal), 6) AS hi
    FROM (
      SELECT c_mktsegment, c_acctbal,
             ntile(4) OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal, c_custkey) AS quartile
      FROM customer
    ) GROUP BY 1, 2
    """,
)
def customer_balance_ntiles(spark, sf_dir):
    """ntile(4) balance quartiles per market segment (SURVEY §2.5
    'absent: …/ntile' — the last window function of that list without
    a row). c_custkey tiebreak pins tile boundaries when balances tie,
    so both engines assign identical tiles. Same scale shape as
    orders_rank_topk: hash partition by segment, per-partition local
    sort, no global sort; the quartile summary (counts + bounds) keeps
    the row per (segment, tile) — 20 rows out."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return (
        c.select(
            "c_mktsegment",
            "c_acctbal",
            F.ntile(4).over(w).alias("quartile"),
        )
        .groupBy("c_mktsegment", "quartile")
        .agg(
            F.count("*").alias("n"),
            r6(F.min("c_acctbal")).alias("lo"),
            r6(F.max("c_acctbal")).alias("hi"),
        )
    )
