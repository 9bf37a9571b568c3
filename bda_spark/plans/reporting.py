"""Phase 5 — the reporting layer: dashboard queries as Spark SQL views
(SURVEY.md §7 Phase 5, §2.4 A12).

The reference answers its dashboard's questions by pulling Cassandra
tables into pandas and aggregating driver-side (reference:
`Deliverable_4/app_2 NEW with joined.py:148-462` — KPI counters, RMSE
per model, Spearman/Pearson matrices, top-k tables, date-range
filters). Here the ENGINE answers them: each panel is a temp view /
``spark.sql`` query, so the aggregation runs distributed and the
dashboard process only renders.

``register_reporting_views`` is idempotent (CREATE OR REPLACE); views
are lazy, so registering costs nothing until a panel query runs.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .registry import query, r6, t


def register_reporting_views(spark: SparkSession, sf_dir: str) -> None:
    """Base + derived views the dashboard panels select from.

    v_events/v_documents are the raw tables; v_daily_events is the
    gold-layer daily rollup the weekly panel aggregates FROM (view over
    view, like the reference's gold tables feeding dashboard pulls)."""
    t(spark, sf_dir, "events").createOrReplaceTempView("v_events")
    t(spark, sf_dir, "documents").createOrReplaceTempView("v_documents")
    # total_micro: each EVENT's value quantized to integer micro-units
    # BEFORE any summation, so the daily and weekly grains are exact
    # bigint arithmetic all the way up. Quantizing after a double sum
    # (the r2/r3 versions) still sat on a summation-order boundary —
    # Spark and DuckDB could land on adjacent micro-units; per-row
    # floor(value*1e6+0.5) is a deterministic scalar both engines
    # compute identically, and bigint addition is order-free.
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY VIEW v_daily_events AS
        SELECT to_date(ts) AS day, event_type,
               count(*) AS n_events, sum(value) AS total_value,
               sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS total_micro
        FROM v_events GROUP BY to_date(ts), event_type
        """
    )


@query(
    "report_weekly_rollup",
    """
    SELECT CAST(date_trunc('week', day) AS DATE) AS week, event_type,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           CAST(sum(total_micro) AS BIGINT) AS total_value_micro
    FROM (
      SELECT CAST(ts AS DATE) AS day, event_type,
             count(*) AS n_events,
             sum(CAST(floor(value * 1000000 + 0.5) AS BIGINT)) AS total_micro
      FROM events GROUP BY 1, 2
    ) GROUP BY 1, 2
    """,
)
def report_weekly_rollup(spark, sf_dir):
    """Weekly KPI panel aggregating FROM the daily gold view — the
    view-over-view layering of the reference's gold tables feeding
    dashboard pulls (ref app_2 NEW with joined.py:148-158).

    The rollup is exact integer arithmetic from the ROW up: each
    event's value is quantized to bigint micro-units per row, then
    summed through the daily and weekly grains. The r2/r3 hash flakes
    were both quantize-AFTER-double-sum boundaries in exactly this
    rollup — any double summation before the floor() leaves the result
    summation-order-dependent; per-row quantization removes the double
    sum entirely."""
    register_reporting_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT CAST(date_trunc('week', day) AS DATE) AS week, event_type,
               sum(n_events) AS n_events,
               sum(total_micro) AS total_value_micro
        FROM v_daily_events GROUP BY 1, 2
        """
    )


@query(
    "report_rmse_naive",
    """
    SELECT event_type,
           round(sqrt(avg(pow(prediction - value, 2))), 6) AS rmse,
           count(*) AS n
    FROM (
      SELECT event_type, value,
             lag(value) OVER (PARTITION BY event_type, user_id
                              ORDER BY ts, event_id) AS prediction
      FROM events
    ) WHERE prediction IS NOT NULL
    GROUP BY event_type
    """,
)
def report_rmse_naive(spark, sf_dir):
    """Model-quality panel: RMSE of the naive last-value predictor per
    stream (ref app_2 NEW with joined.py:233-236 — prediction-vs-actual
    RMSE; the per-group form of functions.stats.rmse, whose global form
    is exercised in tests)."""
    register_reporting_views(spark, sf_dir)
    lagged = spark.sql(
        """
        SELECT event_type, value,
               lag(value) OVER (PARTITION BY event_type, user_id
                                ORDER BY ts, event_id) AS prediction
        FROM v_events
        """
    ).filter(F.col("prediction").isNotNull())
    return lagged.groupBy("event_type").agg(
        r6(F.sqrt(F.avg(F.pow(F.col("prediction") - F.col("value"), 2)))).alias(
            "rmse"
        ),
        F.count("*").alias("n"),
    )


@query(
    "report_corr_matrix",
    """
    WITH b AS (
      SELECT time_bucket(INTERVAL '1 hour', ts) AS bucket, event_type,
             round(avg(value), 6) AS v
      FROM events GROUP BY 1, 2
    )
    SELECT a.event_type AS type_a, c.event_type AS type_b,
           round(corr(a.v, c.v), 6) AS correlation, count(*) AS n_buckets
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.event_type < c.event_type
    GROUP BY 1, 2
    HAVING count(*) >= 10 AND corr(a.v, c.v) IS NOT NULL
           AND NOT isnan(corr(a.v, c.v))
    """,
)
def report_corr_matrix(spark, sf_dir):
    """Correlation-matrix panel in long form: every stream pair's
    Pearson corr over co-occurring 1-hour buckets (ref app_2 NEW with
    joined.py:450-462 corr matrices; the grouped-Pearson expression of
    functions.stats.pearson fused with the bucket count into ONE
    aggregation pass — two passes would scan events twice more for no
    reason). Pairs with <10 common buckets or undefined corr are
    dropped on BOTH engines (Spark yields NaN, DuckDB NULL — filtered
    alike)."""
    register_reporting_views(spark, sf_dir)
    b = spark.sql(
        """
        SELECT window.start AS bucket, event_type, round(avg(value), 6) AS v
        FROM v_events GROUP BY window(ts, '1 hour'), event_type
        """
    )
    pairs = (
        b.alias("a")
        .join(
            b.alias("c"),
            (F.col("a.bucket") == F.col("c.bucket"))
            & (F.col("a.event_type") < F.col("c.event_type")),
        )
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("c.event_type").alias("type_b"),
            F.col("a.v").alias("va"),
            F.col("c.v").alias("vb"),
        )
    )
    return (
        pairs.groupBy("type_a", "type_b")
        .agg(
            F.corr("va", "vb").alias("correlation"),
            F.count("*").alias("n_buckets"),
        )
        .filter(
            (F.col("n_buckets") >= 10)
            & F.col("correlation").isNotNull()
            & ~F.isnan("correlation")
        )
        .select("type_a", "type_b", r6(F.col("correlation")).alias("correlation"), "n_buckets")
    )


@query(
    "report_top_sources",
    """
    SELECT source, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
    FROM documents GROUP BY source
    ORDER BY n_docs DESC, source
    LIMIT 10
    """,
)
def report_top_sources(spark, sf_dir):
    """Top-k table panel over the documents view (ref app_2 NEW with
    joined.py:329-344 top-k keyword/source tables)."""
    register_reporting_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT source, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
        FROM v_documents GROUP BY source
        ORDER BY n_docs DESC, source
        LIMIT 10
        """
    )
