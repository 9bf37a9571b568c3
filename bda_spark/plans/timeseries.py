"""Time-series / streaming-analog queries (SURVEY.md §2.3 J1, §2.4 A1-A2,
§2.5 W1, §2.8 F3-F9) over the ``events`` table.

``events(event_id, ts, user_id, event_type, value, props)`` plays the
role of the reference's Kafka tick stream (FIXTURES.md §1 maps ticks
onto it): event_type ~ symbol, value ~ price, props ~ JSON payload.
Each batch query here has the same plan shape as its streaming
counterpart in bda_spark.streaming (windows are windows either way).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .registry import query, r6, t, xsum


@query(
    "events_windowed_10min",
    """
    SELECT time_bucket(INTERVAL '10 minutes', ts) AS window_start,
           event_type,
           round(avg(value), 6) AS avg_value,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
)
def events_windowed_10min(spark, sf_dir):
    """10-min tumbling window x key aggregate — the trainer's feature
    window (ref NEW_train_offset_3_10min.py:124-136) in batch form."""
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(r6(F.avg("value")).alias("avg_value"), F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "avg_value",
            "n_events",
        )
    )


@query(
    "events_bucket_join_corr",
    """
    WITH a AS (
      SELECT time_bucket(INTERVAL '1 minute', ts) AS bucket, round(avg(value), 6) AS a_value
      FROM events WHERE event_type = 'click' GROUP BY 1
    ), b AS (
      SELECT time_bucket(INTERVAL '1 minute', ts) AS bucket, round(avg(value), 6) AS b_value
      FROM events WHERE event_type = 'view' GROUP BY 1
    )
    SELECT round(corr(a_value, b_value), 6) AS correlation,
           count(*) AS n_buckets,
           round(avg(a_value), 6) AS avg_click,
           round(avg(b_value), 6) AS avg_view
    FROM a JOIN b USING (bucket)
    """,
)
def events_bucket_join_corr(spark, sf_dir):
    """The stream-stream correlation join in batch form: two feeds
    bucketed to 1-min, equi-joined on bucket, Pearson corr over buckets
    (ref joined_streams.py:60-110). Same plan shape as the streaming
    version in bda_spark.streaming.correlation."""
    e = t(spark, sf_dir, "events")
    a = (
        e.filter(F.col("event_type") == "click")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(r6(F.avg("value")).alias("a_value"))
    )
    b = (
        e.filter(F.col("event_type") == "view")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(r6(F.avg("value")).alias("b_value"))
    )
    joined = a.join(b, "w")
    return joined.agg(
        r6(F.corr("a_value", "b_value")).alias("correlation"),
        F.count("*").alias("n_buckets"),
        r6(F.avg("a_value")).alias("avg_click"),
        r6(F.avg("b_value")).alias("avg_view"),
    )


@query(
    "events_lead_label",
    """
    SELECT event_id, user_id, value,
           lead(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS label
    FROM events
    WHERE user_id <= 10
    """,
)
def events_lead_label(spark, sf_dir):
    """Lead/shift label generation (ref W1: stream_eda.ipynb cell 33
    price_1min_ahead = shift(-12) per symbol) as F.lead over a window."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", "value", F.lead("value", 3).over(w).alias("label")
    )


@query(
    "events_dropna_labels",
    """
    SELECT user_id, count(*) AS n_labeled, round(avg(label), 6) AS avg_label
    FROM (
      SELECT user_id,
             lead(value, 3) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS label
      FROM events WHERE user_id <= 10
    ) WHERE label IS NOT NULL
    GROUP BY user_id
    """,
)
def events_dropna_labels(spark, sf_dir):
    """P10: na.drop after lead-label generation — the 'drop unlabeled
    tail rows before training' step (ref silver_layer.ipynb cell 8
    dropna; NEW_train_offset_3_10min.py label prep). The last 3 rows of
    every user have no lead(3) label and must vanish."""
    e = t(spark, sf_dir, "events").filter(F.col("user_id") <= 10)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select("user_id", F.lead("value", 3).over(w).alias("label"))
        .na.drop(subset=["label"])
        .groupBy("user_id")
        .agg(F.count("*").alias("n_labeled"), r6(F.avg("label")).alias("avg_label"))
    )


@query(
    "features_json_roundtrip",
    """
    SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value,
           count(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
)
def features_json_roundtrip(spark, sf_dir):
    """D1+F2: feature vector -> to_json(struct()) -> from_json round
    trip, then aggregate the PARSED columns. The oracle aggregates the
    raw columns directly, so a hash match proves the JVM-side
    serialize/parse pair is lossless — the UDF-free replacement for the
    reference's row-at-a-time json.dumps UDF
    (ref NEW_train_offset_3_10min.py:244-248)."""
    e = t(spark, sf_dir, "events")
    ser = e.select(
        F.to_json(F.struct("event_type", "user_id", "value")).alias("input_data")
    )
    parsed = ser.select(
        F.from_json(
            "input_data", "event_type string, user_id bigint, value double"
        ).alias("d")
    ).select("d.*")
    return parsed.groupBy("event_type").agg(
        F.count("*").alias("n"),
        r6(F.avg("value")).alias("avg_value"),
        F.countDistinct("user_id").alias("n_users"),
    )


@query(
    "events_json_extract",
    """
    SELECT event_type,
           round(avg(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def events_json_extract(spark, sf_dir):
    """JSON-string column extraction (ref F3 get_json_object
    stream_and_historical_model.py:277-280)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        r6(F.avg(F.get_json_object("props", "$.k").cast("double"))).alias("avg_k"),
        F.count("*").alias("n"),
    )


@query(
    "events_daily_kpis",
    """
    SELECT CAST(ts AS DATE) AS day, event_type,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           round(sum(CAST(round((value) * 1000000) AS BIGINT)) / 1000000.0, 6) AS total_value,
           round(min(value), 6) AS min_value,
           round(max(value), 6) AS max_value
    FROM events GROUP BY 1, 2
    """,
)
def events_daily_kpis(spark, sf_dir):
    """Daily gold KPIs per event type (ref load_to_gold_layer.py:40-64 +
    dashboard KPI aggregates app_2 NEW with joined.py:148-158)."""
    e = t(spark, sf_dir, "events")
    return e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        xsum(F.col("value")).alias("total_value"),
        r6(F.min("value")).alias("min_value"),
        r6(F.max("value")).alias("max_value"),
    )


@query(
    "events_recent_range",
    """
    SELECT event_type, count(*) AS n, round(avg(value), 6) AS avg_value
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-25 00:00:00' AND ts < TIMESTAMP '2024-01-28 00:00:00'
      AND value > 5.0
    GROUP BY event_type
    """,
)
def events_recent_range(spark, sf_dir):
    """Timestamp-range + value predicate filters pushed to the scan
    (ref P5/P6: NEW_train_offset_3_10min.py:311-315, EDA_silver cell 11)."""
    e = t(spark, sf_dir, "events")
    return (
        e.filter(
            (F.col("ts") >= F.lit("2024-01-25 00:00:00").cast("timestamp"))
            & (F.col("ts") < F.lit("2024-01-28 00:00:00").cast("timestamp"))
            & (F.col("value") > 5.0)
        )
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), r6(F.avg("value")).alias("avg_value"))
    )


@query(
    "events_5s_resample",
    """
    SELECT user_id,
           time_bucket(INTERVAL '5 seconds', ts) AS interval_start,
           round(avg(value), 6) AS avg_value
    FROM events WHERE user_id <= 5
    GROUP BY 1, 2
    """,
)
def events_5s_resample(spark, sf_dir):
    """5-second grid resample (ref A10: pandas dt.floor('5s') groupby
    mean, stream_eda.ipynb cells 14,17). Uses functions.timeutils.floor_to
    — the grid column IS the group key, no window struct needed."""
    from ..functions.timeutils import floor_to

    e = t(spark, sf_dir, "events").filter(F.col("user_id") <= 5)
    return (
        e.groupBy("user_id", floor_to("ts", 5).alias("interval_start"))
        .agg(r6(F.avg("value")).alias("avg_value"))
    )


@query(
    "events_spearman",
    """
    WITH ranked AS (
      SELECT avg(rn_x) OVER (PARTITION BY value)   AS rx,
             avg(rn_y) OVER (PARTITION BY user_id) AS ry
      FROM (
        SELECT value, user_id,
               row_number() OVER (ORDER BY value, user_id)  AS rn_x,
               row_number() OVER (ORDER BY user_id, value)  AS rn_y
        FROM events
      )
    )
    SELECT round(corr(rx, ry), 6) AS spearman FROM ranked
    """,
)
def events_spearman(spark, sf_dir):
    """Spearman = Pearson over average ranks (ref A12 dashboard corr
    matrices, app_2 NEW with joined.py:450-462). Tie-handling matches
    scipy's average-rank convention. Ranks are assigned from
    distinct-value histograms (functions.stats.avg_ranks) so the plan
    has no full-table partitionless window."""
    from ..functions.stats import spearman

    e = t(spark, sf_dir, "events")
    return spearman(e, "value", "user_id").select(
        r6(F.col("spearman")).alias("spearman")
    )


@query("events_spearman_approx", None)
def events_spearman_approx(spark, sf_dir):
    """Approximate Spearman via percentile_approx binning
    (functions.stats.spearman_approx) — the 100 TB fallback SURVEY §7
    risk 4 reserves: no per-distinct-value histogram, no join back to
    full rows; the full-width path is one narrow (bin, bin) projection
    plus one count aggregation.

    Deliberately NO SQL oracle: the bin boundaries come from Spark's
    Greenwald-Khanna approxQuantile sketch, which another engine
    cannot reproduce bit-for-bit (same class of check as the HLL
    sketch rollup). The contract — |approx - exact| <= tolerance on
    continuous data and EXACT equality when distinct values fit the
    bins — is pinned in tests/test_functions.py, and the exact
    ``events_spearman`` carries the in-window DuckDB oracle.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows)."""
    from ..functions.stats import spearman_approx

    e = t(spark, sf_dir, "events")
    return spearman_approx(e, "value", "user_id").select(
        r6(F.col("spearman")).alias("spearman")
    )


@query(
    "events_interpolate_1h",
    """
    WITH RECURSIVE buckets AS (
      SELECT user_id, time_bucket(INTERVAL '1 hour', ts) AS grid_ts,
             round(avg(value), 6) AS v
      FROM events WHERE user_id <= 3 GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(grid_ts) AS t0, max(grid_ts) AS t1
      FROM buckets GROUP BY user_id
    ), spine AS (
      SELECT user_id, t0 AS grid_ts, t1 FROM bounds
      UNION ALL
      SELECT user_id, grid_ts + INTERVAL '1 hour', t1
      FROM spine WHERE grid_ts < t1
    ), g AS (
      SELECT s.user_id, s.grid_ts, b.v
      FROM spine s LEFT JOIN buckets b
        ON s.user_id = b.user_id AND s.grid_ts = b.grid_ts
    ), gi AS (
      SELECT user_id, grid_ts, v,
             count(v) OVER (PARTITION BY user_id ORDER BY grid_ts
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp_prev,
             count(v) OVER (PARTITION BY user_id ORDER BY grid_ts DESC
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS grp_next
      FROM g
    ), filled AS (
      SELECT user_id, grid_ts, v,
             max(v) OVER (PARTITION BY user_id, grp_prev) AS pv,
             max(CASE WHEN v IS NOT NULL THEN grid_ts END)
               OVER (PARTITION BY user_id, grp_prev) AS pt,
             max(v) OVER (PARTITION BY user_id, grp_next) AS nv,
             min(CASE WHEN v IS NOT NULL THEN grid_ts END)
               OVER (PARTITION BY user_id, grp_next) AS nt
      FROM gi
    )
    SELECT user_id, grid_ts,
           CAST(floor((CASE WHEN v IS NOT NULL THEN v
                 ELSE pv + (nv - pv) * ((epoch(grid_ts) - epoch(pt))
                                        / (epoch(nt) - epoch(pt))) END)
                 * 1000000 + 0.5) AS BIGINT) AS value_micro,
           (v IS NULL) AS is_interpolated
    FROM filled
    """,
)
def events_interpolate_1h(spark, sf_dir):
    """W2+W3: per-user 1-hour grid, linear gap interpolation, spine
    trimmed to each user's observed range (ref stream_eda.ipynb cells
    19,24,29-30 — pandas resample().interpolate(), validated against
    the same window algebra in DuckDB). See operators.interpolation.

    Comparison encoding: blend inputs are 6-digit-rounded on both
    engines, so the IEEE blend arithmetic is bit-identical; the output
    is scaled to integer micro-units with floor(v*1e6 + 0.5) — pure
    float ops — because decimal-string round() differs between engines
    on exact-half values (Spark BigDecimal HALF_UP vs DuckDB float).

    Oracle portability: the r2 driver harness died before recording
    this row, so the oracle avoids every DuckDB-specific construct the
    original used — the spine is a standard-SQL RECURSIVE CTE (not
    unnest(generate_series(...))) and the carried neighbors come from
    count() gaps-and-islands groups (not last_value(... IGNORE NULLS)).
    """
    from ..operators.interpolation import grid_interpolate

    e = t(spark, sf_dir, "events").filter(F.col("user_id") <= 3)
    out = grid_interpolate(e, "user_id", "ts", "value", 3600, bucket_ndigits=6)
    return out.select(
        "user_id",
        "grid_ts",
        F.floor(F.col("value") * 1000000 + F.lit(0.5)).cast("long").alias("value_micro"),
        "is_interpolated",
    )


@query(
    "events_asof_join",
    """
    WITH u AS (
      SELECT event_id, ts, user_id, value AS purchase_value,
             CAST(NULL AS DOUBLE) AS click_value,
             1 AS is_probe, CAST(0 AS BIGINT) AS ord_id
      FROM events WHERE event_type = 'purchase'
      UNION ALL
      SELECT CAST(NULL AS BIGINT), ts, user_id, CAST(NULL AS DOUBLE),
             value, 0, event_id
      FROM events WHERE event_type = 'click'
    ), g AS (
      SELECT *, count(click_value) OVER (
               PARTITION BY user_id ORDER BY ts, is_probe, ord_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM u
    ), f AS (
      SELECT *, max(click_value) OVER (PARTITION BY user_id, grp)
               AS last_click_value
      FROM g
    )
    SELECT event_id, ts, purchase_value, last_click_value
    FROM f WHERE is_probe = 1
    """,
)
def events_asof_join(spark, sf_dir):
    """As-of join: each purchase matched to the user's latest click at or
    before it (ref J4 time-grid alignment, stream_eda.ipynb cells 19,24 —
    generalized to the canonical as-of operator).

    Spark-first: union both sides tagged, one window pass per user
    ordered by time carrying last(click) forward — no range join
    explosion, single shuffle on user_id.

    The oracle mirrors the SAME union + window algebra in conservative
    standard SQL (count() gaps-and-islands for "last non-null", no
    DuckDB ASOF JOIN extension, no IGNORE NULLS): the r2 driver harness
    died before recording this row, so the oracle now uses only
    constructs every DuckDB build parses. Ties are deterministic on both
    engines: clicks order by event_id within an equal timestamp, and
    clicks sort before probes (is_probe) so a same-ts click is visible.
    """
    e = t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "ts", "user_id", F.col("value").alias("purchase_value")
    )
    c = e.filter(F.col("event_type") == "click").select(
        "ts", "user_id", F.col("value").alias("click_value"),
        F.col("event_id").alias("ord_id"),
    )
    unioned = (
        p.withColumn("click_value", F.lit(None).cast("double"))
        .withColumn("ord_id", F.lit(0).cast("long"))
        .unionByName(
            c.withColumn("event_id", F.lit(None).cast("long")).withColumn(
                "purchase_value", F.lit(None).cast("double")
            )
        )
    )
    # Clicks sort before purchases at identical ts (is_probe=0 first) so a
    # same-timestamp click is visible to the purchase ("at or before");
    # among same-ts clicks the highest event_id wins (ord_id tiebreak).
    is_probe = F.col("purchase_value").isNotNull().cast("int")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", is_probe, "ord_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "last_click_value", F.last("click_value", ignorenulls=True).over(w)
    )
    return carried.filter(F.col("purchase_value").isNotNull()).select(
        "event_id", "ts", "purchase_value", "last_click_value"
    )


@query(
    "events_sessionize",
    """
    WITH o AS (
      SELECT user_id, ts, value, event_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL 8 HOUR
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM o
    )
    SELECT user_id, min(ts) AS session_start,
           max(ts) + INTERVAL 8 HOUR AS session_end,
           count(*) AS n_events, round(sum(CAST(round((value) * 1000000) AS BIGINT)) / 1000000.0, 6) AS total_value
    FROM s GROUP BY user_id, sid
    """,
)
def events_sessionize(spark, sf_dir):
    """Sessionization: group each user's event stream into activity
    sessions separated by >= 8 h of silence — the gaps-and-islands
    analysis the reference's fixed tumbling windows cannot express
    (session boundaries follow the DATA, not the clock). Spark's native
    ``session_window`` computes it as a single grouped aggregation;
    the oracle derives identical islands via lag + running break-count.

    Session end follows Spark's convention: last event + gap (the
    session stays "open" one full gap past its last event), and an
    event exactly at the previous event + gap starts a NEW session
    (session windows are [start, end)).

    Scale shape: one hash shuffle on user_id, then per-key in-memory
    session merging — no window over the whole table, sessions never
    cross keys, AQE handles skewed users. The 100 TB plan is identical.
    """
    e = t(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "8 hours").alias("sw"))
        .agg(
            F.count("*").alias("n_events"),
            xsum(F.col("value")).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "events_trailing_7d",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             round(sum(CAST(round((value) * 1000000) AS BIGINT)) / 1000000.0, 6) AS daily_total
      FROM events GROUP BY 1, 2
    )
    SELECT event_type, day, daily_total,
           round(avg(daily_total) OVER (
             PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ), 6) AS trail7_avg,
           count(*) OVER (
             PARTITION BY event_type ORDER BY day
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS trail7_days
    FROM daily
    """,
)
def events_trailing_7d(spark, sf_dir):
    """Trailing 7-day average via a RANGE window frame — value-based
    framing over the date axis, not ROWS: days missing from the data
    simply don't widen the frame, so the two formulations differ
    whenever a stream has gaps (ROWS BETWEEN 6 PRECEDING would reach
    back 7 *observations*). SURVEY §2.5 has only unbounded/lag frames.

    Scale shape: the daily aggregate collapses events to the
    |days×types| grid FIRST (partial map-side agg, one shuffle), and
    the range window runs per-type over that tiny frame — the fact
    table never meets a window function. daily_total is rounded before
    the window on both engines so the frame sums identical inputs."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(xsum(F.col("value")).alias("daily_total"))
    # rangeBetween needs a numeric ordering key: days since epoch
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day",
        "daily_total",
        r6(F.avg("daily_total").over(w)).alias("trail7_avg"),
        F.count("*").over(w).alias("trail7_days"),
    )


@query(
    "events_variant_extract",
    """
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def events_variant_extract(spark, sf_dir):
    """Spark 4 VARIANT decode of the JSON props column:
    ``parse_json`` once into the binary variant encoding, then typed
    ``try_variant_get`` extraction — the modern replacement for
    re-parsing JSON text per access (events_json_extract's
    get_json_object form). At 100 TB the difference is parse-once
    shredded binary vs a full JSON text parse per extracted field;
    with props landed as a variant COLUMN in parquet, extraction
    becomes pure columnar reads. The oracle extracts the same field
    from the JSON text — a hash match proves the variant path decodes
    losslessly. Integer sum keeps the comparison FP-free."""
    e = t(spark, sf_dir, "events")
    return (
        e.select(
            "event_type",
            F.try_variant_get(
                F.parse_json("props"), "$.k", "bigint"
            ).alias("k"),
        )
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count("*").alias("n"))
    )


@query(
    "events_expectations_metrics",
    """
    SELECT 'value_nonnegative' AS expectation,
           CAST(sum(CASE WHEN NOT coalesce(value >= 0, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
           round(sum(CASE WHEN NOT coalesce(value >= 0, FALSE)
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6) AS violation_rate
    FROM events
    UNION ALL
    SELECT 'value_under_400',
           CAST(sum(CASE WHEN NOT coalesce(value < 400, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN NOT coalesce(value < 400, FALSE)
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    FROM events
    UNION ALL
    SELECT 'props_nonempty',
           CAST(sum(CASE WHEN NOT coalesce(len(props) > 2, FALSE)
                    THEN 1 ELSE 0 END) AS BIGINT),
           round(sum(CASE WHEN NOT coalesce(len(props) > 2, FALSE)
                     THEN 1 ELSE 0 END) * 1.0 / count(*), 6)
    FROM events
    """,
)
def events_expectations_metrics(spark, sf_dir):
    """The declarative expectations gate (functions.expectations) run
    over events: three named rules evaluated in ONE projection, the
    violation metrics table in ONE aggregation pass. The oracle
    recomputes each rule's violation count independently in SQL — a
    hash match proves both the per-rule evaluation (including the
    NULL-counts-as-failure policy, via the coalesce on both sides) and
    the metrics arithmetic.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    from ..functions.expectations import apply_expectations

    e = t(spark, sf_dir, "events")
    _, _, metrics = apply_expectations(
        e,
        {
            "value_nonnegative": F.col("value") >= 0,
            "value_under_400": F.col("value") < 400,
            "props_nonempty": F.length("props") > 2,
        },
    )
    return metrics


@query(
    "events_interval_join_firstday",
    """
    WITH iv AS (
      SELECT user_id, min(ts) AS start_ts,
             min(ts) + INTERVAL 24 HOURS AS end_ts
      FROM events GROUP BY user_id
    )
    SELECT e.user_id, count(*) AS n_events,
           CAST(sum(CAST(floor(e.value * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
             AS sum_value_micros
    FROM events e JOIN iv ON e.user_id = iv.user_id
                        AND e.ts >= iv.start_ts AND e.ts < iv.end_ts
    GROUP BY e.user_id
    """,
)
def events_interval_join_firstday(spark, sf_dir):
    """Interval (range) join through the bucketed rewrite
    (operators.intervals.interval_join): each user's events joined
    into their first-24-hours interval, then aggregated. The oracle
    computes the same containment with a direct range predicate — a
    hash match proves the bucket-explode + equi-join + refine plan
    implements exactly ``start <= ts < end`` semantics, boundary
    microseconds included.

    The naive Spark formulation of the same join is a nested-loop
    (non-equi predicate); the bucketed form here shuffles once on
    (user_id, hour-bucket). The value sum is quantized to integer
    micro-units PER ROW before summing (round-half-up at 1e-6), so the
    aggregate is exact BIGINT arithmetic — immune to summation-order
    FP drift between engines and partition layouts, the same
    discipline as report_weekly_rollup's integer cents.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    from ..operators.intervals import interval_join

    e = t(spark, sf_dir, "events")
    iv = e.groupBy("user_id").agg(
        F.min("ts").alias("start_ts"),
        (F.min("ts") + F.expr("INTERVAL 24 HOURS")).alias("end_ts"),
    )
    joined = interval_join(
        e.select("user_id", "ts", "value"),
        iv,
        point_ts="ts",
        start="start_ts",
        end="end_ts",
        keys=["user_id"],
        bucket_seconds=3600,
    )
    micros = F.floor(F.col("value") * 1e6 + 0.5).cast("bigint")
    return joined.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.sum(micros).cast("bigint").alias("sum_value_micros"),
    )


@query("events_distinct_sketch_rollup", None)
def events_distinct_sketch_rollup(spark, sf_dir):
    """Incremental distinct counting through a persisted-sketch-table
    shape (operators.sketch.distinct_sketch_table / distinct_estimate):
    build per-(day, event_type) HLL sketches — the table a 100 TB
    deployment lands ONCE per day — then answer the per-type distinct
    question by UNIONING the daily sketches, never touching raw rows.
    Exact distinct counts can't do this (count(DISTINCT) is not
    additive across days); HLL registers union losslessly.

    Deliberately NO SQL oracle: an HLL estimate is not reproducible in
    another engine (different hash family), and even the sparse regime
    can sit ±1 off the true count — an exact-equality oracle would be
    data-regeneration-fragile. The contract is pinned instead by
    tests/test_sketch.py: estimate-vs-exact accuracy at small AND 10k
    cardinality, union-vs-direct agreement, no-double-count on
    re-union, and parquet persistence round-trip.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows)."""
    from ..operators.sketch import distinct_estimate, distinct_sketch_table

    e = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = distinct_sketch_table(e, ["day", "event_type"], "user_id")
    return distinct_estimate(daily, ["event_type"], out_col="n_users")


_QSKETCH_BOUNDS = [float(b) for b in range(5, 645, 5)]  # covers value's range


@query(
    "events_quantile_sketch_rollup",
    f"""
    WITH binned AS (
      SELECT event_type,
             len(list_filter({_QSKETCH_BOUNDS!r}::DOUBLE[], b -> value > b))
               AS bin
      FROM events WHERE value IS NOT NULL
    ), counts AS (
      SELECT event_type, bin, count(*) AS cnt FROM binned GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, bin, cnt,
             sum(cnt) OVER (PARTITION BY event_type ORDER BY bin) AS cum,
             sum(cnt) OVER (PARTITION BY event_type) AS total
      FROM counts
    )
    SELECT event_type,
           min(CASE WHEN cum >= 0.5 * total
                    THEN ({_QSKETCH_BOUNDS!r}::DOUBLE[] || ['infinity'::DOUBLE])[bin + 1]
               END) AS q_0_5,
           min(CASE WHEN cum >= 0.9 * total
                    THEN ({_QSKETCH_BOUNDS!r}::DOUBLE[] || ['infinity'::DOUBLE])[bin + 1]
               END) AS q_0_9
    FROM cum GROUP BY event_type
    """,
)
def events_quantile_sketch_rollup(spark, sf_dir):
    """Incremental percentiles through a persisted-histogram-table
    shape (operators.sketch.histogram_sketch_table /
    quantile_estimate) — the quantile twin of the HLL distinct-sketch
    rollup: per-(day, event_type) bin-count rows are the table a
    deployment lands once per day; per-type medians/p90s come from
    SUMMING the selected rows' bins, never rescanning raw data.

    FIXED literal bounds (uniform, covering value's range) rather than
    data-derived approxQuantile boundaries — which is exactly how a
    production sketch table works (bounds frozen at table creation so
    every day's rows stay additive) and what makes the DuckDB oracle
    EXACT: both engines bucket by the same literal list and read the
    same bin edge, no sketch nondeterminism anywhere.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    from ..operators.sketch import histogram_sketch_table, quantile_estimate

    e = t(spark, sf_dir, "events").withColumn("day", F.to_date("ts"))
    daily = histogram_sketch_table(
        e, ["day", "event_type"], "value", _QSKETCH_BOUNDS
    )
    return quantile_estimate(
        daily, _QSKETCH_BOUNDS, [0.5, 0.9], group=["event_type"]
    )
