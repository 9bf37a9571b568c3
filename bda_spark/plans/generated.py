"""S12 as a CORRECTNESS query: the Spark-native tick generator profiled
per feed, with a DuckDB oracle that recomputes the generator from
``range()`` — because synthesis is pure integer arithmetic on the row
id, both engines must produce identical ticks, and the profile
aggregates must hash-match.

The Spark side additionally pipes the generated ticks through the D8
ingest gate (functions.cleaning.validate_ticks): the per-group counts
matching the oracle's (which does NOT filter) proves the gate admits
100% of producer output — the generator honours its own schema
contract (reference: tests_pub_sub_schema.py:53-112).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from ..functions.cleaning import validate_ticks
from ..sources.generator import generate_ticks
from .registry import query, r6, t, xsum

_N = 10_000


@query(
    "generated_ticks_profile",
    f"""
    WITH g AS (
      SELECT i, i % 5 AS s,
             CAST(CASE i % 5 WHEN 0 THEN 100.0 WHEN 1 THEN 80.0 WHEN 2 THEN 60.0
                             WHEN 3 THEN 120.0 ELSE 2000.0 END AS DOUBLE)
               * (CAST(1.0 AS DOUBLE) + (i % 97 - 48) * CAST(0.01 AS DOUBLE))
               AS price,
             CAST(0.5 AS DOUBLE) + (i % 5) * CAST(0.1 AS DOUBLE) AS spread,
             (i % 41 - 20) / CAST(20.0 AS DOUBLE) AS sent,
             CAST(i % 101 AS DOUBLE) AS activity,
             CAST(1000 + (i % 53) * 10 AS DOUBLE) AS volume
      FROM range({_N}) r(i)
    ), t AS (
      SELECT CASE s WHEN 0 THEN 'BP' WHEN 1 THEN 'COP' WHEN 2 THEN 'SHEL'
                    WHEN 3 THEN 'XOM' ELSE 'ETHEREUM' END AS symbol,
             CASE WHEN s = 4 THEN 'XTB_FEED' ELSE 'YLIFE_FEED' END AS source,
             price,
             CASE WHEN s = 4 THEN price - spread
                  ELSE CAST(-1.0 AS DOUBLE) END AS bid,
             CASE WHEN s = 4 THEN price + spread
                  ELSE CAST(-1.0 AS DOUBLE) END AS ask,
             CASE WHEN s = 4 THEN CAST(-1.0 AS DOUBLE) ELSE volume END AS volume,
             CASE WHEN s = 4 THEN CAST(-1.0 AS DOUBLE) ELSE sent END
               AS market_sentiment,
             CASE WHEN s = 4 THEN CAST(-1.0 AS DOUBLE) ELSE activity END
               AS trading_activity
      FROM g
    )
    SELECT symbol, source, count(*) AS n,
           round(avg(price), 6) AS avg_price,
           round(min(bid), 6) AS min_bid,
           round(max(ask), 6) AS max_ask,
           round(avg(market_sentiment), 6) AS avg_sentiment,
           round(avg(trading_activity), 6) AS avg_activity,
           round(sum(CAST(round((volume) * 1000000) AS BIGINT)) / 1000000.0, 6) AS total_volume
    FROM t GROUP BY symbol, source
    """,
)
def generated_ticks_profile(spark, sf_dir):
    """Generate {_N} ticks, gate them (D8), profile per (symbol, source).
    sf_dir is unused: the generator IS the source (reference producers:
    yfinance_stream.py:142-186, xtb_stream.py:74-105)."""
    ticks = validate_ticks(generate_ticks(spark, _N))
    return ticks.groupBy("symbol", "source").agg(
        F.count("*").alias("n"),
        r6(F.avg("price")).alias("avg_price"),
        r6(F.min("bid")).alias("min_bid"),
        r6(F.max("ask")).alias("max_ask"),
        r6(F.avg("market_sentiment")).alias("avg_sentiment"),
        r6(F.avg("trading_activity")).alias("avg_activity"),
        xsum(F.col("volume")).alias("total_volume"),
    )


@query(
    "csv_tick_ingest",
    """
    SELECT 'BP' AS symbol, count(*) AS n_ticks,
           CAST(min(epoch_ms(ts)) AS BIGINT) AS min_ts,
           CAST(max(epoch_ms(ts)) AS BIGINT) AS max_ts,
           min(value) AS min_price,
           max(value) AS max_price
    FROM events
    """,
)
def csv_tick_ingest(spark, sf_dir):
    """CSV capture round-trip (sources S1-adjacent: the reference lands
    whole Kafka topics as CSV for offline analysis — reference:
    Deliverable_3/kafka_messages.csv). The events table is shaped into
    the 13-field tick capture, written as headered CSV, read back
    through ``read_csv_ticks`` (explicit schema, no inference pass),
    gated by validate_ticks (D8), and profiled. The oracle recomputes
    the profile straight from events — matching proves the CSV
    encode/decode cycle is lossless for every field type it touches
    (string, epoch-millis bigint, double: Spark writes doubles with
    round-trippable shortest repr).

    Aggregates are deliberately order-free exact ops (count, min, max)
    — no double summation whose order could differ between engines.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries.
    """
    from ..streaming.sources import read_csv_ticks

    events = t(spark, sf_dir, "events")
    tick_cols = [
        F.lit("BP").alias("symbol"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.lit("YLIFE_FEED").alias("source"),
        F.lit("MARKET_DATA").alias("data_type"),
        F.lit(-1.0).alias("bid"),
        F.lit(-1.0).alias("ask"),
        F.col("value").alias("price"),
        (F.col("user_id") * 10.0).alias("volume"),
        F.lit(-1.0).alias("spread_raw"),
        F.lit(-1.0).alias("spread_table"),
        (F.col("value") / 10.0).alias("volatility"),
        F.lit(0.5).alias("market_sentiment"),
        F.lit(50.0).alias("trading_activity"),
    ]
    # The capture dir must outlive the lazy scan, so the 1-row-per-symbol
    # profile is materialized INSIDE the cleanup scope and handed back as
    # a local frame — no temp dir leaks per verification/bench run.
    tmp = tempfile.mkdtemp(prefix="bda_csv_ticks_")
    try:
        capture = os.path.join(tmp, "capture")
        events.select(tick_cols).write.option("header", "true").mode(
            "overwrite"
        ).csv(capture)
        ticks = validate_ticks(read_csv_ticks(spark, capture))
        profile = ticks.groupBy("symbol").agg(
            F.count("*").alias("n_ticks"),
            F.min("timestamp").alias("min_ts"),
            F.max("timestamp").alias("max_ts"),
            F.min("price").alias("min_price"),
            F.max("price").alias("max_price"),
        )
        rows = profile.collect()
        from ..functions.localrows import rows_frame

        return rows_frame(spark, rows, profile.schema)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
