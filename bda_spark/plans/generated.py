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

from pyspark.sql import functions as F

from ..functions.cleaning import validate_ticks
from ..sources.generator import generate_ticks
from .registry import query, r6

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
           round(sum(volume), 6) AS total_volume
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
        r6(F.sum("volume")).alias("total_volume"),
    )
