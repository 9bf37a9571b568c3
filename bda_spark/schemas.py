"""Explicit schemas for every record shape the engine ingests.

Reproduces the reference's data model (SURVEY.md §1, FIXTURES.md):
- market tick record (reference: Deliverable_3/stream_from_kafka_to_cassandra.py:19-32)
- news article (reference: Deliverable_2/Batch Data Codes/scraper.py:275-283,398-403)
- nested yfinance bronze (reference: Deliverable_3/load_to_silver_layer.py:59-117)
- streaming sink schemas (reference: NEW_train_offset_3_10min.py:259-270,
  joined_streams.py:126-149)
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Sentinel used by the reference producers for "metric absent on this feed"
# (reference: Deliverable_2/Stream Data Codes/yfinance_stream.py:153-154).
SENTINEL = -1.0

TICK_SYMBOLS = ["BP", "COP", "SHEL", "XOM", "ETHEREUM"]
TICK_SOURCES = ["YLIFE_FEED", "XTB_FEED"]

# 13-field flat tick record; epoch-millis LongType timestamp, all metrics
# DoubleType with -1.0 sentinels.
TICK_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("timestamp", LongType()),  # epoch millis
        StructField("source", StringType()),
        StructField("data_type", StringType()),
        StructField("bid", DoubleType()),
        StructField("ask", DoubleType()),
        StructField("price", DoubleType()),
        StructField("volume", DoubleType()),
        StructField("spread_raw", DoubleType()),
        StructField("spread_table", DoubleType()),
        StructField("volatility", DoubleType()),
        StructField("market_sentiment", DoubleType()),
        StructField("trading_activity", DoubleType()),
    ]
)

NEWS_SCHEMA = StructType(
    [
        StructField("title", StringType()),
        StructField("text", StringType()),
        StructField("date", StringType()),
        StructField("keywords", ArrayType(StringType())),
        StructField("is_premium", BooleanType()),
        StructField("source_site", StringType()),
        StructField("url", StringType()),
        StructField("random", StringType()),
    ]
)

# struct inside the per-ticker updates_<T> array columns
YF_UPDATE_STRUCT = StructType(
    [
        StructField("price", DoubleType()),
        StructField("volume", LongType()),
        StructField("volatility", DoubleType()),
        StructField("bid_ask_spread", DoubleType()),
        StructField("market_sentiment", DoubleType()),
        StructField("trading_activity", DoubleType()),
        StructField("timestamp", StringType()),  # ISO string
        StructField("source", StringType()),  # {"real","simulated"}
    ]
)


def yfinance_bronze_schema(tickers: list[str]) -> StructType:
    """Nested bronze shape: one array<struct> column per ticker."""
    fields = [StructField("timestamp", StringType())]
    fields += [
        StructField(f"updates_{t}", ArrayType(YF_UPDATE_STRUCT)) for t in tickers
    ]
    return StructType(fields)


PREDICTIONS_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("timestamp", LongType()),
        StructField("event_time", TimestampType()),
        StructField("input_data", StringType()),  # JSON of features
        StructField("prediction", DoubleType()),
        StructField("prediction_historical", DoubleType()),
        StructField("label", DoubleType()),  # null until backfilled
    ]
)

CORRELATIONS_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("timestamp", LongType()),
        StructField("event_time", TimestampType()),
        StructField("window_start_ts", LongType()),
        StructField("window_end_ts", LongType()),
        StructField("correlation", DoubleType()),
        StructField("bp_price", DoubleType()),
        StructField("eth_ask", DoubleType()),
    ]
)

# Driver-provided synthetic tables (TESTDATA.md).
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
