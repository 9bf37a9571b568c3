"""Silver -> gold daily aggregates (SURVEY.md §2.4 A3, A5; §3.2 step 4).

Reproduces Deliverable_4/load_to_gold_layer.py:40-64 as pure
groupBy().agg() DataFrames. The reference then collect()s and issues
per-row CQL INSERTs (:76-97) — we return DataFrames and let the caller
``df.write`` them (distributed, idempotent overwrite-by-partition).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def aggregated_news(silver_news: DataFrame) -> DataFrame:
    """(source_site, day) -> article count (ref load_to_gold_layer.py:40-43)."""
    return (
        silver_news.withColumn("aggregation_date", F.to_date("datetime"))
        .groupBy(F.col("source_site").alias("symbol"), "aggregation_date")
        .agg(F.count("title").alias("total_articles"))
    )


def aggregated_keywords(silver_news: DataFrame) -> DataFrame:
    """(source_site, day, keyword) -> count (ref :45-49)."""
    return (
        silver_news.withColumn("aggregation_date", F.to_date("datetime"))
        .select(
            F.col("source_site").alias("symbol"),
            "aggregation_date",
            F.explode("keywords").alias("keyword"),
        )
        .groupBy("symbol", "aggregation_date", "keyword")
        .agg(F.count("*").alias("count"))
    )


def aggregated_yfinance(silver_yf: DataFrame) -> DataFrame:
    """(company, day) -> price stats + volume/volatility/sentiment means
    (ref :54-64)."""
    return (
        silver_yf.withColumn("aggregation_date", F.to_date("update_timestamp"))
        .groupBy(F.col("company").alias("symbol"), "aggregation_date")
        .agg(
            F.avg("price").alias("avg_price"),
            F.max("price").alias("max_price"),
            F.min("price").alias("min_price"),
            F.avg("volume").alias("avg_volume"),
            F.avg("volatility").alias("avg_volatility"),
            F.avg("market_sentiment").alias("avg_sentiment"),
        )
    )
