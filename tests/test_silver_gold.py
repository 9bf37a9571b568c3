"""Golden tests for the medallion pipeline (SURVEY §3.2) on synthesized
bronze fixtures shaped per FIXTURES.md §2-§5."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from bda_spark.operators.gold import (
    aggregated_keywords,
    aggregated_news,
    aggregated_yfinance,
)
from bda_spark.operators.silver import silver_news, silver_yfinance
from bda_spark.schemas import NEWS_SCHEMA, yfinance_bronze_schema

TICKERS = ["XOM", "BP"]


@pytest.fixture(scope="module")
def bronze_news(spark):
    rows = [
        Row(
            title="Oil up",
            text="body a",
            date="2024-01-01",
            keywords=["oil", "energy"],
            is_premium=False,
            source_site="wnp.pl",
            url="u1",
            random="1",
        ),
        Row(  # duplicate title -> dropped in silver
            title="Oil up",
            text="body b",
            date="2024-01-01",
            keywords=["oil"],
            is_premium=True,
            source_site="wnp.pl",
            url="u2",
            random="2",
        ),
        Row(
            title="Gas down",
            text="body c",
            date="2024-01-02",
            keywords=["gas", "energy"],
            is_premium=False,
            source_site="beurs.nl",
            url="u3",
            random="3",
        ),
        Row(
            title="No date",
            text="body d",
            date=None,
            keywords=[],
            is_premium=False,
            source_site="beurs.nl",
            url="u4",
            random="4",
        ),
    ]
    return spark.createDataFrame(rows, NEWS_SCHEMA)


def _upd(price, vol, ts, source="real"):
    return Row(
        price=price,
        volume=vol,
        volatility=1.0,
        bid_ask_spread=0.1,
        market_sentiment=0.5,
        trading_activity=10.0,
        timestamp=ts,
        source=source,
    )


@pytest.fixture(scope="module")
def bronze_yf(spark):
    rows = [
        Row(
            timestamp="2024-01-01T00:00:00",
            updates_XOM=[_upd(100.0, 10, "2024-01-01T00:00:01"), _upd(101.0, 11, "2024-01-01T00:00:02")],
            updates_BP=[_upd(50.0, 5, "2024-01-01T00:00:01")],
        ),
        Row(  # overlapping dump: same update repeated -> dedup
            timestamp="2024-01-01T00:00:00",
            updates_XOM=[_upd(100.0, 10, "2024-01-01T00:00:01")],
            updates_BP=[_upd(51.0, 6, "2024-01-02T00:00:03")],
        ),
    ]
    return spark.createDataFrame(rows, yfinance_bronze_schema(TICKERS))


def test_silver_news_dedup_and_format(bronze_news):
    out = silver_news(bronze_news).collect()
    assert len(out) == 3  # one duplicate title dropped
    by_title = {r.title: r for r in out}
    assert by_title["Oil up"].datetime == "2024-01-01T00:00:00.000000"
    assert by_title["No date"].datetime is None


def test_silver_yfinance_flatten_dedup(bronze_yf):
    out = silver_yfinance(bronze_yf, TICKERS)
    rows = out.collect()
    # 4 updates total after dedup of the repeated (dump, update, XOM) row
    assert len(rows) == 4
    assert set(out.columns) == {
        "record_timestamp",
        "price",
        "volume",
        "volatility",
        "bid_ask_spread",
        "market_sentiment",
        "trading_activity",
        "update_timestamp",
        "source",
        "company",
    }
    assert {r.company for r in rows} == {"XOM", "BP"}


def test_gold_news(bronze_news):
    silver = silver_news(bronze_news)
    news = {(r.symbol, str(r.aggregation_date)): r.total_articles for r in aggregated_news(silver).collect()}
    assert news[("wnp.pl", "2024-01-01")] == 1
    assert news[("beurs.nl", "2024-01-02")] == 1
    kw = aggregated_keywords(silver).collect()
    assert {(r.symbol, r.keyword) for r in kw} == {
        ("wnp.pl", "oil"),
        ("wnp.pl", "energy"),
        ("beurs.nl", "gas"),
        ("beurs.nl", "energy"),
    }


def test_gold_yfinance(bronze_yf):
    silver = silver_yfinance(bronze_yf, TICKERS)
    gold = {(r.symbol, str(r.aggregation_date)): r for r in aggregated_yfinance(silver).collect()}
    xom = gold[("XOM", "2024-01-01")]
    assert xom.avg_price == pytest.approx(100.5)
    assert xom.max_price == 101.0
    assert xom.min_price == 100.0
    assert xom.avg_volume == pytest.approx(10.5)
