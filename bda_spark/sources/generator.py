"""S12: the tick-feed generator, Spark-native (SURVEY.md §2.1 S12).

The reference generates its feeds with confluent-kafka producer loops
(simulated yfinance ticks one JSON record per 0.1-2.0 s sleep,
reference: Deliverable_2/Stream Data Codes/yfinance_stream.py:142-186,
298-300; the XTB websocket relay: xtb_stream.py:242-313). Re-expressed
Spark-first: the ENGINE is the generator — a ``range`` (batch) or
``rate`` (streaming) source drives a pure-expression synthesis of the
13-field tick record, so generation scales horizontally like any other
query, needs no external producer process, and the stream pipes
straight into decode/validate/train or lands as JSON lines (one line =
one Kafka record value) for file replay.

Determinism: every field is integer arithmetic on the row id, so the
same id always yields the same tick — the CORRECTNESS oracle recomputes
the generator in SQL from ``range()`` and the outputs must agree
exactly. Feed shapes mirror the reference producers: equity symbols
(YLIFE_FEED) carry volume/volatility/sentiment/activity and sentinel
book columns; ETHEREUM (XTB_FEED) carries the bid/ask book and
sentinel equity metrics (yfinance_stream.py:148-162, xtb_stream.py:74-88).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import SENTINEL, TICK_SCHEMA, TICK_SYMBOLS

# 2024-01-01T00:00:00Z — safely in the past so the D8 no-future-timestamp
# gate admits every generated tick.
DEFAULT_START_MS = 1_704_067_200_000

_BASE_PRICE = [100.0, 80.0, 60.0, 120.0, 2000.0]  # aligned with TICK_SYMBOLS


def synthesize_ticks(
    numbered: DataFrame,
    id_col: str = "id",
    start_ms: int = DEFAULT_START_MS,
    interval_ms: int = 1000,
) -> DataFrame:
    """Pure-expression tick synthesis over any frame with a long id
    column (``spark.range`` batch, ``rate`` stream — both provide one).
    All 13 fields are deterministic integer arithmetic on the id; no
    UDF, no randomness, fully codegen'd."""
    i = F.col(id_col)
    sym_idx = F.pmod(i, F.lit(len(TICK_SYMBOLS))).cast("int")
    symbol = F.element_at(
        F.array(*[F.lit(s) for s in TICK_SYMBOLS]), sym_idx + 1
    )
    base = F.element_at(
        F.array(*[F.lit(p) for p in _BASE_PRICE]), sym_idx + 1
    )
    is_eth = symbol == F.lit("ETHEREUM")
    # price oscillates deterministically ±48% of nothing exotic: the
    # wiggle is (i mod 97 - 48)/100, an exact dyadic-free but
    # integer-derived double both engines compute identically
    price = base * (F.lit(1.0) + (F.pmod(i, F.lit(97)) - F.lit(48)) * F.lit(0.01))
    sent = (F.pmod(i, F.lit(41)) - F.lit(20)) / F.lit(20.0)  # in [-1, 1]
    activity = F.pmod(i, F.lit(101)).cast("double")  # in [0, 100]
    volume = (F.lit(1000) + F.pmod(i, F.lit(53)) * F.lit(10)).cast("double")
    volatility = F.lit(0.5) + F.pmod(i, F.lit(7)).cast("double") * F.lit(0.1)
    spread = F.lit(0.5) + F.pmod(i, F.lit(5)).cast("double") * F.lit(0.1)

    def eq(col: Column) -> Column:  # equity-feed metric, sentinel on XTB
        return F.when(is_eth, F.lit(SENTINEL)).otherwise(col)

    def eth(col: Column) -> Column:  # book metric, sentinel on yfinance
        return F.when(is_eth, col).otherwise(F.lit(SENTINEL))

    return numbered.select(
        symbol.alias("symbol"),
        (F.lit(start_ms) + i * F.lit(interval_ms)).alias("timestamp"),
        F.when(is_eth, F.lit("XTB_FEED")).otherwise(F.lit("YLIFE_FEED")).alias(
            "source"
        ),
        F.lit("MARKET_DATA").alias("data_type"),
        eth(price - spread).alias("bid"),
        eth(price + spread).alias("ask"),
        price.alias("price"),
        eq(volume).alias("volume"),
        eth(spread * 2.0).alias("spread_raw"),
        eth(spread * 2.0).alias("spread_table"),
        eq(volatility).alias("volatility"),
        eq(sent).alias("market_sentiment"),
        eq(activity).alias("trading_activity"),
    )


def generate_ticks(
    spark: SparkSession,
    n: int,
    start_ms: int = DEFAULT_START_MS,
    interval_ms: int = 1000,
    num_partitions: int | None = None,
) -> DataFrame:
    """Batch test-data generator: n deterministic ticks (the Spark twin
    of the producer's simulation loop). ``spark.range`` parallelizes the
    id space, so generation is embarrassingly parallel at any n."""
    rng = spark.range(0, n, 1, num_partitions) if num_partitions else spark.range(n)
    return synthesize_ticks(rng, "id", start_ms, interval_ms)


def generated_tick_stream(
    spark: SparkSession,
    rows_per_second: int = 2,
    start_ms: int = DEFAULT_START_MS,
    interval_ms: int = 1000,
) -> DataFrame:
    """Streaming generator: the ``rate`` source's monotone ``value``
    drives the same synthesis (1-2 rows/s mirrors the reference's
    producer cadence, yfinance_stream.py:298-300). Feeds the decode /
    validate / train pipeline directly — or ``writeStream.format
    ("kafka")`` on a cluster with a broker, making it a literal
    producer."""
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", str(rows_per_second)
    ).load()
    return synthesize_ticks(rate, "value", start_ms, interval_ms)


def land_tick_jsonl(ticks: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Serialize ticks as JSON lines — one line per Kafka record value,
    byte-compatible with file_replay_tick_stream's decode (the landed
    form of the producer's ``Producer.produce(topic, value=json)``)."""
    ticks.select(
        F.to_json(F.struct(*TICK_SCHEMA.fieldNames())).alias("value")
    ).write.mode(mode).text(path)
