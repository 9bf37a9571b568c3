"""S12 tests: the Spark-native tick generator — schema fidelity, D8
gate admission, feed-shape sentinels, JSON-lines landing round trip,
and the streaming (rate-source) form."""

from __future__ import annotations

import time

from bda_spark.functions.cleaning import validate_ticks
from bda_spark.schemas import SENTINEL, TICK_SCHEMA, TICK_SOURCES, TICK_SYMBOLS
from bda_spark.sources.generator import (
    generate_ticks,
    generated_tick_stream,
    land_tick_jsonl,
)
from bda_spark.streaming import file_replay_tick_stream

N = 500


def test_generated_ticks_schema_and_gate(spark):
    ticks = generate_ticks(spark, N)
    assert [(f.name, f.dataType) for f in ticks.schema] == [
        (f.name, f.dataType) for f in TICK_SCHEMA
    ]
    # the producer honours its own 9-constraint contract: the ingest
    # gate admits every generated tick
    assert validate_ticks(ticks).count() == N


def test_generated_feed_shapes(spark):
    rows = generate_ticks(spark, N).collect()
    assert {r.symbol for r in rows} == set(TICK_SYMBOLS)
    assert {r.source for r in rows} == set(TICK_SOURCES)
    for r in rows:
        if r.symbol == "ETHEREUM":  # XTB book feed: sentinel equity metrics
            assert r.source == "XTB_FEED"
            assert r.volume == SENTINEL and r.volatility == SENTINEL
            assert r.bid < r.price < r.ask
            assert abs(r.spread_raw - (r.ask - r.bid)) < 1e-9
        else:  # yfinance equity feed: sentinel book columns
            assert r.source == "YLIFE_FEED"
            assert r.bid == SENTINEL and r.ask == SENTINEL
            assert -1.0 <= r.market_sentiment <= 1.0
            assert 0.0 <= r.trading_activity <= 100.0


def test_generator_is_deterministic(spark):
    a = sorted(map(tuple, generate_ticks(spark, N, num_partitions=2).collect()))
    b = sorted(map(tuple, generate_ticks(spark, N, num_partitions=7).collect()))
    assert a == b  # same ids -> same ticks, regardless of parallelism


def test_landed_jsonl_replays_through_decode(spark, tmp_path):
    """The landed JSON lines are byte-compatible Kafka record values:
    the file-replay decode path reconstructs every tick."""
    src = str(tmp_path / "ticks")
    land_tick_jsonl(generate_ticks(spark, N), src)
    q = (
        file_replay_tick_stream(spark, src)
        .writeStream.format("memory")
        .queryName("generated_replay")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    decoded = spark.table("generated_replay")
    assert decoded.count() == N
    assert validate_ticks(decoded).count() == N


def test_streaming_generator_produces_valid_ticks(spark, tmp_path):
    """The rate-source form emits the same record shape continuously;
    one or two micro-batches are enough to assert liveness + validity."""
    stream = generated_tick_stream(spark, rows_per_second=50)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("generated_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("generated_stream").count() >= 10:
                break
            time.sleep(1)
    finally:
        q.stop()
        q.awaitTermination()
    got = spark.table("generated_stream")
    n = got.count()
    assert n >= 10
    assert validate_ticks(got).count() == n
