"""CSV tick ingestion (streaming/sources.py read_csv_ticks /
csv_replay_tick_stream): the reference's captured-topic CSV shape
(reference: Deliverable_3/kafka_messages.csv) through the one
decode/validate pipeline, batch and streaming."""

from __future__ import annotations

import os

from bda_spark.functions.cleaning import validate_ticks
from bda_spark.streaming import csv_replay_tick_stream, read_csv_ticks

HEADER = (
    "symbol,timestamp,source,data_type,bid,ask,price,volume,"
    "spread_raw,spread_table,volatility,market_sentiment,trading_activity"
)
GOOD = [
    "SHEL,1736081410598,YLIFE_FEED,MARKET_DATA,-1.0,-1.0,64.34,5021535.0,-1.0,-1.0,0.402,-0.313,60.21",
    "BP,1736081410738,YLIFE_FEED,MARKET_DATA,-1.0,-1.0,30.52,5138018.0,-1.0,-1.0,0.397,-0.293,63.04",
    "ETHEREUM,1736081411000,XTB_FEED,MARKET_DATA,3610.1,3612.3,-1.0,-1.0,2.2,2.5,0.5,-1.0,-1.0",
]
BAD = [
    "SHEL,not_a_number,YLIFE_FEED,MARKET_DATA,-1,-1,64,1,-1,-1,0.4,0.1,60",  # ts unparseable
    "SHEL,1736081410598,PIRATE_FEED,MARKET_DATA,-1,-1,64,1,-1,-1,0.4,0.1,60",  # bad enum
]


def _write_capture(dirpath, rows):
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "part-0000.csv"), "w") as f:
        f.write("\n".join([HEADER] + rows) + "\n")
    return dirpath


def test_read_csv_ticks_types_and_values(spark, tmp_path):
    cap = _write_capture(str(tmp_path / "cap"), GOOD)
    df = read_csv_ticks(spark, cap)
    types = dict(df.dtypes)
    assert types["timestamp"] == "bigint" and types["price"] == "double"
    rows = {r["symbol"]: r for r in df.collect()}
    assert len(rows) == 3  # header not ingested as data
    assert rows["SHEL"]["timestamp"] == 1736081410598
    assert rows["ETHEREUM"]["bid"] == 3610.1


def test_malformed_lines_die_in_the_gate_not_in_a_crash(spark, tmp_path):
    cap = _write_capture(str(tmp_path / "cap"), GOOD + BAD)
    gated = validate_ticks(read_csv_ticks(spark, cap))
    got = {r["symbol"] for r in gated.collect()}
    # the unparseable-ts row nulls out (PERMISSIVE) -> dropped by the
    # non-null check; the bad enum dies on the isin constraint
    assert got == {"SHEL", "BP", "ETHEREUM"}
    assert gated.count() == 3


def test_csv_replay_stream_matches_batch_read(spark, tmp_path):
    cap = _write_capture(str(tmp_path / "cap"), GOOD)
    out = str(tmp_path / "out")
    q = (
        csv_replay_tick_stream(spark, cap, max_files_per_trigger=1)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = {tuple(r) for r in spark.read.parquet(out).collect()}
    batch = {tuple(r) for r in read_csv_ticks(spark, cap).collect()}
    assert streamed == batch
