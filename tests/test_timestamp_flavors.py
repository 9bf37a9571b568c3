"""Timestamp-flavor canonicalization at the source boundary.

The driver's generator has shipped ``events.ts`` three different ways
across testdata regenerations: TIMESTAMP(NANOS), tz-tagged TIMESTAMP
(LTZ), and untagged TIMESTAMP_NTZ. Round 5's bench died in setup
because ``F.unix_millis`` is LTZ-only and the freshly regenerated
parquet read back as NTZ. These tests pin the contract: whatever
flavor is on disk, ``load_table`` hands every consumer a session-tz
TIMESTAMP with identical wall-clock values, and the LTZ-only call
sites keep working.
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bda_spark.functions.timeutils import floor_to
from bda_spark.sources.batch import load_table

_ROWS = [
    (1, dt.datetime(2024, 1, 1, 0, 0, 0), 10, "click", 1.5, "{}"),
    (2, dt.datetime(2024, 1, 1, 0, 0, 7), 11, "view", 2.5, "{}"),
    (3, dt.datetime(2024, 1, 2, 12, 30, 59), 12, "click", 3.5, "{}"),
]


def _write_events(dirpath: str, ts_type) -> str:
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": pa.array([r[1] for r in _ROWS], ts_type),
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    out = os.path.join(dirpath, "events.parquet")
    pq.write_table(table, out)
    return dirpath


def _assert_canonical(spark, sf_dir: str) -> None:
    ev = load_table(spark, sf_dir, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp", "ts must be LTZ after load"
    got = {
        r["event_id"]: r["ts"]
        for r in ev.select("event_id", "ts").collect()
    }
    assert got == {r[0]: r[1] for r in _ROWS}


def test_ntz_parquet_canonicalized(spark, tmp_path):
    # the round-5 regeneration flavor: timestamp[us], no UTC flag
    sf = _write_events(str(tmp_path), pa.timestamp("us"))
    _assert_canonical(spark, sf)


def test_ltz_parquet_canonicalized(spark, tmp_path):
    sf = _write_events(str(tmp_path), pa.timestamp("us", tz="UTC"))
    _assert_canonical(spark, sf)


def test_nanos_parquet_canonicalized(spark, tmp_path):
    sf = _write_events(str(tmp_path), pa.timestamp("ns"))
    _assert_canonical(spark, sf)


def test_unix_millis_tick_shaping_survives_ntz(spark, tmp_path):
    # prepare_ticks-shaped logic (bench.py): LTZ-only unix_millis over
    # the loaded table must resolve and produce exact epoch millis.
    sf = _write_events(str(tmp_path), pa.timestamp("us"))
    ev = load_table(spark, sf, "events")
    rows = ev.select(
        F.unix_millis(F.col("ts").cast("timestamp")).alias("ms")
    ).collect()
    expect = {
        int(r[1].replace(tzinfo=dt.timezone.utc).timestamp() * 1000)
        for r in _ROWS
    }
    assert {r["ms"] for r in rows} == expect


def test_every_table_timestamp_is_canonicalized(spark):
    # orders/lineitem ship their date columns as untagged timestamp[us]
    # as well — the generalized sweep must normalize them too
    for table, col in [("orders", "o_orderdate"), ("lineitem", "l_shipdate")]:
        df = load_table(spark, "/root/testdata/sf0.001", table)
        assert dict(df.dtypes)[col] == "timestamp", (table, col)


def test_floor_to_accepts_raw_ntz_column(spark):
    # LTZ-only unix_timestamp inside floor_to must tolerate an
    # un-canonicalized NTZ column (library callers may skip load_table)
    df = spark.createDataFrame(
        [(dt.datetime(2024, 1, 1, 0, 0, 7),)], "t timestamp_ntz"
    )
    out = df.select(floor_to("t", 5).alias("b")).collect()[0]["b"]
    assert out == dt.datetime(2024, 1, 1, 0, 0, 5)
