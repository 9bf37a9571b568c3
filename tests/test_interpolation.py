"""Planted-gap tests for W2 grid interpolation and W3 coverage trim
(the oracle harness separately checks events_interpolate_1h against the
DuckDB window-algebra twin)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row

from bda_spark.operators.interpolation import grid_interpolate, trim_to_valid


def _ts(sec):
    return dt.datetime(2024, 1, 1, 0, 0, 0) + dt.timedelta(seconds=sec)


def test_linear_blend_across_gap(spark):
    # observations at t=0 (v=10) and t=30 (v=40) on a 10s grid:
    # grid cells 0,10,20,30 -> 10, 20, 30, 40
    df = spark.createDataFrame(
        [Row(k="a", ts=_ts(0), v=10.0), Row(k="a", ts=_ts(30), v=40.0)]
    )
    out = {
        r.grid_ts.second: (r.value, r.is_interpolated)
        for r in grid_interpolate(df, "k", "ts", "v", 10).collect()
    }
    assert out == {
        0: (10.0, False),
        10: (20.0, True),
        20: (30.0, True),
        30: (40.0, False),
    }


def test_cell_average_and_no_extrapolation(spark):
    # two obs in one cell -> averaged; spine spans observed cells only
    df = spark.createDataFrame(
        [
            Row(k="a", ts=_ts(11), v=1.0),
            Row(k="a", ts=_ts(14), v=3.0),
            Row(k="a", ts=_ts(21), v=5.0),
            Row(k="b", ts=_ts(50), v=7.0),
        ]
    )
    rows = grid_interpolate(df, "k", "ts", "v", 10).collect()
    a = sorted([r for r in rows if r.k == "a"], key=lambda r: r.grid_ts)
    assert [r.value for r in a] == [2.0, 5.0]  # avg(1,3) then 5
    assert [r.grid_ts.second for r in a] == [10, 20]  # no cells before/after
    b = [r for r in rows if r.k == "b"]
    assert len(b) == 1 and b[0].value == 7.0


def test_trim_to_valid_drops_leading_trailing_only(spark):
    df = spark.createDataFrame(
        [
            Row(k="a", t=1, v=None),
            Row(k="a", t=2, v=1.0),
            Row(k="a", t=3, v=None),  # interior null survives
            Row(k="a", t=4, v=2.0),
            Row(k="a", t=5, v=None),
            Row(k="b", t=1, v=9.0),
        ],
        "k string, t int, v double",
    )
    out = trim_to_valid(df, "k", "t", "v").collect()
    assert {(r.k, r.t) for r in out} == {("a", 2), ("a", 3), ("a", 4), ("b", 1)}


def test_interpolation_matches_pandas(spark):
    """SURVEY risk #3's acceptance check: equal to pandas
    resample().interpolate('time') on a sparse series."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(3)
    secs = sorted(rng.choice(np.arange(0, 600, 10), size=12, replace=False))
    vals = rng.standard_normal(12).cumsum()
    pdf = pd.DataFrame(
        {"ts": [_ts(int(s)) for s in secs], "v": vals}
    ).set_index("ts")
    expected = pdf.resample("10s").mean().interpolate("time")
    # trim to observed range (grid_interpolate never extrapolates)
    expected = expected.loc[expected.v.first_valid_index():expected.v.last_valid_index()]

    df = spark.createDataFrame(
        [
            Row(k="s", ts=t.to_pydatetime(), v=float(v))
            for t, v in zip(pdf.index, pdf.v)
        ]
    )
    got = {
        r.grid_ts: r.value
        for r in grid_interpolate(df, "k", "ts", "v", 10).collect()
    }
    assert len(got) == len(expected)
    for ts_, want in expected.v.items():
        assert got[ts_.to_pydatetime()] == pytest.approx(want, abs=1e-9)


def test_all_null_cells_become_gaps_not_observations(spark):
    """A grid cell whose measurements are all null is a GAP: interior
    ones interpolate between real neighbors, and leading/trailing ones
    don't extend the spine — no null output values, ever."""
    import datetime as dt

    from pyspark.sql import Row

    from bda_spark.operators.interpolation import grid_interpolate

    t0 = dt.datetime(2024, 1, 1)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        Row(k="a", ts=ts(0), v=None),     # leading null cell: no spine growth
        Row(k="a", ts=ts(1), v=10.0),
        Row(k="a", ts=ts(2), v=None),     # interior all-null cell: a gap
        Row(k="a", ts=ts(3), v=30.0),
        Row(k="a", ts=ts(4), v=None),     # trailing null cell
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = grid_interpolate(df, "k", "ts", "v", grid_seconds=60).collect()
    got = {r["grid_ts"]: (r["value"], r["is_interpolated"]) for r in out}
    assert set(got) == {ts(1), ts(2), ts(3)}  # spine = observed cells only
    assert got[ts(1)] == (10.0, False)
    assert got[ts(3)] == (30.0, False)
    assert got[ts(2)][0] == pytest.approx(20.0) and got[ts(2)][1] is True
    assert all(v is not None for v, _i in got.values())
