"""Bucketed interval join (operators/intervals.py): containment
semantics at boundaries, multi-bucket spans, overlapping intervals,
degenerate intervals, and the no-nested-loop plan shape."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bda_spark.operators.intervals import interval_join


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def _points(spark):
    rows = [
        (1, "u1", _ts(0, 0)),              # == start: IN
        (2, "u1", _ts(1, 30)),             # interior, second bucket: IN
        (3, "u1", _ts(2, 0)),              # == end: OUT (half-open)
        (4, "u1", _ts(1, 59, 59, 999999)), # last microsecond: IN
        (5, "u2", _ts(0, 30)),             # right time, other key: OUT for u1
        (6, "u1", _ts(5, 0)),              # outside any interval
    ]
    return spark.createDataFrame(rows, "pid long, user string, ts timestamp")


def _intervals(spark):
    rows = [
        ("u1", "A", _ts(0), _ts(2)),       # 2h span -> 3 bucket fragments
        ("u1", "B", _ts(1), _ts(3)),       # overlaps A: point 2 hits both
        ("u2", "C", _ts(0), _ts(1)),
        ("u1", "D", _ts(4), _ts(4)),       # degenerate: matches nothing
    ]
    return spark.createDataFrame(
        rows, "user string, iv string, start_ts timestamp, end_ts timestamp"
    )


def _join(spark, closed_end=False):
    return interval_join(
        _points(spark),
        _intervals(spark),
        point_ts="ts",
        start="start_ts",
        end="end_ts",
        keys=["user"],
        bucket_seconds=3600,
        closed_end=closed_end,
    )


def test_half_open_containment_and_overlaps(spark):
    got = {(r["pid"], r["iv"]) for r in _join(spark).collect()}
    assert got == {
        (1, "A"),            # start boundary included
        (2, "A"), (2, "B"),  # overlapping intervals both match
        (4, "A"), (4, "B"),  # last microsecond before A's end; inside B too
        (3, "B"),            # 02:00 excluded from A (end), inside B
        (5, "C"),            # key isolation
    }


def test_closed_end_includes_the_boundary(spark):
    got = {(r["pid"], r["iv"]) for r in _join(spark, closed_end=True).collect()}
    assert (3, "A") in got        # == end now included
    assert (6, "D") not in got    # degenerate interval D matches only pid at 4h? none
    # closed-end also makes D = [4h, 4h] a 1-instant interval; no point sits at 4h
    assert not any(iv == "D" for _, iv in got)


def test_plan_is_equi_join_not_nested_loop(spark):
    plan = _join(spark)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    # the equi pair (keys, bucket) drives a hash-based join
    assert "Join" in plan


def test_fragment_fanout_is_bounded(spark):
    """A 2-hour interval on a 1-hour grid explodes into exactly 3
    fragments (start bucket, middle, end bucket) — the bounded cost
    the docstring promises."""
    iv = _intervals(spark)

    def bucket_of(c):
        return F.floor(F.unix_timestamp(c.cast("timestamp")) / 3600).cast("long")

    # count fragments with the operator's own bucket arithmetic
    frags = (
        iv.filter(F.col("end_ts") > F.col("start_ts"))
        .withColumn(
            "b",
            F.explode(
                F.sequence(
                    bucket_of(F.col("start_ts")),
                    bucket_of(
                        F.col("end_ts") - F.expr("INTERVAL 1 MICROSECOND")
                    ),
                )
            ),
        )
        .groupBy("iv")
        .count()
        .collect()
    )
    by_iv = {r["iv"]: r["count"] for r in frags}
    assert by_iv == {"A": 2, "B": 2, "C": 1}  # [0,2) covers buckets 0,1
