"""SCD Type-2 maintenance (operators/scd.py): version chains,
idempotent redelivery, intra-batch collapse, and the as-of join over
the maintained intervals."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from bda_spark.operators.scd import scd2_apply, scd2_init

KEY, TRACKED, EFF = "cust", ["tier", "region"], "eff_ts"


def _t(day):
    return dt.datetime(2024, 1, day)


def _updates(spark, rows):
    return spark.createDataFrame(
        rows, "cust string, tier string, region string, eff_ts timestamp"
    )


def _state(dim):
    return {
        (r["cust"], r["tier"], r["region"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in dim.collect()
    }


def test_version_chains_close_and_open(spark):
    d0 = scd2_init(
        _updates(spark, [("a", "gold", "eu", _t(1)), ("b", "silver", "us", _t(1))]),
        KEY, TRACKED, EFF,
    )
    # day 5: a changes tier; b unchanged; c appears
    d1 = scd2_apply(
        d0,
        _updates(
            spark,
            [
                ("a", "plat", "eu", _t(5)),
                ("b", "silver", "us", _t(5)),
                ("c", "gold", "ap", _t(5)),
            ],
        ),
        KEY, TRACKED, EFF,
    )
    assert _state(d1) == {
        ("a", "gold", "eu", _t(1), _t(5), False),
        ("a", "plat", "eu", _t(5), None, True),
        ("b", "silver", "us", _t(1), None, True),
        ("c", "gold", "ap", _t(5), None, True),
    }
    # exactly one current row per key; ranges contiguous
    cur = d1.filter("is_current").groupBy(KEY).count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_idempotent_redelivery_is_a_noop(spark):
    d0 = scd2_init(_updates(spark, [("a", "gold", "eu", _t(1))]), KEY, TRACKED, EFF)
    batch = _updates(spark, [("a", "plat", "eu", _t(5))])
    d1 = scd2_apply(d0, batch, KEY, TRACKED, EFF)
    d2 = scd2_apply(d1, batch, KEY, TRACKED, EFF)  # redelivered batch
    assert _state(d1) == _state(d2)


def test_intra_batch_states_collapse_to_latest(spark):
    d0 = scd2_init(_updates(spark, [("a", "gold", "eu", _t(1))]), KEY, TRACKED, EFF)
    d1 = scd2_apply(
        d0,
        _updates(
            spark,
            [("a", "silver", "eu", _t(3)), ("a", "plat", "eu", _t(7))],
        ),
        KEY, TRACKED, EFF,
    )
    assert _state(d1) == {
        ("a", "gold", "eu", _t(1), _t(7), False),  # closed at the LATEST eff
        ("a", "plat", "eu", _t(7), None, True),
    }


def test_asof_join_over_maintained_intervals(spark):
    """The payoff: facts join 'the dimension as of the fact time' via
    the bucketed interval_join over [valid_from, valid_to)."""
    from bda_spark.operators.intervals import interval_join

    d0 = scd2_init(_updates(spark, [("a", "gold", "eu", _t(1))]), KEY, TRACKED, EFF)
    d1 = scd2_apply(
        d0, _updates(spark, [("a", "plat", "eu", _t(5))]), KEY, TRACKED, EFF
    )
    # close open intervals at a far horizon for the join
    horizon = F.lit(dt.datetime(2025, 1, 1))
    versioned = d1.withColumn("valid_to", F.coalesce("valid_to", horizon))
    facts = spark.createDataFrame(
        [("f1", "a", _t(2)), ("f2", "a", _t(5)), ("f3", "a", _t(9))],
        "fact string, cust string, ts timestamp",
    )
    got = {
        (r["fact"], r["tier"])
        for r in interval_join(
            facts, versioned,
            point_ts="ts", start="valid_from", end="valid_to",
            keys=["cust"], bucket_seconds=86400,
        ).collect()
    }
    assert got == {("f1", "gold"), ("f2", "plat"), ("f3", "plat")}


def test_stale_update_is_dropped_not_inverted(spark):
    """An update strictly older than the open version must not close it
    with valid_to < valid_from — it is a no-op."""
    d0 = scd2_init(
        _updates(spark, [("a", "gold", "eu", _t(10))]), KEY, TRACKED, EFF
    )
    d1 = scd2_apply(
        d0,
        _updates(spark, [("a", "plat", "eu", _t(3))]),  # older than valid_from
        KEY, TRACKED, EFF,
    )
    assert _state(d1) == {("a", "gold", "eu", _t(10), None, True)}
    # no inverted interval anywhere, ever
    assert d1.filter("valid_to < valid_from").count() == 0


def test_empty_tracked_raises(spark):
    import pytest

    up = _updates(spark, [("a", "gold", "eu", _t(1))])
    with pytest.raises(ValueError, match="tracked"):
        scd2_init(up, KEY, [], EFF)
    d0 = scd2_init(up, KEY, TRACKED, EFF)
    with pytest.raises(ValueError, match="tracked"):
        scd2_apply(d0, up, KEY, [], EFF)
