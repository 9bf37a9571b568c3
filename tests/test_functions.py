"""Unit tests for the functions/ library — every helper the registered
queries don't route through directly gets exercised here, on crafted
rows with hand-computed expectations."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bda_spark.functions.cleaning import drop_sentinels, repair_sentinel_price
from bda_spark.functions.stats import pearson, rmse
from bda_spark.functions.timeutils import (
    event_time_from_millis,
    floor_to,
    time_bucket,
)


@pytest.fixture(scope="module")
def ticks(spark):
    return spark.createDataFrame(
        [
            Row(symbol="BP", price=10.0, bid=9.0, ask=11.0, volume=100.0),
            Row(symbol="BP", price=-1.0, bid=20.0, ask=22.0, volume=-1.0),
            Row(symbol="XOM", price=30.0, bid=29.0, ask=31.0, volume=300.0),
        ]
    )


def test_repair_sentinel_price_uses_midpoint(spark, ticks):
    out = ticks.select("symbol", repair_sentinel_price().alias("price")).collect()
    assert {(r.symbol, r.price) for r in out} == {
        ("BP", 10.0),
        ("BP", 21.0),  # sentinel -> (20+22)/2
        ("XOM", 30.0),
    }


def test_drop_sentinels_filters_any_sentinel_column(spark, ticks):
    out = drop_sentinels(ticks, ["price", "volume"]).collect()
    assert {r.symbol for r in out} == {"BP", "XOM"}
    assert len(out) == 2  # the sentinel row is gone
    assert drop_sentinels(ticks, []).count() == 3  # no cols -> no-op


def test_event_time_from_millis_is_exact(spark):
    df = spark.createDataFrame(
        [Row(timestamp=1704067200123), Row(timestamp=1704067200999)]
    )
    out = df.select(event_time_from_millis("timestamp").alias("et")).collect()
    assert out[0].et == dt.datetime(2024, 1, 1, 0, 0, 0, 123000)
    assert out[1].et == dt.datetime(2024, 1, 1, 0, 0, 0, 999000)


def test_time_bucket_and_floor_to_agree_on_grid_start(spark):
    df = spark.createDataFrame(
        [Row(ts=dt.datetime(2024, 1, 1, 0, 0, s)) for s in (0, 3, 7, 59)]
    )
    out = df.select(
        time_bucket("ts", "5 seconds").alias("w"), floor_to("ts", 5).alias("f")
    ).collect()
    for r in out:
        assert r.w.start == r.f
    assert {r.f.second for r in out} == {0, 5, 55}


def test_pearson_matches_closed_form(spark):
    # y = 2x + noise-free -> corr exactly 1; grouped form too
    rows = [Row(g="a", x=float(i), y=2.0 * i) for i in range(10)]
    rows += [Row(g="b", x=float(i), y=-3.0 * i + 7) for i in range(10)]
    df = spark.createDataFrame(rows)
    import numpy as np

    xs = np.array([r.x for r in rows])
    ys = np.array([r.y for r in rows])
    expected = float(np.corrcoef(xs, ys)[0, 1])
    assert pearson(df, "x", "y").collect()[0].correlation == pytest.approx(
        expected, abs=1e-9
    )
    grouped = {r.g: r.correlation for r in pearson(df, "x", "y", by=["g"]).collect()}
    assert grouped["a"] == pytest.approx(1.0)
    assert grouped["b"] == pytest.approx(-1.0)


def test_rmse_closed_form(spark):
    df = spark.createDataFrame(
        [Row(prediction=1.0, label=2.0), Row(prediction=4.0, label=2.0)]
    )
    # sqrt((1 + 4) / 2)
    assert rmse(df).collect()[0].rmse == pytest.approx(math.sqrt(2.5))


def test_validate_ticks_each_constraint(spark):
    """D8: one violating row per producer constraint, one clean row."""
    from bda_spark.functions.cleaning import validate_ticks

    good = dict(
        symbol="BP",
        timestamp=1704067200123,
        source="YLIFE_FEED",
        data_type="MARKET_DATA",
        market_sentiment=0.5,
        trading_activity=55.0,
    )
    bad = [
        {**good, "symbol": None},
        {**good, "timestamp": None},
        {**good, "source": "UNKNOWN_FEED"},
        {**good, "data_type": "HEARTBEAT"},
        {**good, "market_sentiment": 1.5},
        {**good, "trading_activity": 250.0},
        {**good, "timestamp": 99999999999999},  # far future
    ]
    sentinel_ok = {**good, "market_sentiment": -1.0, "trading_activity": -1.0}
    df = spark.createDataFrame([Row(**good), Row(**sentinel_ok)] + [Row(**b) for b in bad])
    kept = validate_ticks(df).collect()
    assert len(kept) == 2


def test_language_id_discriminates_real_sentences(spark):
    from bda_spark.functions.text import language_id_col

    rows = [
        ("en", "the cat sat on the mat and it was happy to be in the sun"),
        ("de", "der hund ist nicht mit der katze und das ist ein problem"),
        ("es", "el perro y el gato en la casa es un animal que come"),
        ("fr", "le chien est dans la maison et les chats pour une heure"),
        ("und", "xyzzy plugh quux"),
    ]
    df = spark.createDataFrame(rows, "expected string, text string")
    out = df.select("expected", language_id_col("text").alias("got")).collect()
    for r in out:
        assert r.got == r.expected, f"{r.expected}: got {r.got}"


def test_canonicalize_text_col_equivalence_classes(spark):
    """Dedup normalization: case / punctuation / whitespace variants
    collapse to one canonical form; Unicode letters and digits
    survive; distinct content stays distinct."""
    from bda_spark.functions.text import canonicalize_text_col

    rows = [
        (1, "Hello,  World!"),
        (2, "hello world"),
        (3, "HELLO ... world\t\n"),
        (4, "héllo wörld"),  # accented letters are LETTERS, kept
        (5, "hello world 42"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        r["id"]: r["c"]
        for r in df.select(
            "id", canonicalize_text_col("text").alias("c")
        ).collect()
    }
    assert got[1] == got[2] == got[3] == "hello world"
    assert got[4] == "héllo wörld"
    assert got[5] == "hello world 42"


def test_nfc_normalization_folds_decomposed_forms(spark):
    """Composed (U+00E9) and decomposed (e + U+0301) spellings of the
    same text must fingerprint identically after the NFC fold, and
    differently without it."""
    from pyspark.sql import functions as SF

    from bda_spark.functions.text import canonicalize_text_col, nfc_normalize_udf

    composed = "caf\u00e9 opening"  # \u00e9 as one codepoint
    decomposed = "cafe\u0301 opening"  # e + combining acute
    df = spark.createDataFrame(
        [(1, composed), (2, decomposed)], "id long, text string"
    )
    raw = {
        r["id"]: r["m"]
        for r in df.select(
            "id", SF.md5(canonicalize_text_col("text")).alias("m")
        ).collect()
    }
    assert raw[1] != raw[2]  # byte-different without the fold
    nfc = nfc_normalize_udf()
    folded = {
        r["id"]: r["m"]
        for r in df.select(
            "id", SF.md5(canonicalize_text_col(nfc(SF.col("text")))).alias("m")
        ).collect()
    }
    assert folded[1] == folded[2]


def test_avg_ranks_and_spearman_match_scipy_convention(spark):
    """Tie-adjusted average ranks on a continuous column with planted
    ties, against hand-computed scipy-style rankdata expectations."""
    import numpy as np

    from bda_spark.functions.stats import avg_ranks, spearman

    rng = np.random.default_rng(5)
    xs = list(rng.standard_normal(200)) + [0.5, 0.5, 0.5]  # planted ties
    ys = [2 * x + float(e) for x, e in zip(xs, rng.standard_normal(203) * 0.1)]
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )

    def rankdata(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j < len(order) and vals[order[j]] == vals[order[i]]:
                j += 1
            avg = (i + j + 1) / 2.0  # mean of 1-based positions i+1..j
            for k in order[i:j]:
                ranks[k] = avg
            i = j
        return ranks

    got = {r.x: r.avg_rank for r in avg_ranks(df, "x", num_ranges=8).collect()}
    want = dict(zip(xs, rankdata(xs)))
    assert len(got) == len(set(xs))
    for v, rk in want.items():
        assert got[v] == pytest.approx(rk), f"value {v}"

    rx, ry = rankdata(xs), rankdata(ys)
    mx, my = sum(rx) / len(rx), sum(ry) / len(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    den = (sum((a - mx) ** 2 for a in rx) * sum((b - my) ** 2 for b in ry)) ** 0.5
    expected = num / den
    assert spearman(df, "x", "y").collect()[0].spearman == pytest.approx(
        expected, abs=1e-9
    )


def test_spearman_approx_tolerance_and_exact_regimes(spark):
    """The binned-rank sketch twin: within 0.02 of exact Spearman on a
    continuous column, EXACTLY equal when both columns' distinct
    values fit inside the bins (each value gets its own tie group),
    and the plan never sorts the raw columns (only <= num_bins-row
    marginal frames)."""
    import re

    import numpy as np

    from bda_spark.functions.stats import spearman, spearman_approx

    rng = np.random.default_rng(11)
    xs = rng.standard_normal(3000)
    ys = 0.7 * xs + rng.standard_normal(3000) * 0.8  # mid-strength corr
    df = spark.createDataFrame(
        [(float(x), float(y)) for x, y in zip(xs, ys)], "x double, y double"
    )
    exact = spearman(df, "x", "y").collect()[0]["spearman"]
    approx = spearman_approx(df, "x", "y", num_bins=256).collect()[0]["spearman"]
    assert abs(approx - exact) <= 0.02, (approx, exact)

    # discrete regime: 20 distinct values << 256 bins -> identical
    dx = [float(i % 20) for i in range(1000)]
    dy = [float((i * 7) % 20) for i in range(1000)]
    dd = spark.createDataFrame(list(zip(dx, dy)), "x double, y double")
    e2 = spearman(dd, "x", "y").collect()[0]["spearman"]
    a2 = spearman_approx(dd, "x", "y", num_bins=256).collect()[0]["spearman"]
    assert a2 == pytest.approx(e2, abs=1e-12)

    # plan audit: no Sort node over the raw x/y columns anywhere — the
    # only sorts run on the bounded _bx/_by marginal frames.
    # materialize=False keeps the plan lazy end to end: with the
    # default checkpoint the explained plan starts at Scan ExistingRDD
    # and the corpus-side binning stage would never be audited at all
    plan = (
        spearman_approx(df, "x", "y", num_bins=64, materialize=False)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "extended"
            )
        )
    )
    for m in re.finditer(r"Sort \[([^\]]*)\]", plan):
        keys = m.group(1)
        cols = re.findall(r"([A-Za-z_][A-Za-z_0-9]*)#\d+", keys)
        assert "x" not in cols and "y" not in cols, keys
