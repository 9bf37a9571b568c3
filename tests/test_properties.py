"""Property-based tests (hypothesis) for the primitives whose
correctness depends on subtle cross-engine/tie/edge semantics: the
Rabin-Karp fingerprint, tie-adjusted average ranks, and stopword
scores, each against a pure-Python reference implementation."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_RH_MOD = (1 << 31) - 1


def _py_rolling(text: str) -> int:
    h = 0
    first = True
    for ch in text:
        code = ord(ch)
        h = code if first else (h * 31 + code) % _RH_MOD
        first = False
    return h


ascii_text = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), min_size=1, max_size=80
)


@settings(**SETTINGS)
@given(texts=st.lists(ascii_text, min_size=1, max_size=8))
def test_rolling_fingerprint_matches_python(spark, texts):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(texts)], "i int, text string")
    chars = F.filter(F.split("text", ""), lambda x: x != "")
    rh = F.aggregate(
        chars, F.lit(0).cast("long"), lambda acc, x: (acc * 31 + F.ascii(x)) % _RH_MOD
    )
    got = {r.i: r.h for r in df.select("i", rh.alias("h")).collect()}
    for i, s in enumerate(texts):
        assert got[i] == _py_rolling(s), repr(s)


def _py_rankdata(vals):
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j < len(order) and vals[order[j]] == vals[order[i]]:
            j += 1
        for k in order[i:j]:
            ranks[k] = (i + j + 1) / 2.0
        i = j
    return ranks


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.integers(min_value=-5, max_value=5),  # narrow domain -> heavy ties
        min_size=2,
        max_size=40,
    )
)
def test_avg_ranks_matches_rankdata(spark, vals):
    from bda_spark.functions.stats import avg_ranks

    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = {r.x: r.avg_rank for r in avg_ranks(df, "x", num_ranges=4).collect()}
    want = dict(zip((float(v) for v in vals), _py_rankdata(vals)))
    assert got == pytest.approx(want)


words = st.text(alphabet="abcdef", min_size=1, max_size=5)


@settings(**SETTINGS)
@given(
    stream=st.lists(
        st.sampled_from(["a", "b", "c", "d", "e", "f", "g", "h"]),
        min_size=1,
        max_size=120,
    ),
    counters=st.integers(min_value=2, max_value=6),
)
def test_frequent_items_bounds_hold_for_any_stream(spark, stream, counters):
    """Misra-Gries invariants under arbitrary streams and budgets:
    est <= true <= est + err for EVERY item (reported or not), and any
    item heavier than the error bound is guaranteed reported."""
    from collections import Counter

    from bda_spark.operators.sketch import frequent_items

    df = spark.createDataFrame([(w,) for w in stream], "word string").repartition(3)
    got = frequent_items(df, "word", k=100, counters=counters).collect()
    exact = Counter(stream)
    err = got[0]["max_count"] - got[0]["est_count"] if got else 0
    by_item = {r["item"]: r["est_count"] for r in got}
    for item, true_n in exact.items():
        est = by_item.get(item, 0)
        assert est <= true_n <= est + err, (item, est, true_n, err)
        if true_n > err:
            assert item in by_item, (item, true_n, err)


@settings(**SETTINGS)
@given(
    tokens=st.lists(words, min_size=1, max_size=30),
    vocab=st.lists(words, min_size=1, max_size=5, unique=True),
)
def test_language_score_counts_occurrences(spark, tokens, vocab):
    from bda_spark.functions.text import language_score_col

    text = " ".join(tokens)
    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(language_score_col("text", vocab).alias("n")).collect()[0].n
    assert got == sum(1 for tk in tokens if tk in vocab)
