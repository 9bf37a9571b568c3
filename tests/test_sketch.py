"""Sketch operators (operators/sketch.py): blocked Bloom filter
membership guarantees, prefilter-equivalence, broadcast-probe plan
shape; Misra-Gries frequent-items accuracy and error bounds."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bda_spark.operators.sketch import (
    blocked_bloom_bitmap,
    blocked_bloom_probe,
    frequent_items,
)
from bda_spark.plans.datamix import contamination_hits, contamination_hits_bloom

SF_DIR = "/root/testdata/sf0.001"


def _ref_and_probes(spark):
    ref = spark.range(0, 500).select(
        F.concat(F.lit("member_"), F.col("id")).alias("key")
    )
    probes = spark.range(0, 4000).select(
        F.when(F.col("id") < 500, F.concat(F.lit("member_"), F.col("id")))
        .otherwise(F.concat(F.lit("outsider_"), F.col("id")))
        .alias("key")
    )
    return ref, probes


def test_no_false_negatives(spark):
    """Every true member must survive the probe — the property that
    makes the filter safe as an exact-join prefilter."""
    ref, _ = _ref_and_probes(spark)
    bitmap = blocked_bloom_bitmap(ref, "key")
    kept = blocked_bloom_probe(ref, "key", bitmap).count()
    assert kept == 500


def test_false_positive_rate_is_small(spark):
    """At ~500 items in 64Ki words (load << 1), non-members should
    essentially never pass; allow a loose 1% margin."""
    ref, probes = _ref_and_probes(spark)
    bitmap = blocked_bloom_bitmap(ref, "key")
    kept = blocked_bloom_probe(probes, "key", bitmap)
    outsiders_kept = kept.filter(F.col("key").startswith("outsider_")).count()
    assert outsiders_kept <= 35  # 1% of 3500
    # and all 500 members are among the kept rows
    assert kept.filter(F.col("key").startswith("member_")).count() == 500


def test_bitmap_is_bounded_by_m_words(spark):
    ref, _ = _ref_and_probes(spark)
    bitmap = blocked_bloom_bitmap(ref, "key", m_words=64, k=3)
    assert bitmap.count() <= 64
    # tiny bitmap -> high load -> probes still have zero false negatives
    kept = blocked_bloom_probe(ref, "key", bitmap, m_words=64, k=3).count()
    assert kept == 500


def test_bloom_prefilter_equals_exact_decontamination(spark):
    """contamination_hits_bloom must return byte-identical rows to the
    exact contamination_hits — false positives die in the verify join,
    false negatives cannot exist."""
    from bda_spark.sources.batch import load_table

    docs = load_table(spark, SF_DIR, "documents")
    train = docs.filter(F.col("doc_id") % 7 != 0)
    bench = docs.filter(F.col("doc_id") % 7 == 0)
    exact = {
        (r["doc_id"], r["n_hit_grams"])
        for r in contamination_hits(train, bench, broadcast_benchmark=False).collect()
    }
    bloom = {
        (r["doc_id"], r["n_hit_grams"])
        for r in contamination_hits_bloom(train, bench).collect()
    }
    assert bloom == exact and exact, "prefiltered result diverged from exact"


# --- Misra-Gries frequent items -----------------------------------------


def _zipf_words(spark):
    """Skewed stream: word_i appears ~3000/(i+1) times, 60 distinct."""
    return spark.range(0, 3000).select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(59)),
                lambda i: F.when(
                    F.col("id") * (i + 1) < 3000, F.concat(F.lit("w"), i)
                ),
            )
        ).alias("word")
    ).filter(F.col("word").isNotNull()).repartition(8)


def _exact_counts(df):
    return {
        r["word"]: r["n"]
        for r in df.groupBy("word").agg(F.count("*").alias("n")).collect()
    }


def test_frequent_items_exact_when_counters_cover_vocab(spark):
    """counters >= distinct count -> no compaction -> exact counts,
    zero error bound (est == max), and the true top-k."""
    words = _zipf_words(spark)
    exact = _exact_counts(words)
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    got = frequent_items(
        words, "word", k=10, counters=256, include_bound_row=True
    ).collect()
    items = [r for r in got if r["item"] is not None]
    assert [(r["item"], r["est_count"]) for r in items] == top
    assert all(r["est_count"] == r["max_count"] for r in items)
    # exact regime: the bound row reports zero error
    (bound,) = [r for r in got if r["item"] is None]
    assert bound["max_count"] == 0


def test_frequent_items_bounds_hold_under_heavy_compaction(spark):
    """Tiny budget (8 counters for 60 distinct): for EVERY item,
    est <= true <= est + err where err = max_count - est_count, and
    the undercount stays within the n/(counters+1) MG guarantee."""
    words = _zipf_words(spark)
    exact = _exact_counts(words)
    n = sum(exact.values())
    got = frequent_items(
        words, "word", k=60, counters=8, include_bound_row=True
    ).collect()
    (bound,) = [r for r in got if r["item"] is None]
    err = bound["max_count"]
    assert 0 < err <= n  # lossy regime actually engaged
    by_item = {r["item"]: r["est_count"] for r in got if r["item"] is not None}
    for item, true_n in exact.items():
        est = by_item.get(item, 0)
        assert est <= true_n <= est + err, (item, est, true_n, err)
    # every item heavier than the global bound is guaranteed surfaced
    for item, true_n in exact.items():
        if true_n > err:
            assert item in by_item, (item, true_n, err)


def test_frequent_items_shuffle_is_bounded_by_counters(spark):
    """The scale contract: whatever the input cardinality, the rows
    crossing the shuffle are per-partition summaries — at most
    counters+1 per input partition, not the vocabulary — and the final
    aggregation sits downstream of the Python map stage in the plan."""
    words = _zipf_words(spark)
    n_parts = words.rdd.getNumPartitions()
    counters = 8
    df = frequent_items(words, "word", k=1000, counters=counters)
    # survivors are capped by the summary budget, not distinct count
    # (+1: the global bound row)
    assert df.count() <= (counters + 1) * n_parts + 1
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the arrow-batched python summary stage is in the plan (not a
    # row-at-a-time UDF), and the only sort is the final tiny top-k
    assert "MapInPandas" in plan, plan
    assert "BatchEvalPython" not in plan, plan


# --- HLL distinct sketch tables -----------------------------------------


def test_distinct_sketch_union_tracks_exact_within_rsd(spark):
    """10k true distinct across 7 daily parts: the union-of-parts
    estimate and the direct whole-data estimate must both land within
    the lgk=12 error envelope (~1.6% rsd; 3% asserted), and within 1%
    of each other (register union is lossless; only sparse/dense
    transition points differ)."""
    from bda_spark.operators.sketch import distinct_estimate, distinct_sketch_table

    df = spark.range(0, 10_000).select(
        F.col("id"), (F.col("id") % 7).alias("day")
    )
    daily = distinct_sketch_table(df, ["day"], "id")
    assert daily.count() == 7
    union_est = distinct_estimate(daily).collect()[0]["approx_distinct"]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("id", F.lit(12))).alias("d")
    ).collect()[0]["d"]
    assert abs(union_est - 10_000) <= 300, union_est
    assert abs(direct - 10_000) <= 300, direct
    assert abs(union_est - direct) <= 100, (union_est, direct)


def test_distinct_sketch_table_survives_parquet_roundtrip(spark, tmp_path):
    """The incremental pattern end-to-end: land the sketch table as
    parquet (binary column), read it back COLD, union a subset of days
    — the range query never touches raw rows and never double-counts
    overlapping re-unions."""
    from bda_spark.operators.sketch import distinct_estimate, distinct_sketch_table

    df = spark.range(0, 1_000).select(
        F.col("id"), (F.col("id") % 5).alias("day")
    )
    path = str(tmp_path / "sketches")
    distinct_sketch_table(df, ["day"], "id").write.parquet(path)
    persisted = spark.read.parquet(path)
    # full-range union over the persisted table
    full = distinct_estimate(persisted).collect()[0]["approx_distinct"]
    assert abs(full - 1_000) <= 40, full
    # no double-counting: unioning the same days twice stays at ~n
    # (register max, not addition). Not bit-identical — datasketches
    # promotes sparse->dense at different points with 10 vs 5 inputs —
    # but far from 2n, which is the property that matters.
    doubled = distinct_estimate(persisted.union(persisted)).collect()[0][
        "approx_distinct"
    ]
    assert abs(doubled - full) <= 0.02 * full, (doubled, full)
    # small-cardinality regime: 2 of 5 days hold 400 distinct ids —
    # near-exact (sparse coupons), but NOT guaranteed bit-exact (±1
    # observed), which is exactly why the registry row carries no
    # SQL-equality oracle
    two_days = distinct_estimate(
        persisted.filter(F.col("day") < 2)
    ).collect()[0]["approx_distinct"]
    assert abs(two_days - 400) <= 4, two_days


def test_distinct_sketch_rollup_query_tracks_exact(spark):
    """The registered rows-only query vs the exact per-type distinct
    count on the same data: within the lgk=12 envelope everywhere, and
    dead-on at this fixture's tiny per-type cardinality."""
    from bda_spark.plans import get_queries
    from bda_spark.sources.batch import load_table

    got = {
        r["event_type"]: r["n_users"]
        for r in get_queries()["events_distinct_sketch_rollup"](
            spark, SF_DIR
        ).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(got) == set(exact)
    for k, n in exact.items():
        assert abs(got[k] - n) <= max(1, int(0.03 * n)), (k, got[k], n)


def test_probe_broadcasts_bitmap_never_shuffles_probes(spark):
    """The probe-side scale contract: the bitmap arrives by broadcast
    and no Exchange sits between the probe scan and the bloom join."""
    ref, probes = _ref_and_probes(spark)
    bitmap = blocked_bloom_bitmap(ref, "key")
    df = blocked_bloom_probe(probes, "key", bitmap)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan, plan
    # the only shuffle Exchange is the bitmap's own bit_or aggregation
    exchanges = re.findall(r"\n\(\d+\) (\w*Exchange)\b", plan)
    assert len([e for e in exchanges if e == "Exchange"]) == 1, plan


def test_histogram_sketch_table_incremental_quantiles(spark, tmp_path):
    """The incremental-percentile pattern: per-day histogram rows on
    shared global bounds, merged to answer quantiles over any range
    without rescanning raw data. Pinned: (a) merged-estimate rank
    accuracy within bin resolution, (b) exact additivity — two halves
    merged == whole, (c) parquet round trip."""
    from bda_spark.operators.sketch import (
        histogram_bounds,
        histogram_sketch_table,
        quantile_estimate,
    )
    from bda_spark.sources.batch import load_table

    events = load_table(spark, SF_DIR, "events").withColumn(
        "day", F.to_date("ts")
    )
    bounds = histogram_bounds(events, "value", num_bins=128)
    daily = histogram_sketch_table(events, ["day"], "value", bounds)
    path = str(tmp_path / "hist_sketches")
    daily.write.parquet(path)
    sketches = spark.read.parquet(path)
    assert sketches.count() == events.select("day").distinct().count()

    probs = [0.25, 0.5, 0.75]
    est = quantile_estimate(sketches, bounds, probs).collect()[0]
    n = events.count()
    for p in probs:
        q = est[f"q_{str(p).replace('.', '_')}"]
        rank = events.filter(F.col("value") <= q).count() / n
        assert p - 0.001 <= rank <= p + 2.5 / 128, (p, q, rank)

    # additivity: merging the two halves == merging everything
    days = sorted(r["day"] for r in sketches.select("day").collect())
    cut = days[len(days) // 2]
    first = sketches.filter(F.col("day") <= F.lit(cut))
    second = sketches.filter(F.col("day") > F.lit(cut))
    whole = quantile_estimate(sketches, bounds, [0.5]).collect()[0]["q_0_5"]
    merged_halves = quantile_estimate(
        first.unionByName(second), bounds, [0.5]
    ).collect()[0]["q_0_5"]
    assert merged_halves == whole

    # grouped rollup: one estimate per event_type from the same table
    typed = histogram_sketch_table(
        events, ["day", "event_type"], "value", bounds
    )
    per_type = quantile_estimate(
        typed, bounds, [0.5], group=["event_type"]
    )
    rows = per_type.collect()
    assert len(rows) == events.select("event_type").distinct().count()
    assert all(r["q_0_5"] is not None for r in rows)


# ---------------------------------------------------------------------------
# Count-Min sketch (operators/sketch.py::cms_*)


def _cms_fixture(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(50)]
    # Zipf-ish: w0 heaviest
    rows = [(vocab[min(int(rng.expovariate(0.12)), 49)],) for _ in range(4000)]
    return spark.createDataFrame(rows, "item string")


def test_cms_estimates_exact_on_small_vocab_and_never_undercount(spark):
    from bda_spark.operators.sketch import cms_estimate, cms_sketch_table

    df = _cms_fixture(spark)
    sketch = cms_sketch_table(df, "item", depth=4, width=4096)
    truth = {
        r["item"]: r["n"]
        for r in df.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    items = spark.createDataFrame([(w,) for w in truth], "item string")
    est = {
        r["item"]: r["est_count"]
        for r in cms_estimate(sketch, items, "item", depth=4, width=4096).collect()
    }
    # one-sided error always; with 50 items in 4x4096 counters at least
    # one row is collision-free per item, so the min is EXACT here
    # (deterministic hashing: if this passes once it always passes)
    assert all(est[w] >= truth[w] for w in truth)
    assert est == truth
    # an item never seen estimates 0 unless every row collides (it
    # cannot under this occupancy)
    ghost = cms_estimate(
        sketch,
        spark.createDataFrame([("never-seen",)], "item string"),
        "item",
        depth=4,
        width=4096,
    ).collect()[0]["est_count"]
    assert ghost == 0


def test_cms_merge_equals_whole_and_is_reaggregable(spark):
    from bda_spark.operators.sketch import (
        cms_estimate,
        cms_merge,
        cms_sketch_table,
    )

    df = _cms_fixture(spark).withColumn(
        "day", (F.length("item") + F.monotonically_increasing_id() % 3).cast("int")
    )
    whole = cms_sketch_table(df, "item", depth=4, width=1024)
    per_day = cms_sketch_table(df, "item", depth=4, width=1024, keys=["day"])
    merged = cms_merge(per_day.drop("day"))
    a = {(r["j"], r["idx"]): r["cnt"] for r in whole.collect()}
    b = {(r["j"], r["idx"]): r["cnt"] for r in merged.collect()}
    # counter-wise addition over per-day sketches IS the whole-table
    # sketch, bit for bit — the incremental/date-range contract
    assert a == b
    items = spark.createDataFrame([("w0",), ("w1",)], "item string")
    ea = cms_estimate(whole, items, "item", depth=4, width=1024).collect()
    eb = cms_estimate(merged, items, "item", depth=4, width=1024).collect()
    assert sorted(map(tuple, ea)) == sorted(map(tuple, eb))


def test_cms_sketch_size_is_bounded_by_depth_width_not_cardinality(spark):
    from bda_spark.operators.sketch import cms_sketch_table

    big = spark.range(0, 20000).select(
        F.concat(F.lit("k"), F.col("id")).alias("item")
    )
    sketch = cms_sketch_table(big, "item", depth=3, width=64)
    assert sketch.count() <= 3 * 64


def test_cms_estimate_on_keyed_sketch_sums_before_min(spark):
    from bda_spark.operators.sketch import cms_estimate, cms_sketch_table

    df = spark.createDataFrame(
        [("w", 1)] * 5 + [("w", 2)] * 7, "item string, day int"
    )
    keyed = cms_sketch_table(df, "item", depth=4, width=256, keys=["day"])
    est = cms_estimate(
        keyed.drop("day"), df.select("item").distinct(), "item",
        depth=4, width=256,
    ).collect()[0]["est_count"]
    # the per-day rows must re-aggregate before the min — a per-row min
    # would report <= 5 against a true total of 12 (an undercount a
    # one-sided sketch must never produce)
    assert est == 12
