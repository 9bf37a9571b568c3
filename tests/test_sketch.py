"""Blocked Bloom filter (operators/sketch.py): membership guarantees,
prefilter-equivalence, and the broadcast-probe plan shape."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from bda_spark.operators.sketch import (
    blocked_bloom_bitmap,
    blocked_bloom_probe,
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
