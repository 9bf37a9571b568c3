"""Physical-plan audits (SURVEY §4 scale promises, asserted not
claimed): predicate pushdown reaches the parquet scan, column pruning
shrinks ReadSchema, dimension joins broadcast, aggregation is partial
(map-side) before the shuffle, hot paths stay inside whole-stage
codegen, and no headline plan contains a cartesian product.

These run against the REAL queries at sf0.001 — if a refactor silently
drops a pushdown or de-broadcasts a dim join, this file goes red even
though results stay correct."""

from __future__ import annotations

import os
import re

import pytest

from bda_spark.plans import get_queries

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


def _plan(spark, name: str) -> str:
    df = get_queries()[name](spark, SF_DIR)
    jqe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return jqe.explainString(mode)


def test_filter_pushdown_reaches_parquet_scan(spark):
    plan = _plan(spark, "events_recent_range")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
    assert pushed, "no PushedFilters section in scan node"
    # the ts range and the value predicate must reach the reader
    assert any("value" in l and "5.0" in l for l in pushed), pushed


def test_column_pruning_shrinks_read_schema(spark):
    """events_lead_label touches 4 of events' 6 columns; the scan must
    not read props (the widest column) or event_type."""
    plan = _plan(spark, "events_lead_label")
    schemas = [l for l in plan.splitlines() if "ReadSchema" in l]
    assert schemas
    assert all("props" not in l and "event_type" not in l for l in schemas), schemas


def test_dimension_joins_broadcast(spark):
    """top_customers joins orders (fact) with customer (dim): the dim
    side must broadcast — a shuffle join here becomes the bottleneck at
    1000 executors."""
    plan = _plan(spark, "top_customers")
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


def test_aggregation_is_partial_before_shuffle(spark):
    """groupBy aggregates must run map-side partials (two HashAggregate
    phases) so the shuffle carries one row per (partition, key), not
    one per event."""
    plan = _plan(spark, "events_windowed_10min")
    assert plan.count("HashAggregate") >= 2, plan


def test_hot_path_stays_in_codegen(spark):
    """Codegen spans only materialize once AQE finalizes the plan, so
    execute first, then read the final adaptive plan."""
    df = get_queries()["pricing_summary"](spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark whole-stage-codegen'd operators in the final
    # plan; both the scan+partial-agg stage and the final-agg stage
    # must be inside codegen
    assert "*(1)" in plan and "*(2)" in plan, plan


def _nodes(plan: str, op: str) -> int:
    """Count tree nodes of a given operator in a formatted explain
    (each node is also re-printed in the detail section, so a plain
    substring count doubles)."""
    return len(re.findall(rf"\b{op} \(\d+\)", plan))


def test_rollup_is_single_expand_aggregate(spark):
    """orders_rollup_totals must compute all three grouping sets in ONE
    Expand + hash-aggregate pass — per-set re-aggregation (a union of
    scans) would triple the shuffle at scale."""
    plan = _plan(spark, "orders_rollup_totals")
    assert _nodes(plan, "Expand") == 1, plan
    assert _nodes(plan, "Exchange") == 1, plan


def test_rank_topk_has_no_global_sort(spark):
    """orders_rank_topk partitions its windows by priority: every Sort
    in the plan must be per-partition (global=false) — a global sort of
    the fact table would serialize the cluster."""
    plan = _plan(spark, "orders_rank_topk")
    assert "Sort" in plan, plan
    for line in plan.splitlines():
        if line.strip().startswith("Sort ") or "] Sort [" in line:
            assert "global=false" in line, line


def test_exact_percentiles_aggregate_partially(spark):
    """lineitem_quantity_quantiles: percentile is a typed imperative
    aggregate — partial (map-side) collection must still happen before
    the one shuffle on l_linestatus."""
    plan = _plan(spark, "lineitem_quantity_quantiles")
    assert _nodes(plan, "Exchange") == 1, plan
    assert (
        _nodes(plan, "HashAggregate")
        + _nodes(plan, "ObjectHashAggregate")
        + _nodes(plan, "SortAggregate")
    ) >= 2, plan


@pytest.mark.parametrize(
    "name",
    [
        "pricing_summary", "gold_daily_orders", "top_customers",
        "regional_order_stats", "events_windowed_10min", "events_asof_join",
        "events_lead_label", "exact_dedup_keyset", "ngram_jaccard_pairs",
        "events_interpolate_1h", "doc_repetition_scores", "doc_pii_scan",
        "scraped_articles", "generated_ticks_profile",
        "orders_rollup_totals", "lineitem_quantity_quantiles", "orders_rank_topk",
        "doc_decontaminate", "docs_stratified_sample", "docs_train_val_split",
        "docs_pack_sequences", "doc_unigram_logprob", "events_sessionize",
    ],
)
def test_no_cartesian_products(spark, name):
    """No headline plan may degrade to CartesianProduct. (1-row-side
    BroadcastNestedLoopJoin — e.g. the anchored recency cutoff — is a
    deliberate, bounded pattern and stays allowed.)"""
    assert "CartesianProduct" not in _plan(spark, name)


def test_stratified_sample_never_shuffles_the_corpus(spark):
    """The sampler must be one corpus scan + a broadcast of the tiny
    per-source counts: no Exchange may sit between the documents scan
    and the filtering join (the counts side aggregates and broadcasts;
    the corpus side stays put)."""
    plan = _plan(spark, "docs_stratified_sample")
    assert "BroadcastHashJoin" in plan
    # corpus side of the join is the scan directly (no shuffle above it):
    # the only Exchange nodes are the counts aggregation + broadcast
    exchanges = re.findall(r"\n\(\d+\) (\w*Exchange)\b", plan)
    assert all(e in ("Exchange", "BroadcastExchange") for e in exchanges)
    assert len([e for e in exchanges if e == "Exchange"]) == 1  # counts agg only


def test_pack_sequences_single_shuffle_reused_by_aggregate(spark):
    """Packing shuffles ONCE on source; the final (source, seq_id)
    aggregate must reuse that partitioning (source is a prefix of the
    grouping key) instead of adding a second Exchange."""
    plan = _plan(spark, "docs_pack_sequences")
    assert len(re.findall(r"\n\(\d+\) Exchange\b", plan)) == 1
    assert "Window" in plan


def test_train_val_split_aggregates_partially(spark):
    """The split table is a pure map-side-combined aggregation: exactly
    one Exchange, with a partial_count/partial_sum below it."""
    plan = _plan(spark, "docs_train_val_split")
    assert len(re.findall(r"\n\(\d+\) Exchange\b", plan)) == 1
    assert "partial_count" in plan and "partial_sum" in plan


def test_sessionize_has_no_global_sort(spark):
    """Session windows must stay per-user: no partitionless Sort/Window
    over the whole event table."""
    plan = _plan(spark, "events_sessionize")
    assert "CartesianProduct" not in plan
    # every Sort in the plan is partition-local (global=false)
    for m in re.finditer(r"\n\(\d+\) Sort\b.*?Arguments: (.*)", plan):
        assert "true" not in m.group(1).split(",")[-2:][0]
