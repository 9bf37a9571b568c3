"""Declarative expectations gate (functions/expectations.py): row
routing, failure annotation, NULL policy, and one-pass metrics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bda_spark.functions.expectations import (
    annotate_expectations,
    apply_expectations,
)

def _rules():
    # built lazily: Column construction needs an active SparkContext
    return {
        "price_positive": F.col("price") > 0,
        "symbol_known": F.col("symbol").isin("BP", "ETH"),
        "volume_sane": F.col("volume") < 1000,
    }


def _frame(spark):
    return spark.createDataFrame(
        [
            # id, symbol, price, volume      failures
            (1, "BP", 10.0, 5.0),          # clean
            (2, "ETH", -1.0, 5.0),         # price_positive
            (3, "DOGE", 10.0, 5.0),        # symbol_known
            (4, "BP", -5.0, 2000.0),       # price_positive + volume_sane
            (5, None, 10.0, None),         # symbol_known + volume_sane (NULLs)
        ],
        "id long, symbol string, price double, volume double",
    )


def test_rows_route_to_pass_or_quarantine_with_reasons(spark):
    passed, quarantined, _ = apply_expectations(_frame(spark), _rules())
    assert [r["id"] for r in passed.collect()] == [1]
    assert "failed_expectations" not in passed.columns
    q = {r["id"]: sorted(r["failed_expectations"]) for r in quarantined.collect()}
    assert q == {
        2: ["price_positive"],
        3: ["symbol_known"],
        4: ["price_positive", "volume_sane"],
        5: ["symbol_known", "volume_sane"],
    }


def test_null_rule_results_count_as_failures(spark):
    # row 5: symbol NULL -> isin NULL, volume NULL -> `<` NULL; both
    # must fail, not silently pass
    annotated = annotate_expectations(_frame(spark), _rules())
    row5 = annotated.filter(F.col("id") == 5).collect()[0]
    assert sorted(row5["failed_expectations"]) == ["symbol_known", "volume_sane"]


def test_metrics_count_every_rule_over_all_rows(spark):
    _, _, metrics = apply_expectations(_frame(spark), _rules())
    m = {
        r["expectation"]: (r["n_violations"], r["violation_rate"])
        for r in metrics.collect()
    }
    assert m == {
        "price_positive": (2, 0.4),
        "symbol_known": (2, 0.4),
        "volume_sane": (2, 0.4),
    }


def test_gate_conserves_rows(spark):
    df = _frame(spark)
    passed, quarantined, _ = apply_expectations(df, _rules())
    assert passed.count() + quarantined.count() == df.count()


def test_gate_routes_a_live_stream(spark, tmp_path):
    """The same gate on a STREAMING frame: annotation is a stateless
    projection, so pass/quarantine routing drops into foreachBatch
    unchanged — the production ingest shape (clean rows to the main
    table, violations to a reasons-annotated quarantine table)."""
    src = str(tmp_path / "src")
    _frame(spark).write.parquet(src)
    pass_dir = str(tmp_path / "passed")
    quar_dir = str(tmp_path / "quarantine")

    def route(batch_df, _batch_id):
        annotated = annotate_expectations(batch_df, _rules())
        annotated.filter(F.size("failed_expectations") == 0).drop(
            "failed_expectations"
        ).write.mode("append").parquet(pass_dir)
        annotated.filter(F.size("failed_expectations") > 0).write.mode(
            "append"
        ).parquet(quar_dir)

    q = (
        spark.readStream.schema(_frame(spark).schema)
        .parquet(src)
        .writeStream.foreachBatch(route)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert [r["id"] for r in spark.read.parquet(pass_dir).collect()] == [1]
    quarantined = {
        r["id"]: sorted(r["failed_expectations"])
        for r in spark.read.parquet(quar_dir).collect()
    }
    assert set(quarantined) == {2, 3, 4, 5}
    assert quarantined[4] == ["price_positive", "volume_sane"]


def test_metrics_are_one_aggregation_pass(spark):
    """N rules must not become N scans: the metrics plan holds exactly
    one aggregate (partial+final) over one scan of the input."""
    _, _, metrics = apply_expectations(_frame(spark), _rules())
    plan = metrics._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    # tree nodes only (the detail section re-prints each node)
    scans = len(re.findall(r"Scan \w+ ?\w* \(\d+\)", plan))
    aggs = len(re.findall(r"HashAggregate \(\d+\)", plan))
    assert scans == 1, plan
    assert aggs == 2, plan  # partial + final, nothing per-rule
