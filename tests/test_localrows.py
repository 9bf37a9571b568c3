"""functions/localrows.py — driver-built tiny frames must not fan one
Python worker per core (r16)."""

from __future__ import annotations

from bda_spark.functions.localrows import rows_frame


def test_small_list_is_single_slice(spark):
    df = rows_frame(spark, [(i, i % 7) for i in range(500)], "a long, b long")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 500


def test_empty_list_keeps_schema_and_single_slice(spark):
    df = rows_frame(spark, [], "doc_id long")
    assert df.rdd.getNumPartitions() == 1
    assert df.count() == 0
    assert df.schema.simpleString() == "struct<doc_id:bigint>"


def test_large_list_still_parallelizes(spark):
    rows = [(i,) for i in range(120_000)]
    df = rows_frame(spark, rows, "a long", rows_per_slice=50_000)
    assert 1 < df.rdd.getNumPartitions() <= spark.sparkContext.defaultParallelism
    assert df.count() == 120_000


def test_values_match_plain_createdataframe(spark):
    rows = [(i, float(i) / 3) for i in range(100)]
    a = sorted(rows_frame(spark, rows, "a long, b double").collect())
    b = sorted(spark.createDataFrame(rows, "a long, b double").collect())
    assert a == b
