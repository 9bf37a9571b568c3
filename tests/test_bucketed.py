"""Bucketed co-located join: the written bucket layout must delete the
Exchange from BOTH sides of a same-key equi-join (the 100 TB fact-fact
join shape), verified on the physical plan and on the joined values."""

from __future__ import annotations

import pytest

from bda_spark.sources.batch import load_table
from bda_spark.sources.bucketed import read_bucketed, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def no_broadcast(spark):
    """Force the shuffle-vs-bucket decision to be visible: with the
    64m broadcast threshold these test tables would broadcast and the
    plan would prove nothing about co-location."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    write_bucketed(
        orders, "b_orders", str(tmp_path / "b_orders"),
        ["o_orderkey"], num_buckets=8, sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem, "b_lineitem", str(tmp_path / "b_lineitem"),
        ["l_orderkey"], num_buckets=8, sort_cols=["l_orderkey"],
    )
    try:
        j = read_bucketed(spark, "b_orders").join(
            read_bucketed(spark, "b_lineitem"),
            read_bucketed(spark, "b_orders").o_orderkey
            == read_bucketed(spark, "b_lineitem").l_orderkey,
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and the join is still CORRECT: row count = lineitem rows with
        # a matching order (foreign keys -> all of them)
        n_join = j.count()
        n_expected = (
            lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
            .count()
        )
        assert n_join == n_expected > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_unbucketed_same_join_does_shuffle(spark, no_broadcast):
    """Control: the identical join over plain parquet shuffles both
    sides — the bucket layout, not the data, removed the Exchanges."""
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    j = orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan, plan
