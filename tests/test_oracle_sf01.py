"""Oracle parity at sf0.1 for the scale-SENSITIVE queries (VERDICT
r10 #6): all driver correctness evidence runs at sf0.01, but
percentile/rank/interpolation/window/OLAP results can diverge only at
larger data — tie handling, bin boundaries, window edges, mode
tie-breaks all need enough rows to collide. This module re-runs the
data-dependent subset against DuckDB at sf0.1 (10x the driver's
gate), using the SAME comparator as the sf0.001 sweep."""

from __future__ import annotations

import os

import duckdb
import pytest

from bda_spark.plans import get_oracles, get_queries
from bda_spark.schemas import TESTDATA_TABLES
from tools.verify_oracle import normalize

SF01 = "/root/testdata/sf0.1"

# The queries whose VALUES depend on data-scale artifacts (ties, bin
# edges, percentile boundaries, session gaps, argmax/mode tie-breaks,
# TF-IDF vocabulary, rank cutoffs) — a constant-output or
# structure-only query gains nothing from a bigger rung.
SCALE_SENSITIVE = [
    "lineitem_quantity_quantiles",
    "customer_balance_ntiles",
    "events_spearman",
    "events_interpolate_1h",
    "events_asof_join",
    "events_sessionize",
    "doc_tfidf_terms",
    "doc_duplicate_passages",
    "events_trailing_7d",
    "events_5s_resample",
    # OLAP / grouping-analytics set
    "orders_cube_customers",
    "orders_grouping_sets_margins",
    "orders_rollup_totals",
    "events_pivot_daily",
    "docs_unpivot_stats",
    "events_argmax_daily",
    "events_mode_daily",
    "orders_rank_topk",
]


@pytest.fixture(scope="module")
def duck01():
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        p = os.path.join(SF01, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    return con


def test_scale_sensitive_list_is_current():
    """Every listed name must still be a registered query WITH a SQL
    oracle — a rename or an oracle drop would silently skip the
    sf0.1 check."""
    qs, os_ = get_queries(), get_oracles()
    missing = [n for n in SCALE_SENSITIVE if n not in qs or n not in os_]
    assert not missing, missing


@pytest.mark.parametrize("name", SCALE_SENSITIVE)
def test_query_matches_oracle_at_sf01(name, spark, duck01):
    sdf = get_queries()[name](spark, SF01)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck01.execute(get_oracles()[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    s_n, s_c = normalize(srows, sdf.columns)
    o_n, o_c = normalize(orows, ocols)
    assert s_c == o_c, f"column mismatch: {s_c} vs {o_c}"
    assert len(s_n) == len(o_n), f"rowcount {len(s_n)} vs {len(o_n)}"
    mismatches = [(a, b) for a, b in zip(s_n, o_n) if a != b][:3]
    assert not mismatches, f"value mismatch: {mismatches}"
