"""Differential test: every registered query vs its DuckDB oracle at
sf0.001 (the driver runs the same comparison at sf0.01)."""

from __future__ import annotations

import pytest

from bda_spark.plans import get_oracles, get_queries

# ONE comparator for both harnesses: the tool's normalize() tags every
# value with its fetched Python type (int vs Decimal vs float), the
# hardening that caught the HUGEINT class — a second stringify-only
# copy here would silently pass exactly that bug.
from tools.verify_oracle import normalize


QUERIES = get_queries()
ORACLES = get_oracles()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert srows is not None
        return
    res = duck.execute(ORACLES[name])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    s_n, s_c = normalize(srows, sdf.columns)
    o_n, o_c = normalize(orows, ocols)
    assert s_c == o_c, f"column mismatch: {s_c} vs {o_c}"
    assert len(s_n) == len(o_n), f"rowcount {len(s_n)} vs {len(o_n)}"
    mismatches = [(a, b) for a, b in zip(s_n, o_n) if a != b][:3]
    assert not mismatches, f"value mismatch: {mismatches}"
