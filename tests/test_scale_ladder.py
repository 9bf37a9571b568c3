"""Scale-ladder guard (VERDICT r7 #5 / r8 #3): the superlinear-risk
operators' runtimes must grow ~linearly with data volume, measured —
not plan-audited. The committed 10x evidence lives in
SCALE_LADDER.json (tools/scale_ladder.py); this per-round test runs
the same harness at a smaller factor so a regression to quadratic
candidate expansion (a broken hot-bucket cap, an accidental all-pairs
join, a full-corpus KMeans) fails the suite the round it lands.

The rung construction is a per-copy token bijection, so LSH pair and
cluster OUTPUT grows exactly linearly with the factor — any
superlinear runtime is the algorithm's own (see tools/scale_ladder.py
module doc for why naive replication would be an unfair fixture).
"""

from __future__ import annotations

import sys
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FACTOR = 4
SRC = "/root/testdata/sf0.1"


def test_superlinear_risk_operators_scale_linearly(spark, tmp_path_factory):
    from scale_ladder import build_and_measure

    work = str(tmp_path_factory.mktemp("ladder"))
    report = build_and_measure(spark, SRC, work, FACTOR)
    # Noise floor: in the loaded shared-JVM suite, a sub-second 1x
    # baseline can jitter a RATIO past the bound without any real
    # scaling problem. A genuine superlinear blowup at these volumes
    # is unmissable in ABSOLUTE time (the fixture bug this harness
    # caught measured 477 s at 10x); require both signals.
    floor_s = 8.0
    failures = {
        name: row
        for name, row in report["queries"].items()
        if row["ratio"] is not None
        and row["ratio"] > row["bound"]
        and row[f"t{FACTOR}x"] >= floor_s
    }
    assert not failures, (
        f"operators scaling worse than {report},"
        f" failing rows: {failures}"
    )
    # sanity: the rung really is FACTOR x bigger (the bijection kept
    # every copy, nothing deduplicated at write time)
    import duckdb

    n1 = duckdb.sql(
        f"select count(*) from '{work}/rung1x/documents.parquet/*.parquet'"
    ).fetchone()[0]
    nf = duckdb.sql(
        f"select count(*) from '{work}/rung{FACTOR}x/documents.parquet/*.parquet'"
    ).fetchone()[0]
    assert nf == FACTOR * n1


def test_maintenance_cost_tracks_new_data_not_history(spark, tmp_path_factory):
    """VERDICT r9 #2 — the O(new data + touched partitions) compaction
    claim, TIMED (r9 pinned it structurally: untouched partitions
    byte-identical). Two deep-history tables, identical hot partition
    and identical fresh batch, the big one dragging FACTORx more
    partitions of accumulated history; the land-batch-then-compact
    cycle must stay near-FLAT (bound does not scale with the factor —
    an O(accumulated-table) rewrite would show near-FACTORx). Noise
    guard mirrors the operator ladder: only fail when the big table's
    absolute cycle time is also past the floor."""
    from scale_ladder import MAINT_FLAT_BOUND, measure_maintenance

    work = str(tmp_path_factory.mktemp("maint"))
    row = measure_maintenance(spark, work, FACTOR)
    assert row["ratio"] is not None
    assert row["ratio"] <= MAINT_FLAT_BOUND or row[f"t{FACTOR}x"] < 8.0, row


def test_bijection_preserves_pair_structure_exactly(spark, tmp_path_factory):
    """The fixture's load-bearing property: the per-copy token
    bijection must keep each copy's near-dup pair set EXACTLY the
    original's (shingle overlap preserved within a copy, zero overlap
    across copies) — so a 2x rung yields exactly 2x the pairs. If this
    breaks (e.g. a canonicalization-unstable marker — the bug the
    first fixture had), every ladder ratio becomes meaningless."""
    from scale_ladder import synthesize_rung

    from bda_spark.operators.dedup import minhash_neardup_pairs
    from bda_spark.sources.batch import load_table

    work = str(tmp_path_factory.mktemp("bij"))
    synthesize_rung(spark, SRC, f"{work}/r1", 1)
    synthesize_rung(spark, SRC, f"{work}/r2", 2)
    n1 = minhash_neardup_pairs(
        load_table(spark, f"{work}/r1", "documents"), threshold=0.5
    ).count()
    n2 = minhash_neardup_pairs(
        load_table(spark, f"{work}/r2", "documents"), threshold=0.5
    ).count()
    assert n1 > 0
    assert n2 == 2 * n1, (n1, n2)


def test_embedding_rotation_preserves_copy_geometry(spark, tmp_path_factory):
    """The embeddings fixture's load-bearing property (the r9 ladder
    bug): each copy's orthogonal transform must keep within-copy
    cosines EXACTLY the original's, while cross-copy vectors stay
    decorrelated — so pair output grows linearly with the factor. The
    first fixture scaled copies by (1 + k/1000), forgot cosine is
    scale-invariant, and put a factor-sized clique of parallel twins
    in every SimHash bucket (pair output quadratic in the factor:
    measured 4.22x runtime at 10x for simhash_neardup_strict, all of
    it fixture)."""
    from scale_ladder import ID_STRIDE, synthesize_rung

    from bda_spark.operators.similarity import simhash_neardup_pairs
    from bda_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    work = str(tmp_path_factory.mktemp("emb"))
    synthesize_rung(spark, "/root/testdata/sf0.01", f"{work}/r1s", 1)
    synthesize_rung(spark, "/root/testdata/sf0.01", f"{work}/r3s", 3)
    e1 = load_table(spark, f"{work}/r1s", "embeddings")
    e3 = load_table(spark, f"{work}/r3s", "embeddings")
    # strict regime: no pairs at 1x => exactly none at 3x (the broken
    # fixture produced n_vecs * C(3,2) cosine-1.0 cross-copy pairs)
    s1 = simhash_neardup_pairs(
        e1, threshold=0.9, band_rows=16, num_bands=64
    ).count()
    s3 = simhash_neardup_pairs(
        e3, threshold=0.9, band_rows=16, num_bands=64
    ).count()
    assert s3 == 3 * s1, (s1, s3)
    # within-copy geometry preserved EXACTLY: copy 2's weak-threshold
    # pair set, id-shifted back, equals the original's
    p1 = {
        (r.id_a, r.id_b)
        for r in simhash_neardup_pairs(e1, threshold=0.45)
        .select("id_a", "id_b")
        .collect()
    }
    p2 = {
        (r.id_a - 2 * ID_STRIDE, r.id_b - 2 * ID_STRIDE)
        for r in simhash_neardup_pairs(
            e3.filter(F.col("vec_id") >= 2 * ID_STRIDE), threshold=0.45
        )
        .select("id_a", "id_b")
        .collect()
    }
    assert p1 and p1 == p2


def test_two_decade_headliners_exponent_fit_at_10x(spark, tmp_path_factory):
    """VERDICT r10 #5 — the committed SCALE_LADDER.json now carries a
    100x (two-decade) rung for the headline ANN + LSH operators; this
    per-round guard re-fits the power-law exponent e in t ~ n^e at a
    full decade (factor 10, the committed evidence's first decade) so
    a regression toward quadratic (e -> 2) fails the suite the round
    it lands. One-sided: fixed per-job overhead inflates t1x and
    UNDERSTATES e, so a pass does not prove sublinearity — but a
    quadratic candidate blowup cannot hide (it reads e >~ 1.5 even
    with a 1 s overhead on these rung sizes). Same absolute-time noise
    floor as the ratio test."""
    import math

    from scale_ladder import (
        TWO_DECADE_EXPONENT_CAP,
        TWO_DECADE_QUERIES,
        _time_query,
        ladder_queries,
        synthesize_rung,
    )

    work = str(tmp_path_factory.mktemp("ladder2d"))
    rungs = {}
    for f in (1, 10):
        d = f"{work}/rung{f}x"
        synthesize_rung(spark, SRC, d, f)
        rungs[f] = d
    queries = ladder_queries(rungs[1])
    floor_s = 8.0
    failures = {}
    for name in TWO_DECADE_QUERIES:
        t1 = _time_query(spark, queries[name], rungs[1])
        t10 = _time_query(spark, queries[name], rungs[10])
        e = math.log10(t10 / t1)  # one decade: log10(ratio)/1
        if e > TWO_DECADE_EXPONENT_CAP and t10 >= floor_s:
            failures[name] = {"t1x": round(t1, 3), "t10x": round(t10, 3),
                              "exponent": round(e, 3)}
    assert not failures, failures
