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

import pytest

pytestmark = pytest.mark.deep  # r17 two-tier suite: builds and times
# 4x data rungs — minutes-class evidence, not a driver-budget test

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


def test_decade3_row_passes_on_marginal_criterion():
    """VERDICT r14 #3: the decade-3 row must self-describe as pass/fail
    on the marginal-cost criterion (d3 s/copy <= 1.25 x d2 s/copy),
    with the exponent kept as context — an exponent ~1.0 with a
    decreasing marginal IS linear and must PASS (the r14 rungs read as
    failures under the old two_decade_exponent+0.1 bar for exactly
    this shape)."""
    from scale_ladder import MARGINAL_BAR_TOLERANCE, decade3_row

    # the committed r14 minhash shape: exponent ~1.0, marginal DOWN
    prior = {"exponent": 0.353, "t10x": 5.004, "t100x": 17.833}
    row = decade3_row(10.547, 106.257, prior, 100, 1000)
    assert row["exponent_decade3"] == 1.003
    assert row["within_marginal_bar"] is True
    assert row["marginal_bar"] == round(
        MARGINAL_BAR_TOLERANCE * row["marginal_sec_per_copy_decade2"], 4
    )
    # a genuinely superlinear shape: marginal GROWS past the tolerance
    sup = decade3_row(10.0, 400.0, prior, 100, 1000)
    assert sup["within_marginal_bar"] is False
    # no committed prior decades -> marginals reported, no bar claimed
    bare = decade3_row(10.0, 100.0, {}, 100, 1000)
    assert "within_marginal_bar" not in bare
    assert "marginal_sec_per_copy_decade3" in bare


def test_infeasible_row_shape():
    """r15: when a registry shape cannot run at the hi rung on one box
    (simhash r=16 at 2M vectors: ~1.9e9 band collisions -> >60 GB
    pair-shuffle spill, measured ENOSPC), the row records the largest
    feasible rung and the reason instead of fake or missing numbers."""
    from scale_ladder import infeasible_row

    row = infeasible_row(
        32.4, "registry shape infeasible: ...", {"exponent": 0.517}, 100, 1000
    )
    assert row["t100x"] == 32.4
    assert row["largest_feasible_factor"] == 100
    assert row["infeasible_at_1000x"].startswith("registry shape")
    assert row["two_decade_exponent"] == 0.517
    assert "within_marginal_bar" not in row
    assert "t1000x" not in row


def test_simhash_preflight_refuses_on_small_disk(monkeypatch, spark):
    """The preflight turns the measured r15 ENOSPC crash class into an
    instant refusal: expected-collision arithmetic (the operator's own
    pricing formula) against free local disk. Small disk -> reason
    string; huge disk -> None (measurement proceeds)."""
    import collections

    import scale_ladder as sl

    usage = collections.namedtuple("usage", "total used free")
    monkeypatch.setattr(
        sl.shutil, "disk_usage", lambda _: usage(1, 0, 50_000_000_000)
    )
    # sf0.001 embeddings (~tens of vectors) scaled by outer=10: far
    # below any wall -> feasible even on the small fake disk
    assert (
        sl._simhash_preflight(spark, "/root/testdata/sf0.001", 10) is None
    )
    # outer=100000 pushes expected collisions past the 50 GB fake disk
    reason = sl._simhash_preflight(spark, "/root/testdata/sf0.001", 2_000_000)
    assert reason is not None and "GB" in reason


def test_committed_three_decades_rows_self_describe():
    """The committed evidence file must encode the criterion it trusts
    (VERDICT r14 #3): every three_decades row carries the marginal
    fields, the bar is arithmetic on the row's own d2 marginal, and
    the headline claim (linear scaling) reads as within_marginal_bar
    true — a reader no longer needs the prose note to avoid misreading
    the exponents."""
    import json

    from scale_ladder import MARGINAL_BAR_TOLERANCE

    path = os.path.join(os.path.dirname(__file__), "..", "SCALE_LADDER.json")
    three = json.load(open(path)).get("three_decades", {})
    assert three.get("queries"), "committed three_decades section missing"
    for name, row in three["queries"].items():
        infeasible = [k for k in row if k.startswith("infeasible_at_")]
        if infeasible:
            # r15: a registry shape whose quadratic term cannot fit on
            # one box records the sandbox limit honestly — and must
            # then carry at least one MEASURED decade-3 knob row (the
            # operator's documented production lever for the regime)
            assert "largest_feasible_factor" in row, name
            assert row[infeasible[0]], name
            knobs = row.get("knobs", {})
            assert any(
                "marginal_sec_per_copy_decade3" in k for k in knobs.values()
            ), (name, "infeasible row without measured knob evidence")
            continue
        assert "marginal_sec_per_copy_decade3" in row, name
        if "marginal_sec_per_copy_decade2" in row:
            assert row["marginal_bar"] == round(
                MARGINAL_BAR_TOLERANCE
                * row["marginal_sec_per_copy_decade2"], 4
            ), name
            assert "within_marginal_bar" in row, name
            if row["within_marginal_bar"] is False:
                # r15: measured superlinearity must be ATTRIBUTED in
                # the evidence itself (which term, why the knob does
                # or doesn't rescue it, what the engine's alternative
                # is) — an unexplained false reads as an undiagnosed
                # regression (simhash: collision count is b*2^-r*n^2/2
                # by LSH physics; the note routes users to the
                # learned-cell family past ~1M vectors)
                assert row.get("note"), (
                    name, "superlinear row without attribution note"
                )


def test_three_decade_tables_match_real_input_scans(spark):
    """r14 ADVICE: the outer 1000x rung materializes only the tables in
    THREE_DECADE_TABLES and symlinks the rest from the 100x rung — so
    a wrong entry means a query silently times 100x-sized inputs under
    a 1000x label. Pin each declared table set to the query's REAL
    parquet scans (df.inputFiles) so the map cannot rot. (This catch
    is live: simhash_neardup_strict reads EMBEDDINGS, which the old
    documents-only outer builder would have left at 100x size.)"""
    from scale_ladder import (
        THREE_DECADE_QUERIES,
        THREE_DECADE_TABLES,
        ladder_queries,
    )

    assert set(THREE_DECADE_QUERIES) <= set(THREE_DECADE_TABLES)
    sf = "/root/testdata/sf0.001"
    queries = ladder_queries(sf)
    for name in THREE_DECADE_QUERIES:
        df = queries[name](spark, sf)
        # normalize: files may be table.parquet or table.parquet/part-*
        tables = set()
        for f in df.inputFiles():
            if ".parquet" not in f:
                continue
            tables.add(f.split(".parquet")[0].rsplit("/", 1)[-1])
        assert tables == set(THREE_DECADE_TABLES[name]), (name, tables)


def test_three_decades_refuses_unmapped_query(monkeypatch):
    """The loud-failure path itself: a THREE_DECADE_QUERIES entry with
    no THREE_DECADE_TABLES row must refuse before building anything."""
    import pytest

    import scale_ladder as sl

    monkeypatch.setattr(
        sl, "THREE_DECADE_QUERIES", ("corpus_build_pipeline", "mystery_q")
    )
    with pytest.raises(SystemExit, match="THREE_DECADE_TABLES"):
        sl.measure_three_decades(
            spark=None, rung_hi_dir="/nonexistent", base_dir="/nonexistent",
            work_dir="/nonexistent", committed_two_decades={},
        )


def test_doc_copy_builder_refuses_suffix_collisions(spark, tmp_path):
    """r14 ADVICE: copy-disjointness relies on no source token already
    ending in the suffix family; a natural 'xqz2' in copy 0 collides
    with outer copy 2's image of 'x'. The builder must refuse loudly
    at fixture-build time instead of silently corrupting linearity."""
    import pytest

    from scale_ladder import _write_doc_copies

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(1, "hello xqz2 world", "s", 16)],
        "doc_id long, text string, source string, n_chars long",
    ).write.parquet(os.path.join(src, "documents.parquet"))
    with pytest.raises(SystemExit, match="qz<digits>"):
        _write_doc_copies(spark, src, str(tmp_path / "o1"), 2, 100, "qz")
    # the other family is unaffected by this corpus -> builds fine
    _write_doc_copies(spark, src, str(tmp_path / "o2"), 2, 100, "zq")


def test_outer_embedding_transform_preserves_geometry(spark, tmp_path_factory):
    """The outer (1000x-style) embeddings builder's load-bearing
    property, mirroring the inner fixture test: an orthogonal map
    applied uniformly per outer copy preserves EVERY within-copy
    cosine (pair structure id-shifts exactly), while distinct flip
    families keep cross-copy pairs at zero — so pair output stays
    exactly linear in the total factor."""
    from scale_ladder import ID_STRIDE, synthesize_rung, synthesize_rung_outer

    from bda_spark.operators.similarity import simhash_neardup_pairs
    from bda_spark.sources.batch import load_table
    from pyspark.sql import functions as F

    work = str(tmp_path_factory.mktemp("embouter"))
    synthesize_rung(spark, "/root/testdata/sf0.01", f"{work}/inner", 2)
    synthesize_rung_outer(
        spark, f"{work}/inner", f"{work}/outer", 2, ID_STRIDE * 2,
        frozenset({"documents", "embeddings"}),
    )
    e_in = load_table(spark, f"{work}/inner", "embeddings")
    e_out = load_table(spark, f"{work}/outer", "embeddings")
    assert e_out.count() == 2 * e_in.count()
    stride = ID_STRIDE * 2
    # within-copy geometry preserved EXACTLY: each outer copy's
    # weak-threshold pair set, id-shifted back, equals the source
    # rung's (cross-copy pairs excluded — at 0.45 a few ~3.6-sigma
    # random-cosine outliers among the cross pairs are expected and
    # harmless; the inner fixture test scopes its claim the same way)
    p_in = {
        (r.id_a, r.id_b)
        for r in simhash_neardup_pairs(e_in, threshold=0.45)
        .select("id_a", "id_b")
        .collect()
    }
    p_out = {
        (r.id_a, r.id_b)
        for r in simhash_neardup_pairs(e_out, threshold=0.45)
        .select("id_a", "id_b")
        .collect()
    }
    base_copy = {(a, b) for a, b in p_out if a < stride and b < stride}
    shifted_copy = {
        (a - stride, b - stride)
        for a, b in p_out
        if a >= stride and b >= stride
    }
    assert p_in and base_copy == p_in and shifted_copy == p_in
    # at the STRICT ladder threshold (the regime the 1000x rung times)
    # cross-outer-copy pairs are zero and output is exactly linear
    s_in = simhash_neardup_pairs(
        e_in, threshold=0.9, band_rows=16, num_bands=64
    ).count()
    strict_out = simhash_neardup_pairs(
        e_out, threshold=0.9, band_rows=16, num_bands=64
    )
    assert strict_out.count() == 2 * s_in
    assert (
        strict_out.filter(
            (F.col("id_a") < stride) & (F.col("id_b") >= stride)
        ).count()
        == 0
    )


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
