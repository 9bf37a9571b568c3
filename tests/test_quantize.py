"""SQ8 embedding quantization (operators/quantize.py): grid error
bound, code range, and end-to-end top-k recall vs the exact baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from bda_spark.operators.quantize import (
    sq8_bounds,
    sq8_dequantize_col,
    sq8_quantize,
    sq8_topk,
)
from bda_spark.sources.batch import load_table

SF_DIR = "/root/testdata/sf0.001"


def test_codes_in_range_and_dequantization_error_bounded(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    lo, hi = sq8_bounds(emb)
    coded = sq8_quantize(emb, lo, hi)
    stats = coded.select(
        F.array_min("codes").alias("cmin"), F.array_max("codes").alias("cmax")
    ).agg(
        F.min("cmin").alias("lo"), F.max("cmax").alias("hi")
    ).collect()[0]
    assert stats["lo"] >= 0 and stats["hi"] <= 255
    # max |x - dequant(quant(x))| over every vector and dimension must
    # respect the per-dimension grid bound (hi-lo)/510
    err = coded.select(
        F.array_max(
            F.zip_with(
                F.col("embedding").cast("array<double>"),
                sq8_dequantize_col("codes", lo, hi),
                lambda x, y: F.abs(x - y),
            )
        ).alias("e")
    ).agg(F.max("e").alias("m")).collect()[0]["m"]
    worst_grid = max((h - l) / 510.0 for l, h in zip(lo, hi))
    assert err <= worst_grid * 1.0001, (err, worst_grid)


def test_sq8_topk_recall_vs_exact(spark):
    """Coarse int8 scan + exact rerank of 4k candidates: top-5 per
    query must essentially match the float32 brute force — full recall
    on the synthetic clustered embeddings, and rank-1 always."""
    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    got = sq8_topk(emb, queries, k=5, oversample=4).collect()
    exact = _exact_topk(spark, emb, queries, k=5)
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got_sets = {}
    top1 = {}
    for r in got:
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if r["rk"] == 1:
            top1[r["query_id"]] = r["neighbor_id"]
    assert set(got_sets) == set(exact_sets)
    hits = sum(len(got_sets[q] & exact_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    assert hits / total >= 0.95, (hits, total)
    exact_top1 = {r["query_id"]: r["neighbor_id"] for r in exact if r["rk"] == 1}
    assert top1 == exact_top1


def _exact_topk(spark, emb, queries, k=5):
    from pyspark.sql.window import Window

    def cos(a, b):
        dot = F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x
        )
        n = lambda v: F.sqrt(
            F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda s, x: s + x)
        )
        return dot / (n(a) * n(b))

    v = F.col("embedding").cast("array<double>")
    qs = F.broadcast(
        queries.select(F.col("vec_id").alias("query_id"), v.alias("qv"))
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), v.alias("nv"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        corpus.join(qs, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cos(F.col("qv"), F.col("nv")), 6).alias("cosine"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .collect()
    )


def test_ivf_sq8_full_probe_equals_brute_force(spark):
    """The pinned-correctness regime: probe EVERY cell with generous
    oversampling — the composed index must reproduce the exact float
    brute force ranking identically."""
    from bda_spark.operators.quantize import ivf_sq8_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    got = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"])
        for r in ivf_sq8_topk(
            emb, queries, k=5, n_centroids=8, n_probe=8, oversample=8
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"])
        for r in _exact_topk(spark, emb, queries, k=5)
    )
    assert got == want


def test_ivf_sq8_partial_probe_recall_with_honest_cells(spark):
    """The realistic regime: probe half the cells, 4x oversample.

    HISTORY: this test once pinned recall >= 0.95 at n_probe=4/8 —
    a number the old ml.KMeans quantizer hit only because its cell
    layout was DEGENERATE (singleton cells next to cells holding a
    quarter of the corpus), so 'probing half the cells' actually
    scanned most of the corpus: high recall by defeating IVF's whole
    point. The driver-trained quantizer (similarity._kmeans_fit —
    lower inertia, balanced cells) makes partial probing genuinely
    sublinear, and on these weakly-clustered synthetic embeddings
    recall is then bounded by probed mass. The honest contract is all
    three properties AT ONCE, which the degenerate layout cannot
    satisfy:
      1. recall@5 comfortably above the probed-mass baseline,
      2. balanced cells (no cell hoards the corpus),
      3. true sublinearity (probed rows ~ n_probe/k of the corpus).
    """
    from bda_spark.operators.quantize import ivf_sq8_topk
    from bda_spark.operators.similarity import ivf_index

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    queries = emb.filter(F.col("vec_id") < 5)
    got = ivf_sq8_topk(
        emb, queries, k=5, n_centroids=8, n_probe=4, oversample=4
    ).collect()
    exact = _exact_topk(spark, emb, queries, k=5)
    exact_sets, got_sets, top1 = {}, {}, {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in got:
        got_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        if r["rk"] == 1:
            top1[r["query_id"]] = r["neighbor_id"]
    hits = sum(len(got_sets.get(q, set()) & exact_sets[q]) for q in exact_sets)
    total = sum(len(s) for s in exact_sets.values())
    # 1. recall clears the probed-mass (~0.5) baseline with margin,
    #    and most rank-1 neighbors survive the half-probe
    assert hits / total >= 0.72, (hits, total)
    exact_top1 = {r["query_id"]: r["neighbor_id"] for r in exact if r["rk"] == 1}
    assert sum(top1.get(q) == v for q, v in exact_top1.items()) >= 3
    # 2. balance: no cell exceeds 2x the mean occupancy
    assigned, _ = ivf_index(emb, n_centroids=8)
    sizes = {
        r["centroid_id"]: r["c"]
        for r in assigned.groupBy("centroid_id").agg(F.count("*").alias("c")).collect()
    }
    assert max(sizes.values()) <= 2 * (n / 8), sizes
    # 3. sublinearity: even the WORST-case 4/8 probe (the four fattest
    #    cells) stays near half the corpus, not most of it
    worst_probe_mass = sum(sorted(sizes.values(), reverse=True)[:4])
    assert worst_probe_mass <= 0.7 * n, (worst_probe_mass, n)


def test_ivf_sq8_persisted_index_round_trip(spark, tmp_path):
    """The build-once / query-many shape: persist the IVF+SQ8 index,
    search from the artifact, and get exactly what the live composed
    pipeline produces (same seeds, same grid, same probes)."""
    from bda_spark.operators.quantize import (
        ivf_sq8_index_build,
        ivf_sq8_search,
        ivf_sq8_topk,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    path = str(tmp_path / "ann_index")
    ivf_sq8_index_build(emb, path, n_centroids=8)
    got = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"], r["cosine"])
        for r in ivf_sq8_search(
            spark, path, queries, emb, k=5, n_probe=4, oversample=4
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"], r["cosine"])
        for r in ivf_sq8_topk(
            emb, queries, k=5, n_centroids=8, n_probe=4, oversample=4
        ).collect()
    )
    assert got == want
    # the artifact is self-contained: codes + meta parquet on disk
    import os

    assert os.path.isdir(os.path.join(path, "codes"))
    assert os.path.isdir(os.path.join(path, "meta"))


def test_sample_trained_quantizer_full_probe_still_exact(spark):
    """The 100 TB training discipline: KMeans fits on a seeded sample
    (train_per_centroid x k rows), never the corpus. With the sampling
    path FORCED (tiny per-centroid budget << corpus), full probing must
    still return exactly the brute-force top-k — cell quality affects
    only partial-probe recall, never the exact regime."""
    from bda_spark.operators.similarity import ivf_index, ivf_topk

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    assert n > 8 * 4  # the sample path genuinely engages below
    assigned, centroids = ivf_index(
        emb, n_centroids=8, train_per_centroid=4
    )
    # every corpus vector is assigned exactly once, sample or not
    assert assigned.count() == n
    assert len(centroids) == 8
    queries = emb.filter(F.col("vec_id") < 3)
    got = sorted(
        (r.query_id, r.rk, r.neighbor_id)
        for r in ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=8,
            train_per_centroid=4,
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"])
        for r in _exact_topk(spark, emb, queries, k=5)
    )
    assert got == want


def test_index_append_matches_rebuilt_search(spark, tmp_path):
    """Incremental maintenance: build the index on part of the corpus,
    append the rest by nearest-centroid assignment (no retrain), and
    full-probe search over the grown index must equal a from-scratch
    brute force over the full corpus — appended vectors are first-class
    index members."""
    from bda_spark.operators.quantize import (
        ivf_sq8_index_append,
        ivf_sq8_index_build,
        ivf_sq8_search,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") % 5 != 0)
    batch = emb.filter(F.col("vec_id") % 5 == 0)
    path = str(tmp_path / "ivf_idx")
    ivf_sq8_index_build(base, path, n_centroids=8)
    stats = ivf_sq8_index_append(spark, path, batch)
    assert stats["appended"] == batch.count()
    assert 1 <= stats["cells_touched"] <= 8

    queries = emb.filter(F.col("vec_id") < 3)
    got = sorted(
        (r.query_id, r.rk, r.neighbor_id)
        for r in ivf_sq8_search(
            spark, path, queries, emb, k=5, n_probe=8, oversample=1000
        ).collect()
    )
    want = sorted(
        (r["query_id"], r["rk"], r["neighbor_id"])
        for r in _exact_topk(spark, emb, queries, k=5)
    )
    assert got == want

    # replay safety: re-appending the same batch changes nothing
    again = ivf_sq8_index_append(spark, path, batch)
    assert again["appended"] == stats["appended"]
    got2 = sorted(
        (r.query_id, r.rk, r.neighbor_id)
        for r in ivf_sq8_search(
            spark, path, queries, emb, k=5, n_probe=8, oversample=1000
        ).collect()
    )
    assert got2 == got


def test_index_append_drift_trigger_fires_on_skew(spark, tmp_path):
    """The retrain scheduler's signal: appending a dense blob far from
    every trained centroid piles into one cell and trips the skew
    threshold; a same-distribution append does not."""
    from pyspark.sql import Row

    from bda_spark.operators.quantize import (
        ivf_sq8_index_append,
        ivf_sq8_index_build,
    )

    emb = load_table(spark, SF_DIR, "embeddings")
    dim = len(emb.first()["embedding"])
    path = str(tmp_path / "drift_idx")
    ivf_sq8_index_build(emb, path, n_centroids=8)
    ok = ivf_sq8_index_append(
        spark, path, emb.select((F.col("vec_id") + 100000).alias("vec_id"),
                                "embedding"),
    )
    assert not ok["needs_retrain"], ok
    n = emb.count()
    blob = spark.createDataFrame(
        [Row(vec_id=200000 + i, embedding=[1000.0] * dim)
         for i in range(4 * n)]
    )
    drift = ivf_sq8_index_append(spark, path, blob)
    assert drift["cells_touched"] == 1  # the whole blob shares one cell
    assert drift["skew"] > 4.0 and drift["needs_retrain"], drift


def test_ivf_index_stale_small_hint_never_full_collects(spark):
    """A stale n_hint claiming the corpus is small must NOT trigger an
    unbounded full-corpus collect on the driver (ADVICE r9): the
    hinted fetch is capped at the same 4x-training bound as the
    no-hint probe, and hitting the cap falsifies the hint and falls
    back to Bernoulli sampling. The index built under the lying hint
    must still be a working index over the FULL corpus."""
    from bda_spark.operators.similarity import ivf_index

    emb = load_table(spark, SF_DIR, "embeddings")
    n = emb.count()
    # train_per_centroid=2, k=4 -> target 8, cap 33 << corpus size;
    # the hint lies that the corpus fits under 4x target
    assigned, centroids = ivf_index(
        emb, n_centroids=4, train_per_centroid=2, n_hint=5
    )
    assert len(centroids) == 4
    # every corpus vector got assigned — the lying hint didn't shrink
    # the index to the capped sample
    assert assigned.count() == n
    assert assigned.select("centroid_id").distinct().count() >= 2
