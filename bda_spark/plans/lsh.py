"""Bucketed (LSH) near-dup and ANN queries — the scale paths of
plans.textops.ngram_jaccard_pairs / plans.vectorops.embedding_neardup_pairs
/ plans.vectorops.cosine_topk, registered with EXACT all-pairs DuckDB
oracles: because every LSH path ends in an exact re-verification of its
candidates, its output must equal the exact computation whenever
banding recall holds — the CORRECTNESS comparison is therefore a live
recall measurement (any missed pair fails the row-count/hash check).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.dedup import minhash_neardup_pairs, neardup_clusters
from ..operators.pq import pq_adc_topk
from ..operators.similarity import (
    embedding_neardup_auto,
    ivf_topk,
    semantic_dedup,
    semantic_neardup_pairs,
    simhash_neardup_pairs,
    simhash_topk,
)
from .registry import query, r6, t
from .vectorops import _COS_SQL

# Exact all-pairs Jaccard over 3-gram shingles — the shared oracle body
# for the pair query and the cluster query built on top of it.
_EXACT_PAIR_CTES = """
    shingles AS (
      SELECT doc_id, unnest(list_distinct(sh)) AS shingle
      FROM (
        SELECT doc_id,
               [list_aggregate(toks[i:i+2], 'string_agg', ' ')
                FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)] AS sh
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents)
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM shingles a JOIN shingles b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
"""


@query(
    "minhash_neardup_pairs",
    f"""
    WITH {_EXACT_PAIR_CTES}
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY doc_a, doc_b
    """,
)
def minhash_neardup_pairs_q(spark, sf_dir):
    """MinHash-LSH near-dup over the FULL documents table at the 0.5
    dedup threshold; oracle is the exact all-pairs Jaccard. Identical
    output = 100% recall of the banding (see operators.dedup for the
    1-(1-j^r)^b bound: miss < 1e-20 at the corpus's j >= 0.88 pairs)."""
    d = t(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(d, threshold=0.5)
    return pairs.select(
        "doc_a", "doc_b", r6(F.col("jaccard")).alias("jaccard")
    ).orderBy("doc_a", "doc_b")


@query(
    "neardup_clusters",
    f"""
    WITH RECURSIVE {_EXACT_PAIR_CTES},
    p AS (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sizes sa ON sa.doc_id = doc_a
      JOIN sizes sb ON sb.doc_id = doc_b
      WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM p
      UNION
      SELECT doc_b, doc_a FROM p
    ), reach AS (
      SELECT a AS id, b AS r FROM edges
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
    )
    SELECT id AS doc_id, least(id, min(r)) AS cluster_id
    FROM reach GROUP BY id
    """,
)
def neardup_clusters_q(spark, sf_dir):
    """Dedup canonicalization: connected components over the MinHash-LSH
    pair graph, cluster_id = min reachable doc_id (keep one doc per
    cluster, drop the rest). Oracle: transitive closure by recursive CTE
    over the EXACT all-pairs graph — a hash match proves both that LSH
    recalled every edge and that the iterative min-propagation converged
    to true components."""
    d = t(spark, sf_dir, "documents")
    pairs = minhash_neardup_pairs(d, threshold=0.5)
    return neardup_clusters(pairs.select("doc_a", "doc_b"))


@query(
    "simhash_neardup_pairs",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.45
    ORDER BY id_a, id_b
    """,
)
def simhash_neardup_pairs_q(spark, sf_dir):
    """SimHash-bucketed embedding near-dup at cosine 0.45; oracle is the
    exact all-pairs computation (same SQL as embedding_neardup_pairs).
    The corpus is never self-crossed — candidates come from band-bucket
    collisions, then exact rerank."""
    e = t(spark, sf_dir, "embeddings")
    pairs = simhash_neardup_pairs(e, threshold=0.45)
    return pairs.select(
        "id_a", "id_b", r6(F.col("cosine")).alias("cosine")
    ).orderBy("id_a", "id_b")


@query(
    "embedding_neardup_auto",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.45
    ORDER BY id_a, id_b
    """,
)
def embedding_neardup_auto_q(spark, sf_dir):
    """The scale-routing front door (r15): embedding near-dup with the
    family chosen by the repo's own ladder measurements —
    data-oblivious SimHash banding below 1M vectors, SemDeDup learned
    cells (k ~ n/125, linear total work) at or above it
    (operators/similarity.py::embedding_neardup_auto; evidence
    SCALE_LADDER.json three_decades). At every oracle SF the corpus
    sits far below the crossover, so this row exercises the
    auto->simhash route end-to-end against the exact all-pairs oracle;
    the semantic route's correctness is anchored by the
    semantic_dedup_pairs row and the router's pytest equivalences."""
    e = t(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_auto(e, threshold=0.45)
    return pairs.select(
        "id_a", "id_b", r6(F.col("cosine")).alias("cosine")
    ).orderBy("id_a", "id_b")


@query(
    "simhash_neardup_strict",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.9
    ORDER BY id_a, id_b
    """,
)
def simhash_neardup_strict_q(spark, sf_dir):
    """SimHash near-dup at the REALISTIC semantic-dedup threshold
    (0.9, r=16): here banding prunes hard (random-pair candidate rate
    0.5^16 * b ~ 0.1%), so this is the plan shape that runs at 100 TB —
    the bench's scale-path entry. The synthetic corpus has no pairs
    above 0.60, so both engines return empty; end-to-end recall at a
    populated threshold is proven by the simhash_neardup_pairs entry
    (0.45, a deliberately weak-signal regime where LSH degenerates to
    near-all-pairs — see operators.similarity docstring).

    Scale-ladder note (r10): this operator's EXPECTED cost carries one
    quadratic term — the ~b * 2^-r * n^2 / 2 random-collision
    candidates any sign-random-hyperplane banding emits on
    near-orthogonal non-pairs, each then exact-rescored and rejected.
    At r=16 the constant is ~1e-3, so the term is negligible until n
    grows orders of magnitude; the production knob is r itself (e.g.
    r=20 cuts the constant 16x at a ~6% recall cost at cosine 0.9).
    SCALE_LADDER.json pins the measured 10x ratio under a per-operator
    8x bound (see the `simhash_neardup_strict` entry there for the
    current number; the r9 4.22x was entirely a parallel-copy fixture
    artifact — see tools/scale_ladder.py module doc)."""
    e = t(spark, sf_dir, "embeddings")
    pairs = simhash_neardup_pairs(e, threshold=0.9, band_rows=16, num_bands=64)
    return pairs.select(
        "id_a", "id_b", r6(F.col("cosine")).alias("cosine")
    ).orderBy("id_a", "id_b")


@query(
    "semantic_dedup_pairs",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.45
    ORDER BY id_a, id_b
    """,
)
def semantic_dedup_pairs_q(spark, sf_dir):
    """SemDeDup candidate half (k-means-cell-bucketed embedding
    near-dup, operators.similarity.semantic_neardup_pairs) in its
    EXACT regime: n_centroids=1 puts the whole corpus in one cell and
    the cap off, so the within-cell enumeration IS all-pairs and the
    oracle is the brute-force cosine join — the same correctness
    anchor as IVF's full-probe regime. The multi-cell scale path
    (learned cells, rank-gap hot-cell cap) is pinned by
    tests/test_semdedup.py against this regime plus planted-duplicate
    recall."""
    e = t(spark, sf_dir, "embeddings")
    # cap DISARMED (not just "large"): the exact regime must be
    # bit-identical to the uncapped all-pairs join at EVERY sf_dir —
    # a finite cap below the corpus size would silently drop rank-gap
    # pairs and diverge from the brute-force oracle (e.g. sf0.1's
    # 2000 embeddings in one cell vs a 1024 cap)
    pairs = semantic_neardup_pairs(
        e, threshold=0.45, n_centroids=1, max_cell_size=(1 << 31) - 1
    )
    return pairs.select(
        "id_a", "id_b", r6(F.col("cosine")).alias("cosine")
    ).orderBy("id_a", "id_b")


@query(
    "semantic_dedup_keepers",
    f"""
    WITH RECURSIVE p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE {_COS_SQL} >= 0.45
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM p
      UNION
      SELECT id_b, id_a FROM p
    ), reach AS (
      SELECT a AS id, b AS r FROM edges
      UNION
      SELECT reach.id, e.b FROM reach JOIN edges e ON reach.r = e.a
    ), labels AS (
      SELECT id AS vec_id, least(id, min(r)) AS cluster_id
      FROM reach GROUP BY id
    )
    SELECT e.vec_id,
           coalesce(l.cluster_id, e.vec_id) AS cluster_id,
           CASE WHEN coalesce(l.cluster_id, e.vec_id) = e.vec_id
                THEN 1 ELSE 0 END AS is_kept
    FROM embeddings e LEFT JOIN labels l ON l.vec_id = e.vec_id
    ORDER BY e.vec_id
    """,
)
def semantic_dedup_keepers_q(spark, sf_dir):
    """Full SemDeDup fate table (operators.similarity.semantic_dedup):
    every corpus vector with its duplicate-group id and keeper flag,
    exact regime (one cell), keep="min_id". Oracle: recursive-CTE
    transitive closure over the exact cosine pair graph — proving both
    the pair recall and that the hybrid CC converged to true
    components, the same double-check as neardup_clusters. The
    paper's keep="far_from_centroid" representative rule depends on
    the learned centroids, so it is pinned by pytest instead."""
    e = t(spark, sf_dir, "embeddings")
    # cap disarmed for the exact regime — see semantic_dedup_pairs_q
    fate = semantic_dedup(
        e, threshold=0.45, n_centroids=1, max_cell_size=(1 << 31) - 1
    )
    return fate.orderBy("vec_id")


@query(
    "cosine_topk_bucketed",
    f"""
    WITH sims AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COS_SQL} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
      FROM sims
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS cosine, rk
    FROM ranked WHERE rk <= 5
    """,
)
def cosine_topk_bucketed_q(spark, sf_dir):
    """ANN top-k via SimHash buckets + exact rerank; oracle is the exact
    brute-force top-k (same SQL as cosine_topk). Matching output means
    every true top-5 neighbor appeared among the buckets' candidates."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    topk = simhash_topk(e, queries, k=5)
    return topk.select(
        "query_id", "neighbor_id", r6(F.col("cosine")).alias("cosine"), "rk"
    )


@query(
    "ivf_topk",
    f"""
    WITH sims AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COS_SQL} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
      FROM sims
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS cosine, rk
    FROM ranked WHERE rk <= 5
    """,
)
def ivf_topk_q(spark, sf_dir):
    """IVF ANN (KMeans cells + probe + exact rerank) run FULL-PROBE:
    probing every cell makes the output provably identical to brute
    force whatever the learned centroids, so the hash row checks the
    assignment/probe/rerank machinery with zero dependence on KMeans
    nondeterminism across sessions. The partial-probe recall/speed
    trade (the actual 100 TB regime) is pinned by tests/test_lsh.py."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    # Full probe is exact whatever the centroids, so the quantizer only
    # needs enough iterations to partition the space — 2, not the
    # quality-tuned 10 the partial-probe regime uses. (Since the r9
    # driver-side sample trainer, extra iterations cost driver-local
    # microseconds, not corpus passes — 2 just keeps this row's plan
    # minimal.)
    topk = ivf_topk(e, queries, k=5, n_centroids=16, n_probe=16, max_iter=2)
    return topk.select(
        "query_id", "neighbor_id", r6(F.col("cosine")).alias("cosine"), "rk"
    )


@query(
    "pq_adc_topk",
    f"""
    WITH sims AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
             {_COS_SQL} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < 5 AND b.vec_id <> a.vec_id
    ), ranked AS (
      SELECT query_id, neighbor_id, sim,
             row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rk
      FROM sims
    )
    SELECT query_id, neighbor_id, round(sim, 6) AS cosine, rk
    FROM ranked WHERE rk <= 5
    """,
)
def pq_adc_topk_q(spark, sf_dir):
    """Product-quantization ANN (per-subspace codebooks + asymmetric-
    distance compressed-domain scan + exact float rerank,
    operators/pq.py) run with a CORPUS-COVERING oversample: every row
    survives the coarse ADC stage, so the exact rerank makes the
    output provably identical to brute force whatever the codebooks
    learned — the same exactness trick as ivf_topk's full-probe row,
    checking train/encode/ADC/rerank machinery with zero dependence
    on kmeans nondeterminism. The compressed-domain pruning regime
    (small oversample — the actual 100 TB read-1.6%-of-the-bytes
    path) is pinned by tests/test_pq.py recall bounds."""
    e = t(spark, sf_dir, "embeddings")
    queries = e.filter(F.col("vec_id") < 5)
    topk = pq_adc_topk(
        e,
        queries,
        k=5,
        m=8,
        n_codewords=16,
        oversample=10_000_000,
        max_iter=2,
    )
    return topk.select(
        "query_id", "neighbor_id", r6(F.col("cosine")).alias("cosine"), "rk"
    )


@query(
    "docs_fuzzy_join",
    """
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct(s)) AS shingle
      FROM (
        SELECT doc_id,
               [list_aggregate(toks[i:i+2], 'string_agg', ' ')
                FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)] AS s
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents)
      )
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS left_id, b.doc_id AS right_id, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle
      WHERE a.doc_id % 2 = 0 AND b.doc_id % 2 = 1
      GROUP BY 1, 2
    )
    SELECT left_id, right_id,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = left_id
    JOIN sizes sb ON sb.doc_id = right_id
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.5
    ORDER BY left_id, right_id
    """,
)
def docs_fuzzy_join_q(spark, sf_dir):
    """Cross-corpus fuzzy join (operators.dedup.minhash_fuzzy_join):
    even-id docs joined to odd-id docs at Jaccard >= 0.5, hot-bucket
    cap disarmed (the oracle regime — capped recall bounds are pinned
    by pytest instead). Oracle: exact all-cross-pairs Jaccard between
    the halves. Registered post-cap (DEFERRED_TAIL); oracle-verified
    every pytest run."""
    from ..operators.dedup import minhash_fuzzy_join

    d = t(spark, sf_dir, "documents")
    pairs = minhash_fuzzy_join(
        d.filter(F.col("doc_id") % 2 == 0),
        d.filter(F.col("doc_id") % 2 == 1),
        threshold=0.5,
        max_bucket_size=None,
    )
    return pairs.select(
        "left_id", "right_id", r6(F.col("jaccard")).alias("jaccard")
    ).orderBy("left_id", "right_id")


@query(
    "embeddings_fuzzy_join",
    f"""
    SELECT a.vec_id AS left_id, b.vec_id AS right_id,
           round({_COS_SQL}, 6) AS cosine
    FROM embeddings a JOIN embeddings b
      ON a.vec_id % 2 = 0 AND b.vec_id % 2 = 1
    WHERE {_COS_SQL} >= 0.45
    ORDER BY left_id, right_id
    """,
)
def embeddings_fuzzy_join_q(spark, sf_dir):
    """Cross-corpus embedding join
    (operators.similarity.semantic_fuzzy_join): even-id vectors joined
    to odd-id vectors at cosine >= 0.45 in the EXACT regime
    (n_centroids=1 — one shared cell makes the candidate stage
    all-cross-pairs; cap disarmed). Oracle: brute-force cross cosine
    join between the halves. Registered post-cap (DEFERRED_TAIL);
    oracle-verified every pytest run."""
    from ..operators.similarity import semantic_fuzzy_join

    e = t(spark, sf_dir, "embeddings")
    pairs = semantic_fuzzy_join(
        e.filter(F.col("vec_id") % 2 == 0),
        e.filter(F.col("vec_id") % 2 == 1),
        threshold=0.45,
        n_centroids=1,
        max_cell_size=None,
    )
    return pairs.select(
        "left_id", "right_id", r6(F.col("cosine")).alias("cosine")
    ).orderBy("left_id", "right_id")
