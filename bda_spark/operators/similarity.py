"""SimHash-bucketed embedding similarity: near-dup pairs and top-k ANN
candidates (SURVEY extension; the scale path behind the exact
``embedding_neardup_pairs`` / ``cosine_topk`` baselines in
plans.vectorops).

Signatures are random-hyperplane SimHash: bit_i = sign(v . h_i) with
P[bit match] = 1 - angle/pi. Bits are grouped into b bands of r bits;
vectors agreeing on any whole band become candidates, then candidates
are EXACTLY re-scored with the true cosine — so precision is always
exact and only recall depends on banding:
P[candidate at cosine c] = 1 - (1 - p^r)^b, p = 1 - arccos(c)/pi.

The signature computation is an Arrow-batched pandas UDF (one numpy
matmul per batch) — the documented exception to the no-Python rule:
thousands of per-dimension expressions would defeat codegen, while the
matmul is exactly what vectorized hardware wants. Everything else
(explode, band join, exact rerank) is JVM-side.

Parameter note: the registered queries run at cosine 0.45 — on the
synthetic near-orthogonal corpus that is a WEAK-signal regime
(p ~= 0.65 vs 0.5 for random pairs), so banding passes most pairs
through to the exact rerank (the LSH gap rho -> 1 as the threshold
approaches the random-pair similarity). At realistic semantic-dedup
thresholds (0.9+: p ~= 0.86) the same plan prunes aggressively with
r = 16; the defaults here are chosen for provable recall at 0.45:
r = 6, b = 96 gives miss < 6e-4 per true pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

from ..functions.vectors import cosine_similarity_col, dot_col, l2_norm_col


def simhash_band_udf(dim: int, band_rows: int = 6, num_bands: int = 96,
                     seed: int = 42):
    """Pandas UDF: embedding -> array of ``num_bands`` 64-bit band keys
    (r sign-bits packed per band, band index folded into the key)."""
    rng = np.random.default_rng(seed)
    hyperplanes = rng.standard_normal((dim, band_rows * num_bands))
    weights = (1 << np.arange(band_rows)).astype(np.int64)
    band_offsets = (np.arange(num_bands, dtype=np.int64) + 1) << 32

    @F.pandas_udf(ArrayType(LongType()))
    def band_keys(emb: pd.Series) -> pd.Series:
        mat = np.stack(emb.to_numpy()).astype(np.float64)  # batch x dim
        bits = (mat @ hyperplanes) > 0  # batch x (b*r)
        packed = bits.reshape(len(mat), num_bands, band_rows) @ weights
        keyed = packed.astype(np.int64) + band_offsets
        return pd.Series(list(keyed))

    return band_keys


def _candidates(
    left: DataFrame,
    right: DataFrame,
    dim: int,
    band_rows: int,
    num_bands: int,
    seed: int,
    anti_reflexive: bool,
    max_bucket_size: int = 256,
) -> DataFrame:
    """Band-bucket join of two keyed embedding frames -> distinct
    (id_a, id_b) candidate pairs.

    ``anti_reflexive=True`` is the SELF-JOIN contract (id_a < id_b over
    ONE corpus — ``right`` must be the same frame, enforced below): it
    routes through the rank-gap hot-bucket cap with the per-vector key
    arrays checkpointed once. The two-frame path (queries x corpus,
    ``anti_reflexive=False``) evaluates the signature UDF once per join
    side — deliberate: the matmul is a narrow, shuffle-free map, while
    persisting the exploded (id, band_key) frame (b rows per vector)
    would cost memory/disk proportional to b x corpus."""
    if anti_reflexive and left is not right:
        raise ValueError(
            "_candidates: anti_reflexive=True is the self-join contract "
            "— left and right must be the same frame (pairs involving "
            "right-only rows would silently never be generated)"
        )
    udf = simhash_band_udf(dim, band_rows, num_bands, seed)

    def keyed(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col("vec_id").alias(f"id_{side}"),
            F.explode(udf(F.col("embedding"))).alias("band_key"),
        )

    if anti_reflexive:
        return _self_join_candidates(
            left, dim, band_rows, num_bands, seed, max_bucket_size
        )[0]
    return (
        keyed(left, "a")
        .join(keyed(right, "b"), "band_key")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def _self_join_candidates(
    embeddings: DataFrame,
    dim: int,
    band_rows: int,
    num_bands: int,
    seed: int,
    max_bucket_size: int,
    distinct: bool = True,
    payload_words: list[int] | None = None,
    sig: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Self-join near-dup candidate path: (candidates(id_a, id_b),
    sig(doc_id, _keys) checkpointed). A k-member near-identical
    embedding cluster shares every band key, so the uncapped bucket
    join is O(k^2 * num_bands) — route through the same rank-gap chain
    cap as MinHash (dedup._banded_candidates). The per-vector key
    ARRAY is checkpointed once (one UDF pass, ~num_bands longs per
    vector) so every downstream consumer — the cap's extra band
    explodes AND the Hamming prefilter's packed-word projection —
    reads cheap materialized rows instead of re-running the matmul.
    Callers that must resolve a size-gated regime BEFORE shaping the
    candidate plan (simhash_neardup_pairs) build ``sig`` themselves
    via ``_simhash_sig`` — its eager checkpoint makes the count free —
    and pass it in."""
    from .dedup import _banded_candidates

    if sig is None:
        sig = _simhash_sig(embeddings, dim, band_rows, num_bands, seed)
    # payload_words ride ON the band rows (16 bytes for the sampled
    # prefilter's two words) so the caller's pair filter can run inside
    # the bucket-join stage — see _banded_candidates(payload=...)
    payload = tuple(f"_s{w}" for w in (payload_words or []))
    bands = sig.select(
        "doc_id",
        F.explode("_keys").alias("band_key"),
        *[
            _packed_sig_word(w, band_rows, num_bands).alias(f"_s{w}")
            for w in (payload_words or [])
        ],
    )
    cands = (
        _banded_candidates(
            bands, max_bucket_size, distinct=distinct, payload=payload
        )
        .withColumnRenamed("doc_a", "id_a")
        .withColumnRenamed("doc_b", "id_b")
    )
    return cands, sig


def _simhash_sig(
    embeddings: DataFrame, dim: int, band_rows: int, num_bands: int,
    seed: int,
) -> DataFrame:
    """(doc_id, _keys) — the per-vector band-key arrays, eagerly
    localCheckpoint-ed so the one matmul pass is paid exactly once and
    every later read (counts, band explodes, packed-word projections)
    is a cached-rows read."""
    udf = simhash_band_udf(dim, band_rows, num_bands, seed)
    return embeddings.select(
        F.col("vec_id").alias("doc_id"),
        udf(F.col("embedding")).alias("_keys"),
    ).localCheckpoint(eager=True)


def _packed_sig_words(band_rows: int, num_bands: int) -> list["F.Column"]:
    """Projection of a ``_keys`` band-key array into packed 64-bit
    signature words ``_w0.._wN`` — the WHOLE r*b-bit SimHash signature
    as plain long columns, derived JVM-side from the checkpointed key
    array (each key's low ``band_rows`` bits are its band's sign-bit
    pattern; the band-index offset sits above bit 32 and is masked
    off). Words pack ``64 // band_rows`` bands each; unused high bits
    are zero on BOTH sides of any pair, so they contribute nothing to
    an xor-popcount. Pure codegen arithmetic — no UDF, no arrays on
    the hot path."""
    bpw = max(1, 64 // band_rows)
    return [
        _packed_sig_word(w, band_rows, num_bands).alias(f"_w{w}")
        for w in range((num_bands + bpw - 1) // bpw)
    ]


def _packed_sig_word(
    word_idx: int, band_rows: int, num_bands: int
) -> "F.Column":
    """One packed signature word (see ``_packed_sig_words``): the
    ``64 // band_rows`` band keys starting at band ``word_idx * bpw``,
    packed low-to-high. Factored out so the sampled prefilter can
    derive just the two words it carries through the bucket join."""
    bpw = max(1, 64 // band_rows)
    mask = (1 << band_rows) - 1
    start = word_idx * bpw
    parts = [
        F.shiftleft(
            F.element_at("_keys", i + 1).bitwiseAND(F.lit(mask)),
            j * band_rows,
        )
        for j, i in enumerate(range(start, min(start + bpw, num_bands)))
    ]
    expr = parts[0]
    for p in parts[1:]:
        expr = expr.bitwiseOR(p)
    return expr


def _hamming_min_match_bits(
    threshold: float, band_rows: int, num_bands: int, z: float = 7.0
) -> int:
    """Minimum matching sign-bits a candidate pair must show to be
    worth the exact-cosine rescore. For a pair at angle theta each of
    the r*b hyperplane bits matches independently with
    p = 1 - theta/pi (the SimHash identity), so matched bits ~
    Binomial(r*b, p): a pair AT the cosine threshold sits at
    mu = r*b*p with sigma = sqrt(r*b*p*(1-p)), while a RANDOM
    (near-orthogonal) pair sits at r*b/2. The bound mu - z*sigma with
    z = 7 keeps the per-pair false-drop probability below ~1e-12 —
    nine orders of magnitude under the banding scheme's own miss rate
    (e.g. 3.6e-3 at cosine 0.9, r=16, b=64) — while rejecting random
    collisions at ~18 sigma. Conditioning on the banding collision
    that MADE the pair a candidate only shifts its matched-bit count
    UP, so the unconditional bound is conservative."""
    return _min_match_bits(band_rows * num_bands, threshold, z)


def _min_match_bits(total_bits: int, threshold: float, z: float = 7.0) -> int:
    """``_hamming_min_match_bits`` generalized to any bit count — the
    sampled prefilter prices its bound over the subset of signature
    bits it actually carries."""
    import math

    p = 1.0 - math.acos(max(-1.0, min(1.0, float(threshold)))) / math.pi
    mu = total_bits * p
    sigma = math.sqrt(total_bits * p * (1.0 - p)) if 0.0 < p < 1.0 else 0.0
    return max(0, int(math.floor(mu - z * sigma)))


def _sampled_prefilter_plan(
    threshold: float, band_rows: int, num_bands: int
) -> tuple[list[int], int] | None:
    """The in-join sampled-bits stage of the Hamming prefilter: which
    two packed signature words to carry through the bucket self-join,
    and the max sampled Hamming distance a candidate may show.

    WHY A STAGE BEFORE THE FULL PREFILTER EXISTS (r15, measured): past
    the words-table broadcast cap the full prefilter joins the raw
    collision stream against the packed-word table — at the 1000x rung
    (2M vectors, ~2e8-2e9 random collisions at the default/knob
    settings) the sort-merge join carried ~37 signature longs per raw
    collision row and sort-spilled ~70 GB before dying on ENOSPC. Two
    words (16 bytes) carried ON the band rows instead filter the
    stream INSIDE the bucket-join stage, before any exchange: at
    threshold 0.9 the 7-sigma bound over ~120-128 sampled bits sits
    ~3 sigma above a random pair's mean, killing ~99.7-99.9% of random
    collisions for ~16 bytes/row of extra shuffle. The full-signature
    filter (and the exact rescore) still run on the survivors — this
    stage only ever drops pairs, with the same z=7 per-TRUE-pair
    false-drop bound (~1e-12) the full filter carries, so the recall
    discipline is unchanged.

    Returns None when the sampled bound cannot separate true pairs
    from random ones (low thresholds: the bound lands above the random
    mean and would keep everything) or when the signature packs into
    <3 words (the full filter is already narrow) — callers then skip
    the stage entirely, keeping the pre-r15 plan shape."""
    import math

    bpw = max(1, 64 // band_rows)
    n_words = (num_bands + bpw - 1) // bpw
    if n_words < 3:
        return None
    word_idxs = [0, n_words // 2]
    bands_in = sum(
        min(bpw, num_bands - w * bpw) for w in word_idxs
    )
    bits = bands_in * band_rows
    max_ham = bits - _min_match_bits(bits, threshold)
    # arm only when the bound sits >= 2 sigma below a random pair's
    # mean Hamming (bits/2, sigma = sqrt(bits)/2) — i.e. when the
    # stage actually kills the bulk of random collisions
    if max_ham >= bits / 2.0 - math.sqrt(bits):
        return None
    return word_idxs, max_ham


def _rescored(candidates: DataFrame, embeddings: DataFrame) -> DataFrame:
    """Exact cosine for each candidate pair (JVM-side zip_with dot).

    Norms are computed ONCE PER ROW on each join input and carried
    through the exchange, so per-PAIR work is one dot + one divide —
    ``cosine_similarity_col`` inline would re-aggregate both 64-element
    norms per pair (and the when() guard duplicates its den subtree:
    these HOF aggregates evaluate interpreted, so that's ~5x the
    arithmetic on the candidate-pair hot path). Same expressions in
    the same order, just hoisted — bit-identical results, pinned by
    the unchanged r6 oracle hashes."""
    v = F.col("embedding").cast("array<double>")
    a = embeddings.select(
        F.col("vec_id").alias("id_a"),
        v.alias("va"),
        l2_norm_col(v).alias("_na"),
    )
    b = embeddings.select(
        F.col("vec_id").alias("id_b"),
        v.alias("vb"),
        l2_norm_col(v).alias("_nb"),
    )
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den == 0.0, F.lit(0.0)).otherwise(
        dot_col(F.col("va"), F.col("vb")) / den
    )
    return (
        candidates.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("cosine", cos)
        .drop("va", "vb", "_na", "_nb")
    )


# Size cap for broadcasting the packed-signature word table into the
# Hamming prefilter joins (raw row-bytes estimate; ~64 MB covers ~3M
# 1024-bit signatures). Past it the words join distributed — at that
# corpus size the production move is raising band_rows anyway.
_SIG_WORDS_BROADCAST_CAP = 64 << 20

# Below this many vectors the Hamming prefilter is pure overhead and
# is skipped: the random-collision rescore volume it exists to kill is
# ~b * 2^-r * n^2 / 2 pairs (module docstring) — ~2k pairs at n=2k,
# sub-second to rescore directly — while the prefilter's fixed cost
# (two word joins + a post-filter distinct + the wide packed-word
# codegen) measured ~1.8 s at the sf0.1 ladder 1x rung (t1x 0.79 ->
# 2.59 s with it always-on). At the threshold (~16k vectors, ~125k
# random pairs at r=16/b=64) the rescore cost and the prefilter's
# fixed cost are the same order; past it the prefilter wins and its
# advantage grows with n^2 (the 100x rung: 63.7 -> 16.9 s).
_HAMMING_PREFILTER_MIN_VECTORS = 16_384


def simhash_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.45,
    dim: int = 64,
    band_rows: int = 6,
    num_bands: int = 96,
    seed: int = 42,
    max_bucket_size: int = 256,
    hamming_prefilter: bool | None = None,
    n_hint: int | None = None,
    allow_quadratic: bool = False,
) -> DataFrame:
    """Embedding near-dup pairs via SimHash candidates + exact rerank.
    Replaces the all-pairs broadcast O(n^2) plan: the corpus is never
    crossed with itself, only bucket-mates meet in the join.

    ``max_bucket_size`` is the hot-bucket cap (see MinHash's twin):
    buckets up to the cap expand all-pairs exactly; hotter buckets emit
    rank-gap chain edges, so a mega-cluster's PAIR list is partial but
    its connected-component (the dedup outcome) is identical. Raise it
    when exact pair enumeration inside huge clusters matters more than
    the quadratic cost.

    HAMMING PREFILTER (the r13 scale fix): the dominant 100x-rung cost
    was exact-rescoring the ~b * 2^-r * n^2 / 2 RANDOM band collisions
    — 39M candidate pairs at the 200k-vector rung, 110 of 98 s, zero
    survivors at 0.9. Before any embedding travels, each candidate
    pair now compares its FULL r*b-bit signature (packed into long
    columns from the already-checkpointed key arrays —
    ``_packed_sig_words``) with pure codegen xor+bit_count; pairs
    below ``_hamming_min_match_bits`` (a 7-sigma Binomial bound, see
    its docstring for why it cannot meaningfully dent recall) are
    dropped before the 64-double join + interpreted dot product. A
    random collision sits ~18 sigma below the bound, so the rescore
    sees ~only true pairs; the signature matmul already paid for
    every bit this filter reads. ``hamming_prefilter=None`` (default)
    arms it by corpus size (``_HAMMING_PREFILTER_MIN_VECTORS`` — below
    it the filter's fixed cost exceeds the rescore it saves);
    True/False pin a regime (tests pin True to exercise the filter on
    small planted fixtures). Output is identical in every regime — the
    prefilter only ever drops pairs the exact filter rejects.

    STAGED since r15: when the threshold is high enough for ~2 words
    of sampled signature bits to separate true pairs from random
    collisions (``_sampled_prefilter_plan``), those 16 bytes ride the
    band rows and kill the random collisions INSIDE the bucket-join
    stage — the raw collision stream never reaches an exchange. The
    1000x ladder rung measured why: without the stage, the word joins
    past the broadcast cap sort-merge-joined the raw collision stream
    (~37 longs per row), sort-spilled ~70 GB and died on ENOSPC; with
    it, only survivors (~true pairs + a ~0.1-0.3% sigma tail) shuffle.
    Both stages carry the same z=7 per-true-pair false-drop bound.

    SIZE-GATED since r16: banding at fixed r has a measured-quadratic
    collision count (SCALE_LADDER.json three_decades: 1.95e9 = b*2^-r*
    n^2/2 collisions = ~500 of 522 s at the 2M-vector rung; the priced
    r-growth knob is ~neutral there, and LSH theory floors
    recall-holding banding at Theta(n^(1+rho))). Past
    ``_AUTO_NEARDUP_MAX_SIMHASH_VECTORS`` — the measured crossover
    where the linear learned-cell family wins — this function REFUSES
    unless ``allow_quadratic=True`` (then it warns and proceeds: the
    quadratic term is collision COUNT, priced at ~260 ns/collision by
    the ladder, so an informed caller can budget it). The routed front
    door is ``embedding_neardup_auto``, which picks the linear family
    automatically. ``n_hint`` skips the corpus count when the caller
    already knows it (the router threads its own count through)."""
    # the size-gated regimes (quadratic-refusal + prefilter arming)
    # are resolved BEFORE the candidate plan is shaped: sig's eager
    # checkpoint makes the count a cached-rows read, and the sampled
    # in-join stage's payload words should ride the band rows only
    # when the prefilter will actually run (a small-corpus call must
    # keep the exact pre-prefilter plan).
    sig = _simhash_sig(embeddings, dim, band_rows, num_bands, seed)
    n_vecs = int(n_hint) if n_hint is not None else sig.count()
    if n_vecs >= _AUTO_NEARDUP_MAX_SIMHASH_VECTORS:
        if not allow_quadratic:
            raise ValueError(
                f"simhash_neardup_pairs: {n_vecs} vectors is past the "
                f"measured ~{_AUTO_NEARDUP_MAX_SIMHASH_VECTORS} "
                "crossover where fixed-r banding's b*2^-r*n^2/2 random-"
                "collision term dominates (SCALE_LADDER.json "
                "three_decades: 1.95e9 collisions = ~500 of 522 s at "
                "2M vectors; the priced r-growth knob is ~neutral). "
                "Use embedding_neardup_auto (routes to the linear "
                "learned-cell family past the crossover), or pass "
                "allow_quadratic=True to accept the quadratic term."
            )
        import warnings

        warnings.warn(
            f"simhash_neardup_pairs on {n_vecs} vectors: expected "
            f"~{num_bands * 2.0 ** -band_rows * n_vecs * n_vecs / 2:.2e}"
            " random band collisions (~260 ns each, measured) — the "
            "quadratic regime; embedding_neardup_auto routes past it.",
            stacklevel=2,
        )
    if hamming_prefilter is None:
        hamming_prefilter = n_vecs >= _HAMMING_PREFILTER_MIN_VECTORS
    # the sampled stage (see _sampled_prefilter_plan) is priced purely
    # from (threshold, r, b); its two words ride the band rows so the
    # raw collision stream is filtered INSIDE the bucket-join stage
    plan = (
        _sampled_prefilter_plan(threshold, band_rows, num_bands)
        if hamming_prefilter
        else None
    )
    cands, sig = _self_join_candidates(
        embeddings, dim, band_rows, num_bands, seed, max_bucket_size,
        distinct=False,  # dedup AFTER the prefilter: the distinct's
        # exchange then moves surviving pairs, not every raw collision
        payload_words=plan[0] if plan else None,
        sig=sig,
    )
    if not hamming_prefilter:
        # small-corpus regime: the rescore volume the prefilter kills
        # is quadratically small here; its fixed cost dominates (see
        # the constant's comment). Identical output either way — the
        # prefilter only ever drops pairs the exact filter rejects.
        pre = cands.select("id_a", "id_b").distinct()
    else:
        if plan:
            word_idxs, max_ham_sampled = plan
            sampled_ham = sum(
                F.bit_count(
                    F.col(f"_s{w}_a").bitwiseXOR(F.col(f"_s{w}_b"))
                ).cast("int")
                for w in word_idxs
            )
            # filter + distinct BEFORE the full-word joins: the
            # survivors (~true pairs + the sampled bound's sigma tail)
            # are what shuffles, never the raw collision stream — at
            # the 1000x rung that is the difference between a ~16-byte
            # wider band shuffle and a ~70 GB ENOSPC sort-spill
            cands = (
                cands.filter(sampled_ham <= F.lit(max_ham_sampled))
                .select("id_a", "id_b")
                .distinct()
            )
        words = sig.select(
            "doc_id", *_packed_sig_words(band_rows, num_bands)
        )
        n_words = len(words.columns) - 1
        wa = words.select(
            F.col("doc_id").alias("id_a"),
            *[F.col(f"_w{i}").alias(f"_wa{i}") for i in range(n_words)],
        )
        wb = words.select(
            F.col("doc_id").alias("id_b"),
            *[F.col(f"_w{i}").alias(f"_wb{i}") for i in range(n_words)],
        )
        # Under the cap both word joins are map-side (the candidate
        # stream never shuffles for them); past it they fall back to
        # the distributed join — which the sampled stage above has by
        # then shrunk to survivors only (with AQE free to broadcast
        # the small side at runtime), the shape that survives the
        # third decade.
        if n_vecs * (n_words + 1) * 8 <= _SIG_WORDS_BROADCAST_CAP:
            wa, wb = F.broadcast(wa), F.broadcast(wb)
        hamming = sum(
            F.bit_count(
                F.col(f"_wa{i}").bitwiseXOR(F.col(f"_wb{i}"))
            ).cast("int")
            for i in range(n_words)
        )
        max_ham = band_rows * num_bands - _hamming_min_match_bits(
            threshold, band_rows, num_bands
        )
        pre = (
            cands.join(wa, "id_a")
            .join(wb, "id_b")
            .filter(hamming <= F.lit(max_ham))
            .select("id_a", "id_b")
        )
        if not plan:
            pre = pre.distinct()
    return (
        _rescored(pre, embeddings)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _kmeans_once(
    X: "np.ndarray", k: int, rng: "np.random.Generator", max_iter: int
) -> tuple["np.ndarray", float]:
    """One kmeans++-seeded Lloyd's run; returns (centroids, inertia).
    Distances use the |x|^2 + |c|^2 - 2x.c expansion (an (n x k)
    matrix + one matmul, never an (n x k x dim) tensor). Empty cells
    re-seed from the point farthest from its nearest centroid."""
    n = len(X)
    # kmeans++ seeding with the same |x|^2 + |c|^2 - 2x.c expansion as
    # the Lloyd loop below: each step is one BLAS matvec instead of
    # materializing an (n x dim) difference temporary — the naive form
    # made seeding O(k) 50 MB allocations per restart and dominated
    # the whole fit at the ladder's scaled-centroid regime (k ~ 1600:
    # ~320 s of 404 s). Clamped at 0 (the expansion can go epsilon-
    # negative, and rng.choice requires a non-negative pmf).
    x2f = (X ** 2).sum(axis=1)

    def _d2_to(idx: int) -> "np.ndarray":
        return np.maximum(x2f + x2f[idx] - 2.0 * (X @ X[idx]), 0.0)

    chosen = [int(rng.integers(n))]
    d2 = _d2_to(chosen[0])
    for _ in range(1, k):
        total = float(d2.sum())
        if total <= 0.0:  # all remaining points identical
            nxt = int(rng.integers(n))
        else:
            nxt = int(rng.choice(n, p=d2 / total))
        chosen.append(nxt)
        d2 = np.minimum(d2, _d2_to(nxt))
    C = X[chosen].astype(np.float64).copy()
    x2 = (X ** 2).sum(axis=1)[:, None]
    d = None
    for _ in range(int(max_iter)):
        d = x2 + (C ** 2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        a = d.argmin(axis=1)
        # cluster means by stable-sort + segmented reduceat: one
        # O(n log n) argsort and ONE contiguous pass over X. The
        # obvious per-cluster loop (`for j in range(k): X[a == j]`)
        # rescans all n rows PER CLUSTER — O(n*k) per Lloyd iteration,
        # it dominated the 100x ladder fit by minutes; np.add.at is an
        # unbuffered ufunc an order of magnitude slower than the
        # sorted pass; per-dim bincount pays k-independent per-call
        # overhead that dominates the small-k fits every production
        # query runs
        order = np.argsort(a, kind="stable")
        sorted_a = a[order]
        starts = np.flatnonzero(
            np.r_[True, sorted_a[1:] != sorted_a[:-1]]
        )
        seg_sums = np.add.reduceat(X[order], starts, axis=0)
        uniq = sorted_a[starts]
        sums = np.zeros_like(C)
        sums[uniq] = seg_sums
        counts = np.zeros(k)
        counts[uniq] = np.diff(np.r_[starts, len(sorted_a)])
        newC = np.where(
            counts[:, None] > 0, sums / np.maximum(counts, 1.0)[:, None], C
        )
        empty = np.flatnonzero(counts == 0)
        if len(empty):
            # re-seed every empty cell from the points farthest from
            # their nearest centroid (distinct points, worst first)
            far = np.argsort(-d.min(axis=1))[: len(empty)]
            newC[empty] = X[far]
        if np.allclose(newC, C):
            C = newC
            break
        C = newC
    d = x2 + (C ** 2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
    return C, float(np.maximum(d.min(axis=1), 0.0).sum())


def _kmeans_fit(
    X: "np.ndarray", k: int, seed: int, max_iter: int, nredo: int = 4
) -> "np.ndarray":
    """Seeded Lloyd's over the DRIVER-side training sample — the FAISS
    coarse-quantizer discipline: the trainer's input is
    O(k x train_per_centroid) rows BY CONSTRUCTION (a broadcast-
    scalar-sized problem, like a join's build side), so a local
    vectorized fit replaces ~maxIter distributed jobs of scheduler
    overhead with milliseconds of numpy. ``nredo`` independent
    kmeans++ restarts keep the best-inertia run (FAISS's own guard
    against a bad local optimum — a single greedy seeding can cost
    real partial-probe recall). Deterministic for a given
    (sample, k, seed).

    ``nredo`` scales DOWN as k grows (2048/k, floor 1): restart
    variance is per-cell seeding luck averaged over k cells, so the
    inertia spread across restarts shrinks with k — at the scaled-
    centroid regime (k ~ 1600 at the 100x ladder rung) extra restarts
    buy ~nothing and each costs a full O(n*k) Lloyd run (FAISS ships
    nredo=1 at every k for the same reason); at small k, where one
    bad greedy seeding can really cost recall, all ``nredo`` restarts
    still run.

    Past ``_HIER_K_THRESHOLD`` centroids the fit goes TWO-LEVEL
    (``_kmeans_fit_hierarchical``): the flat Lloyd cost is O(n*k) per
    iteration, and under the scaled-centroid discipline (k ~ n/125,
    sample ~ 64*k) that term is quadratic in the corpus — the honest
    scale limit the 100x ladder exposed (r11: 404 s of driver numpy
    at k=1600 before vectorization, ~24 s after, still the dominant
    share of semantic_dedup's t100x). The two-level fit trains
    ceil(sqrt(k)) top cells, partitions the sample once, and fits
    per-cell sub-quantizers — O(n*sqrt(k)) per iteration, the
    standard FAISS/IVF multi-level coarse-trainer shape. Quality is
    near-flat's (each sub-fit is a full kmeans++ Lloyd on its cell;
    the only constraint is the top-level partition), pinned by the
    inertia-ratio test in tests/test_semdedup.py."""
    from ..functions.blas import limit_blas_threads

    # r16: the fit's matrices are bounded-sample-sized by construction,
    # where OpenBLAS's default all-cores pool costs 25x the math in
    # thread fan-out/sync (see functions/blas.py; measured 2.5 s -> 0.10 s
    # per k=64 fit on the 32-core bench host)
    limit_blas_threads()
    n = len(X)
    k = max(1, min(int(k), n))
    if k > _HIER_K_THRESHOLD:
        return _kmeans_fit_hierarchical(X, k, seed, max_iter)
    rng = np.random.default_rng(seed)
    best, best_inertia = None, float("inf")
    for _ in range(max(1, min(int(nredo), 2048 // k))):
        C, inertia = _kmeans_once(X, k, rng, max_iter)
        if inertia < best_inertia:
            best, best_inertia = C, inertia
    return best


# Flat Lloyd is O(n*k)/iter; two-level is O(n*sqrt(k))/iter. The
# crossover where the (n x k) distance matrix also stops fitting
# comfortably in driver memory sits around a few hundred centroids.
_HIER_K_THRESHOLD = 512


def _proportional_alloc(counts: "np.ndarray", k: int) -> "np.ndarray":
    """Allocate ``k`` sub-centroid slots across top-level cells
    PROPORTIONAL TO CELL MASS (largest-remainder rounding): at least 1
    per non-empty cell, never more than the cell's point count, total
    exactly ``k`` whenever sum(counts) >= k (else sum(counts) — the
    "n_distinct-ish" shortfall case). The remainder loop iterates only
    cells that still have spare points and re-scans until placed —
    a bounded tile here could exit with remainder unplaced while
    spare capacity sat concentrated in a few cells (r11 ADVICE #5),
    silently breaking the exactly-k contract. Shared by the driver
    two-level trainer and the distributed coarse quantizer so their
    allocation semantics cannot drift."""
    counts = np.asarray(counts, dtype=np.int64)
    quota = k * counts / max(1, counts.sum())
    k2 = np.minimum(np.floor(quota).astype(int), counts)
    k2 = np.maximum(k2, (counts > 0).astype(int))
    rem = k - int(k2.sum())
    if rem > 0:
        order = np.argsort(-(quota - np.floor(quota)))
        while rem > 0:
            spare = [j for j in order if k2[j] < counts[j]]
            if not spare:
                break
            for j in spare:
                if rem <= 0:
                    break
                k2[j] += 1
                rem -= 1
    elif rem < 0:
        order = np.argsort(quota - np.floor(quota))
        while rem < 0:
            shrinkable = [
                j for j in order if k2[j] > (1 if counts[j] > 0 else 0)
            ]
            if not shrinkable:
                break
            for j in shrinkable:
                if rem >= 0:
                    break
                k2[j] -= 1
                rem += 1
    return k2


def _kmeans_fit_hierarchical(
    X: "np.ndarray", k: int, seed: int, max_iter: int
) -> "np.ndarray":
    """Two-level coarse quantizer for large k (see _kmeans_fit): fit
    k1 = ceil(sqrt(k)) top-level cells, assign the sample once, then
    fit k2_j sub-centroids inside each top cell with k2_j allocated
    PROPORTIONAL TO CELL MASS (largest-remainder rounding, at least 1
    per non-empty cell, never more than the cell's point count) so
    dense regions get finer cells — the same pricing logic as the
    global k ~ n/125 discipline, applied within the sample. Exactly
    min(k, n_distinct-ish) centroids come back (shortfalls from tiny
    cells are redistributed to cells with spare points). Deterministic
    for (sample, k, seed): each sub-fit is seeded seed+j+1."""
    n = len(X)
    k1 = int(np.ceil(np.sqrt(k)))
    top = _kmeans_fit(X, k1, seed, max_iter)  # k1 <= threshold: flat
    d = (
        (X ** 2).sum(axis=1)[:, None]
        + (top ** 2).sum(axis=1)[None, :]
        - 2.0 * (X @ top.T)
    )
    a = d.argmin(axis=1)
    counts = np.bincount(a, minlength=len(top))
    k2 = _proportional_alloc(counts, k)
    parts = []
    for j in range(len(top)):
        if counts[j] == 0 or k2[j] == 0:
            continue
        members = X[a == j]
        if k2[j] == 1:
            parts.append(members.mean(axis=0)[None, :])
        else:
            parts.append(
                _kmeans_fit(members, int(k2[j]), seed + j + 1, max_iter)
            )
    return np.concatenate(parts, axis=0)


def bounded_training_sample(
    embeddings: DataFrame,
    target: int,
    seed: int,
    n_hint: int | None = None,
    col: str = "embedding",
) -> "np.ndarray":
    """Collect a DRIVER-side training sample of ~``target`` vectors,
    bounded at 4x target no matter what (the shared quantizer-training
    discipline of ``ivf_index`` and ``pq.pq_train``). The
    small-vs-large decision does NOT pay a full corpus count: an
    early-terminating ``take`` probe (CollectLimit's incremental job —
    one task at toy scale, a handful at 100 TB, never a task per file
    split) checks whether the corpus exceeds 4x the target; at or
    below it the whole corpus IS the sample. Above it, the exact
    count (skipped when the caller passes ``n_hint``) prices the
    Bernoulli sampling fraction. A hint is advisory, never trusted
    with an unbounded collect: the probe stays limit-capped, and
    hitting the cap falsifies the hint and falls through to sampling
    with the hint discarded."""
    emb_arr = F.col(col).cast("array<double>").alias("e")
    target = int(target)
    cap = 4 * target + 1
    fit_rows = None
    if n_hint is not None:
        small = n_hint <= 4 * target
        if small:
            probed = embeddings.select(emb_arr).limit(cap).collect()
            if len(probed) < cap:
                fit_rows = probed
            else:
                small = False
                n_hint = None
    else:
        # probe and fetch in ONE early-terminating job: under the cap,
        # these rows ARE the whole corpus = the training set; at the
        # cap, the corpus is large and we fall through to Bernoulli
        # sampling. The fetch is bounded at 4x the training sample —
        # proportionate to what the fit collects anyway.
        probed = embeddings.select(emb_arr).limit(cap).collect()
        small = len(probed) < cap
        if small:
            fit_rows = probed
    if fit_rows is None:
        n = n_hint if n_hint is not None else embeddings.count()
        # 1.05x: Bernoulli sampling undershoots the expectation about
        # half the time; the pad keeps the realized sample at/above
        # the budget with near-certainty
        fit_rows = (
            embeddings.sample(min(1.0, 1.05 * target / n), seed=seed)
            .select(emb_arr)
            .collect()
        )
    return np.asarray([r["e"] for r in fit_rows], dtype=np.float64)


def nearest_centroid_col(centroids: list[list[float]]) -> "F.Column":
    """0-based index of the nearest centroid (L2) for the row's
    ``embedding`` — one Arrow-batched vectorized pandas UDF: the whole
    batch assigns with a single (n x k) matmul against the closed-over
    centroid matrix (|c|^2 - 2x.c; the |x|^2 term is constant per row
    and cannot move the argmin). This is the justified-pandas_udf case
    (same discipline as the SimHash signature matmul): the equivalent
    builtin expression is a higher-order transform/aggregate chain,
    which Catalyst evaluates INTERPRETED with per-row array
    allocation, not codegen — measured slower than the Arrow round
    trip. No shuffle either way: assignment stays a map pass. Ties
    resolve to the lowest centroid id (numpy argmin takes the first
    minimum)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c2 = (C ** 2).sum(axis=1)

    @pandas_udf("int")
    def _nearest(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="int32")
        X = np.stack([np.asarray(v, dtype=np.float64) for v in col])
        d = c2[None, :] - 2.0 * (X @ C.T)
        return pd.Series(d.argmin(axis=1).astype(np.int32))

    return _nearest(F.col("embedding").cast("array<double>"))


# Past this many centroids, shipping the whole centroid set driver-side
# (pandas-UDF closure / plan literal) stops scaling: the k ~ n/125 cell
# policy makes k grow LINEARLY with the corpus, so at ~1e8+ vectors the
# centroid array alone is hundreds of MB of driver memory and literal —
# the plan stops compiling long before the executors hurt. Above the
# cap the semantic family switches to the DISTRIBUTED two-level
# quantizer below: the driver only ever holds the ~sqrt(k) top-level
# centroids; the full centroid set lives in a DataFrame and assignment
# is a cogroup join, not a broadcast matmul. Production queries
# (k <= 256 everywhere) never cross the cap and stay bit-identical.
_LITERAL_K_CAP = 1024

# Top-level cell-count ceiling for the distributed trainer: ceil(sqrt(k))
# up to this bound, so the one remaining driver-side array is at most
# 4096 x dim — fixed, corpus-independent. 4096 top cells support
# k ~ 16M sub-centroids (k ~ n/125 => a ~2e9-vector corpus) before the
# EXPECTED top cell exceeds the sub-fit task budget.
_TOP_CELL_CAP = 4096


def distributed_coarse_quantizer(
    embeddings: DataFrame,
    k: int,
    seed: int = 42,
    max_iter: int = 10,
    train_per_centroid: int = 128,
    n_hint: int | None = None,
) -> tuple[list[list[float]], DataFrame]:
    """Two-level coarse quantizer whose driver cost is CORPUS-
    INDEPENDENT (VERDICT r11 task 2 — the scale path past
    ``_LITERAL_K_CAP``): returns (top_centroids, sub_centroids_df).

    - ``top_centroids``: k1 = min(ceil(sqrt(k)), 4096) cell centers,
      sample-trained on the driver (``bounded_training_sample`` —
      k1 x train_per_centroid rows, bounded regardless of corpus
      size). This is the ONLY centroid array the driver ever holds.
    - ``sub_centroids_df``: (top_id, centroid_id, centroid) — the full
      k centroids as a DATAFRAME, trained DISTRIBUTED: a Bernoulli
      sample of the corpus (k x train_per_centroid rows total, never
      collected) is top-assigned with one Arrow map pass, then each
      top cell's sub-centroids are fit in parallel by one
      ``applyInPandas`` task running the shared numpy kmeans on its
      cell's sample (rows sorted by vec_id inside the task so the fit
      is deterministic under Spark's arbitrary group-row order).
      Sub-slots are allocated proportional to cell mass
      (``_proportional_alloc`` — the same largest-remainder policy as
      the driver two-level trainer), and ``centroid_id`` is globally
      unique and deterministic: cell j's ids occupy
      [cumsum(k2)[j-1], cumsum(k2)[j]).

    The frame is localCheckpoint-ed: every consumer (assignment,
    keeper scoring) references it without re-running the sample + fit.

    Scale shape: driver memory O(sqrt(k) x dim + k1) — NOT O(k x dim);
    executor work O(sample x sqrt(k)) for top assignment plus
    independent per-cell fits; the corpus itself is touched only by
    the one sampling pass here (assignment is the caller's pass).
    ``train_per_centroid`` prices the distributed sample at k x tpc
    rows and each sub-fit task at ~tpc x k/k1 rows: under the
    k ~ n/125 cell policy, tpc=128 samples ~n (fine through the
    measured rungs); corpora big enough to make that sampling pass
    hurt should tune tpc down toward the FAISS-common 32 — per-task
    load then bounds at 32 x k/k1 (~131k rows at the k1=4096 cap)
    and quality degrades gracefully (each centroid still sees ~32
    training points)."""
    spark = embeddings.sparkSession
    import pandas as pd

    k = int(k)
    k1 = int(min(max(int(np.ceil(np.sqrt(k))), 2), _TOP_CELL_CAP))
    Xtop = bounded_training_sample(
        embeddings, int(train_per_centroid) * k1, seed, n_hint=n_hint
    )
    k1 = min(k1, max(1, len(Xtop)))
    top = _kmeans_fit(Xtop, k1, seed, max_iter)
    # Same order-preserving duplicate-centroid guard as ivf_index: a
    # duplicate-heavy sample with fewer distinct vectors than k1 can
    # yield bitwise-identical TOP centroids, and GEMM's batch-shape-
    # dependent tie accumulation would then co-assign identical vectors
    # to DIFFERENT top cells — band keys diverge and exact duplicates
    # (this operator's target workload) are missed. Dedupe shrinks k1;
    # a no-op for continuous embeddings, so existing labelings hold.
    _, _uidx = np.unique(top, axis=0, return_index=True)
    if len(_uidx) < len(top):
        top = top[np.sort(_uidx)]
        k1 = len(top)
    top_list = top.tolist()

    n = int(n_hint) if n_hint is not None else embeddings.count()
    target = k * int(train_per_centroid)
    frac = min(1.0, 1.05 * target / max(1, n))
    samp = (
        embeddings.sample(fraction=frac, seed=seed)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
        .withColumn("_top", nearest_centroid_col(top_list))
    )
    # k1 rows to the driver — prices the per-cell slot allocation
    cell_counts = {
        int(r["_top"]): int(r["cnt"])
        for r in samp.groupBy("_top").agg(F.count("*").alias("cnt")).collect()
    }
    counts = np.zeros(len(top_list), dtype=np.int64)
    for j, c in cell_counts.items():
        counts[j] = c
    k2 = _proportional_alloc(counts, k)
    offsets = np.concatenate([[0], np.cumsum(k2)[:-1]])
    plan = {
        int(j): (int(k2[j]), int(offsets[j]))
        for j in range(len(k2))
        if k2[j] > 0
    }
    fit_seed, fit_iter = int(seed), int(max_iter)

    def _fit_cell(pdf: "pd.DataFrame") -> "pd.DataFrame":
        j = int(pdf["_top"].iloc[0])
        kj, off = plan.get(j, (0, 0))
        if kj <= 0:
            return pd.DataFrame(
                {"top_id": [], "centroid_id": [], "centroid": []}
            ).astype({"top_id": "int32", "centroid_id": "int64"})
        # Fit on UNIQUE rows: duplicate training points (a duplicate-
        # heavy corpus is exactly what this operator exists for) would
        # otherwise yield bitwise-identical centroids, and GEMM's
        # column-position-dependent accumulation means two identical
        # centroid columns can score ulps APART in one matmul — the
        # argmin tie between them then resolves differently for
        # different assignment batch shapes, breaking the invariant
        # that identical vectors co-assign (observed: the same vector
        # assigned to each of two identical centroids from two frames).
        # np.unique also canonicalizes row order, so the kmeans++
        # seeding sees a deterministic X for (sample, seed) regardless
        # of Spark's group-row order. Distinct-centroid sub-ulp ties
        # remain measure-zero for continuous embeddings.
        X = np.unique(
            np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            ),
            axis=0,
        )
        kj = min(kj, len(X))
        if kj == 1:
            C = X.mean(axis=0)[None, :]
        else:
            C = _kmeans_fit(X, kj, fit_seed + j + 1, fit_iter)
        return pd.DataFrame(
            {
                "top_id": np.full(len(C), j, dtype=np.int32),
                "centroid_id": off + np.arange(len(C), dtype=np.int64),
                "centroid": list(C),
            }
        )

    sub = (
        samp.groupBy("_top")
        .applyInPandas(
            _fit_cell,
            "top_id int, centroid_id long, centroid array<double>",
        )
        .localCheckpoint(eager=True)
    )
    return top_list, sub


def assign_cells_scalable(
    embeddings: DataFrame,
    top_centroids: list[list[float]],
    sub_centroids: DataFrame,
    id_col: str = "vec_id",
    with_sim: bool = False,
) -> DataFrame:
    """Nearest-centroid assignment against a centroid TABLE — the
    plan-literal-free twin of ``nearest_centroid_col`` for quantizers
    past ``_LITERAL_K_CAP``. Returns (id_col, centroid_id[, cell_sim]).

    Two stages: (1) one Arrow map pass assigns each vector to its
    top-level cell (the only centroid array in the plan — bounded at
    4096 x dim); (2) a COGROUP on the top cell id pairs each cell's
    vectors with that cell's sub-centroids and takes the argmin with
    one local matmul per group — the corpus shuffles ONCE on the top
    id, the centroid table shuffles alongside (k rows — tiny), and no
    executor ever sees more than one cell's centroids. Ties resolve
    to the lowest centroid_id (sub-frame sorted, numpy argmin takes
    the first minimum) — the same convention as the literal path.

    A vector whose top cell holds no trained sub-centroid (possible
    when the training sample missed a sparse cell) gets the SENTINEL
    cell ``-top_id - 1``: deterministic, distinct per top cell, and
    still a valid band key — such vectors band with their top-cell
    peers and every emitted pair is exact-verified downstream, so the
    fallback can only affect recall, never correctness. Their
    ``cell_sim`` is 1.0 (the prototype score: never preferred by the
    far-from-centroid keeper; ties break on id as everywhere).

    ``with_sim`` adds the cosine of each vector to its own centroid —
    the far_from_centroid keeper's score — computed in the same local
    matmul instead of a second pass against a centroid literal."""
    import pandas as pd

    sim_field = ", cell_sim double" if with_sim else ""
    schema = f"{id_col} long, centroid_id long{sim_field}"

    def _assign(key, vecs: "pd.DataFrame", cents: "pd.DataFrame"):
        if not len(vecs):
            cols = {id_col: [], "centroid_id": []}
            if with_sim:
                cols["cell_sim"] = []
            return pd.DataFrame(cols)
        top_id = int(key[0])
        ids = vecs[id_col].to_numpy()
        if not len(cents):
            out = {
                id_col: ids,
                "centroid_id": np.full(
                    len(ids), -top_id - 1, dtype=np.int64
                ),
            }
            if with_sim:
                out["cell_sim"] = np.ones(len(ids))
            return pd.DataFrame(out)
        cents = cents.sort_values("centroid_id", kind="stable")
        C = np.stack(
            [np.asarray(c, dtype=np.float64) for c in cents["centroid"]]
        )
        cid = cents["centroid_id"].to_numpy()
        X = np.stack(
            [np.asarray(v, dtype=np.float64) for v in vecs["embedding"]]
        )
        d = (C ** 2).sum(axis=1)[None, :] - 2.0 * (X @ C.T)
        a = d.argmin(axis=1)
        out = {id_col: ids, "centroid_id": cid[a]}
        if with_sim:
            own = C[a]
            denom = np.linalg.norm(X, axis=1) * np.linalg.norm(own, axis=1)
            num = (X * own).sum(axis=1)
            out["cell_sim"] = np.where(denom > 0.0, num / np.maximum(denom, 1e-300), 0.0)
        return pd.DataFrame(out)

    staged = embeddings.select(
        id_col,
        F.col("embedding").cast("array<double>").alias("embedding"),
        nearest_centroid_col(top_centroids).alias("_top"),
    )
    return (
        staged.groupBy("_top")
        .cogroup(sub_centroids.groupBy("top_id"))
        .applyInPandas(_assign, schema)
    )


def ivf_index(
    embeddings: DataFrame,
    n_centroids: int = 16,
    seed: int = 42,
    max_iter: int = 10,
    train_per_centroid: int = 256,
    n_hint: int | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF coarse quantizer: KMeans centroids + per-vector nearest-
    centroid assignment (Euclidean — the standard IVF cell geometry).
    Returns (assignments(vec_id, centroid_id), centroids) — the
    centroid list is tiny (k x dim) and travels as a plan literal,
    never a shuffle.

    SAMPLE-trained, full-corpus-assigned (the FAISS discipline): the
    coarse quantizer only needs enough points to place k cell centers
    — ``train_per_centroid x n_centroids`` of them — so the fit runs
    on a bounded sample ON THE DRIVER (``_kmeans_fit``: the sample is
    broadcast-scalar-sized by construction) and the FULL corpus is
    touched exactly once, by the assignment projection
    (``nearest_centroid_col`` — one codegen map, no shuffle).
    Training distributed on the full corpus would instead scan 100 TB
    maxIter times for centroids statistically identical to the
    sample's.

    The sample collection (probe/hint/Bernoulli bounds) is the shared
    ``bounded_training_sample`` discipline — see its docstring for why
    the small-vs-large decision never pays a full corpus count."""
    X = bounded_training_sample(
        embeddings,
        int(train_per_centroid) * int(n_centroids),
        seed,
        n_hint=n_hint,
    )
    C = _kmeans_fit(X, n_centroids, seed, max_iter)
    # Guard every downstream consumer against DUPLICATE centroids
    # (possible when the sample has fewer distinct points than k —
    # kmeans++ re-picks and re-seeding can return identical rows):
    # two bitwise-identical centroids make nearest-assignment ties,
    # and GEMM's shape-dependent accumulation can resolve the tie
    # differently across batches — splitting an exact-duplicate
    # cluster between two cells, where single-probe matching then
    # misses it (observed in the r12 distributed path; fixed there by
    # unique-fitting). Order-PRESERVING dedupe: a no-op on the normal
    # continuous case, so existing cell labelings are untouched.
    _, _uidx = np.unique(C, axis=0, return_index=True)
    if len(_uidx) < len(C):
        C = C[np.sort(_uidx)]
    centroids = C.tolist()
    assigned = embeddings.select(
        "vec_id", nearest_centroid_col(centroids).alias("centroid_id")
    )
    return assigned, centroids


def _topk_rescore(
    cands: DataFrame, queries: DataFrame, embeddings: DataFrame, k: int
) -> DataFrame:
    """Shared tail of every ANN family: exact-cosine rescore of
    (query_id, neighbor_id) candidates and a deterministic per-query
    rank window — one body so the tie-break and the zero-norm
    convention cannot drift between families. Query vectors come from
    the QUERIES frame (broadcast — the query set is small by
    contract, same shape as ``quantize.ivf_sq8_search``), neighbor
    vectors from the corpus: an external query whose vec_id is absent
    from the corpus is first-class, not silently dropped."""
    v = F.col("embedding").cast("array<double>")
    # norms hoisted to once-per-row, same as _rescored — bit-identical
    # cosines, one dot + one divide per candidate instead of three
    # interpreted 64-element aggregates
    q = F.broadcast(
        queries.select(
            F.col("vec_id").alias("query_id"),
            v.alias("va"),
            l2_norm_col(v).alias("_na"),
        )
    )
    c = embeddings.select(
        F.col("vec_id").alias("neighbor_id"),
        v.alias("vb"),
        l2_norm_col(v).alias("_nb"),
    )
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den == 0.0, F.lit(0.0)).otherwise(
        dot_col(F.col("va"), F.col("vb")) / den
    )
    scored = (
        cands.join(q, "query_id")
        .join(c, "neighbor_id")
        .withColumn("cosine", cos)
        .drop("va", "vb", "_na", "_nb")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), "neighbor_id")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cosine", "rk")
    )


def _nested_centroid_lit(centroids: list[list[float]]) -> "F.Column":
    """k x dim centroid list as a plan-literal array<array<double>>.

    Construction cost discipline (r17, VERDICT r16 #8): pyspark has no
    single-Literal path for a list-of-lists — ``F.lit(nested_list)``
    expands to one ``lit()`` py4j ROUND-TRIP PER ELEMENT (k*dim calls:
    profiled at ~2.5 ms each, 2.7 s of ivf_topk's warm build for
    16x64), and a 2D ndarray lit raises UNSUPPORTED_FEATURE. The
    ndarray-per-ROW form below is k py4j calls total; each inner
    Literal carries exact float64 bits (no text round-trip), and the
    outer CreateArray of foldable children constant-folds exactly like
    the old per-element tree, so the OPTIMIZED plan and all values are
    identical — only driver-side construction gets ~dim-times cheaper."""
    return F.array(
        *[
            F.lit(np.asarray([float(x) for x in c], dtype=np.float64))
            for c in centroids
        ]
    )


def probe_cells(
    queries: DataFrame, centroids: list[list[float]], n_probe: int
) -> DataFrame:
    """(query_id, centroid_id) for each query's ``n_probe`` nearest IVF
    cells by L2 (the quantizer's own metric). Tiny frame — queries x
    n_centroids rows, centroid list rides as a plan literal."""
    cent_lit = _nested_centroid_lit(centroids)
    v = F.col("embedding").cast("array<double>")
    qcent = queries.select(
        F.col("vec_id").alias("query_id"), v.alias("qv")
    ).select(
        "query_id", "qv", F.posexplode(cent_lit).alias("centroid_id", "cvec")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cvec", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    wprobe = Window.partitionBy("query_id").orderBy(d2.asc(), F.col("centroid_id"))
    return (
        qcent.withColumn("_pr", F.row_number().over(wprobe))
        .filter(F.col("_pr") <= n_probe)
        .select("query_id", "centroid_id")
    )


def probe_cells_scalable(
    queries: DataFrame,
    top_centroids: list[list[float]],
    sub_centroids: DataFrame,
    n_probe: int,
) -> DataFrame:
    """(query_id, centroid_id) for each query's ``n_probe`` nearest
    cells when the centroid set is a TABLE (two-level layout) — the
    plan-literal-free twin of ``probe_cells``. Three stages: (1) each
    query's ``n_probe`` nearest TOP cells via the bounded top literal
    (the standard hierarchical-IVF heuristic: the globally nearest
    sub-centroids concentrate in the nearest top cells, so probing
    n_probe top cells before ranking sub-centroids trades a bounded
    recall heuristic for corpus-independent driver state — every
    emitted match is still exact-cosine verified downstream); (2) a
    cogroup pairs each probed top cell's queries with that cell's
    sub-centroids and keeps each query's ``n_probe`` nearest WITHIN
    the group (argpartition — bounds the emitted frame at
    |queries| x n_probe^2); (3) one window takes the global
    ``n_probe`` smallest d2 per query (ties to lowest centroid_id,
    matching ``probe_cells``). Corpus vectors parked in SENTINEL
    cells (top cells the training sample missed — see
    ``assign_cells_scalable``) are never probed: the same
    recall-only, correctness-neutral fallback as assignment."""
    import pandas as pd

    top_probes = probe_cells(queries, top_centroids, n_probe=n_probe)
    v = F.col("embedding").cast("array<double>")
    staged = top_probes.join(
        queries.select(F.col("vec_id").alias("query_id"), v.alias("qv")),
        "query_id",
    ).withColumnRenamed("centroid_id", "_top")

    kp = int(n_probe)

    def _rank(key, qs: "pd.DataFrame", cents: "pd.DataFrame"):
        if not len(qs) or not len(cents):
            return pd.DataFrame(
                {"query_id": [], "centroid_id": [], "d2": []}
            )
        cents = cents.sort_values("centroid_id", kind="stable")
        C = np.stack(
            [np.asarray(c, dtype=np.float64) for c in cents["centroid"]]
        )
        cid = cents["centroid_id"].to_numpy()
        X = np.stack([np.asarray(q, dtype=np.float64) for q in qs["qv"]])
        d = (
            (X ** 2).sum(axis=1)[:, None]
            + (C ** 2).sum(axis=1)[None, :]
            - 2.0 * (X @ C.T)
        )
        m = min(kp, d.shape[1])
        part = np.argpartition(d, m - 1, axis=1)[:, :m]
        rows = np.repeat(qs["query_id"].to_numpy(), m)
        return pd.DataFrame(
            {
                "query_id": rows,
                "centroid_id": cid[part].ravel(),
                "d2": np.take_along_axis(d, part, axis=1).ravel(),
            }
        )

    ranked = (
        staged.groupBy("_top")
        .cogroup(sub_centroids.groupBy("top_id"))
        .applyInPandas(_rank, "query_id long, centroid_id long, d2 double")
    )
    wprobe = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("centroid_id")
    )
    return (
        ranked.withColumn("_pr", F.row_number().over(wprobe))
        .filter(F.col("_pr") <= kp)
        .select("query_id", "centroid_id")
    )


def ivf_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 10,
    train_per_centroid: int = 256,
) -> DataFrame:
    """IVF-style ANN top-k: assign the corpus to KMeans cells once,
    probe each query's ``n_probe`` nearest cells, exact-cosine rerank
    only the vectors in probed cells. ``queries`` carries its own
    (vec_id, embedding) — EXTERNAL query vectors (vec_ids absent from
    the corpus) are first-class, the same contract as every other ANN
    family (``sq8_topk``, ``ivf_sq8_search``, ``simhash_topk``); a
    corpus row naturally never matches itself.
    The second bucketed ANN family
    next to SimHash: LSH buckets by random projection, IVF by learned
    partition — at 100 TB IVF wins when the corpus is clustered (cells
    match real density), LSH when it isn't.

    Scale shape: the probe table is (queries x n_probe) rows joined on
    centroid_id against the assignment table — a hash join keyed by
    cell, fanning out only to probed cells' members, never the corpus;
    with ``n_probe = n_centroids`` every cell is probed and the result
    is EXACTLY brute force (the correctness row runs that regime; the
    recall/speed trade of partial probing is pinned in pytest)."""
    assigned, centroids = ivf_index(
        embeddings, n_centroids, seed, max_iter, train_per_centroid
    )
    probes = probe_cells(queries, centroids, n_probe)
    cands = (
        probes.join(assigned, "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return _topk_rescore(cands, queries, embeddings, k)


def simhash_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    band_rows: int = 4,
    num_bands: int = 96,
    seed: int = 42,
) -> DataFrame:
    """Top-k nearest neighbors for each query vector: SimHash candidate
    generation (query side x corpus bucket join), exact cosine rerank,
    rank window per query. ``queries`` carries its own (vec_id,
    embedding) — external query vectors are first-class, the same
    contract as every other ANN family.

    Banding is wider than the near-dup path (r = 4 vs 6): a query's
    k-th neighbor can sit at cosine ~0.25 (p ~= 0.58), where r = 6
    misses ~2% of true neighbors; r = 4, b = 96 brings that under
    4e-6 per pair at the cost of more candidates to rerank."""
    cands = (
        _candidates(
            queries, embeddings, dim, band_rows, num_bands, seed, anti_reflexive=False
        )
        .withColumnRenamed("id_a", "query_id")
        .withColumnRenamed("id_b", "neighbor_id")
    )
    return _topk_rescore(cands, queries, embeddings, k)


# Per-task cell-size ceiling for the within-cell GEMM candidate scan:
# an m-member cell's similarity block is scanned in ~128 MB row-blocks,
# so memory is bounded, but a single task still owns the whole cell —
# past this size the cell routes to the join-based all-pairs path
# (reachable only when the caller DISARMS the hot-cell cap with a huge
# max_cell_size, i.e. the small-scale exact-oracle regimes; armed
# configs never build a GEMM cell bigger than the cap).
_GEMM_CELL_CAP = 8192
# Prefilter slack: numpy's blocked/FMA dot and the JVM's sequential
# zip_with fold disagree by ~1e-15 relative on a 64-dim unit dot; the
# margin is 6 orders wider, so the scan cannot drop a pair the exact
# rescore would keep, while still rejecting ~everything below the
# threshold.
_GEMM_MARGIN = 1e-9


def _cell_candidates_gemm(
    cells: DataFrame,
    embeddings: DataFrame,
    threshold: float,
    max_cell_size: int,
) -> DataFrame:
    """(id_a, id_b) near-dup CANDIDATES from single-assignment cells,
    with the within-cell all-pairs work done as one LOCAL matmul per
    cell instead of a 2x64-double self-join — the r13 profiling fix
    for SemDeDup's dominant cost. At the 100x ladder rung the old
    shape materialized 12.5M within-cell pair ROWS (the expected
    cell-size^2/2 volume; yield 0.37%) through a join, a distinct,
    and a per-pair interpreted zip_with dot: 36.6 of 41.9 s. Here each
    ≤cap cell's members are gathered once (one shuffle on the cell
    key), a single applyInPandas task normalizes the cell's vectors
    and scans Xn @ Xn.T in ~128 MB row-blocks, and only pairs scoring
    >= threshold - _GEMM_MARGIN leave the task — the quadratic term
    still exists but costs a BLAS flop per pair, not a shuffled row,
    and the surviving ~true pairs alone pay the exact rescore
    (``_rescored``) so emitted cosines stay bit-identical to the
    join path and the DuckDB oracle.

    Cell routing (single assignment: each doc_id sits in exactly ONE
    cell, so the three branches are disjoint and pair rows are unique
    without a distinct):
      - size <= min(max_cell_size, _GEMM_CELL_CAP): GEMM scan (the
        common case — the k ~ n/125 policy holds expected cells at
        ~125);
      - size > max_cell_size (hot): rank-gap chain edges, exactly the
        recall-capped shape ``_banded_candidates`` uses (shared
        ``_rank_gap_chain_pairs``);
      - in between (only reachable with the cap disarmed past
        _GEMM_CELL_CAP, i.e. the exact-oracle regimes at small
        scale): the original all-pairs equi-join."""
    import pandas as pd

    from .dedup import _rank_gap_chain_pairs

    cap = int(max_cell_size)
    gemm_cap = min(cap, _GEMM_CELL_CAP)
    sizes = cells.groupBy("band_key").agg(F.count("*").alias("_bsz"))
    small = sizes.filter(F.col("_bsz") <= gemm_cap).select("band_key")
    emb64 = embeddings.select(
        F.col("vec_id").alias("doc_id"),
        F.col("embedding").cast("array<double>").alias("_e"),
    )
    members = cells.join(F.broadcast(small), "band_key", "left_semi").join(
        emb64, "doc_id"
    )
    thr = float(threshold) - _GEMM_MARGIN

    def _scan(pdf: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame(
            {
                "id_a": np.array([], dtype=np.int64),
                "id_b": np.array([], dtype=np.int64),
            }
        )
        m = len(pdf)
        if m < 2:
            return empty
        pdf = pdf.sort_values("doc_id", kind="stable")
        ids = pdf["doc_id"].to_numpy()
        X = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["_e"]])
        nrm = np.linalg.norm(X, axis=1)
        # zero-norm rows normalize to the zero vector: every score 0,
        # matching the engine-wide cosine-0 convention (the exact
        # rescore then decides them against the real threshold)
        Xn = np.where(
            nrm[:, None] > 0.0, X / np.maximum(nrm, 1e-300)[:, None], 0.0
        )
        out_a, out_b = [], []
        blk = max(1, (1 << 24) // m)  # ~128 MB of f64 per S block
        for s in range(0, m, blk):
            S = Xn[s : s + blk] @ Xn.T
            ii, jj = np.nonzero(S >= thr)
            keep = (ii + s) < jj  # upper triangle: id_a < id_b
            out_a.append(ids[ii[keep] + s])
            out_b.append(ids[jj[keep]])
        if not out_a:
            return empty
        return pd.DataFrame(
            {
                "id_a": np.concatenate(out_a),
                "id_b": np.concatenate(out_b),
            }
        )

    out = members.groupBy("band_key").applyInPandas(
        _scan, "id_a long, id_b long"
    )
    mid = sizes.filter(
        (F.col("_bsz") > gemm_cap) & (F.col("_bsz") <= cap)
    ).select("band_key")
    mid_members = cells.join(F.broadcast(mid), "band_key", "left_semi")
    all_pairs = (
        mid_members.alias("x")
        .join(
            mid_members.alias("y"),
            (F.col("x.band_key") == F.col("y.band_key"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("id_a"),
            F.col("y.doc_id").alias("id_b"),
        )
    )
    hot = sizes.filter(F.col("_bsz") > cap).select("band_key")
    hot_members = cells.join(F.broadcast(hot), "band_key", "left_semi")
    chain = _rank_gap_chain_pairs(hot_members, cap).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    return out.unionByName(all_pairs).unionByName(chain)


def semantic_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 64,
    seed: int = 42,
    max_iter: int = 10,
    n_hint: int | None = None,
    max_cell_size: int = 256,
    centroids: list[list[float]] | None = None,
    cells: DataFrame | None = None,
) -> DataFrame:
    """Embedding near-dup pairs via LEARNED k-means cells — the
    candidate-generation half of SemDeDup (Abbas et al., "SemDeDup:
    Data-efficient learning at web-scale through semantic
    deduplication", 2023): cluster the corpus with the sample-trained
    IVF quantizer, enumerate pairs only WITHIN each cell, exact-cosine
    verify. Returns (id_a, id_b, cosine), id_a < id_b, cosine >=
    ``threshold``.

    The third candidate-generation family next to SimHash (random
    hyperplanes) and MinHash (shingle banding): learned cells adapt to
    the corpus's actual density, so on clustered real-world embeddings
    the same recall costs fewer candidates than data-oblivious
    projections — the reason the paper scales to web crawls. The
    trade: a duplicate pair STRADDLING a cell boundary is missed
    (the paper accepts this; near-identical vectors almost surely
    co-assign because assignment is a deterministic argmin over
    L2 and their distance is ~0), and ``n_centroids = 1`` recovers the
    exact all-pairs regime — the oracle-verified correctness anchor,
    same discipline as IVF's full-probe regime.

    Plan shape (the 100 TB design): centroids train driver-side on a
    bounded sample (``ivf_index``), ride into the plan as a literal;
    assignment is one Arrow-batched matmul map pass (no shuffle); the
    within-cell all-pairs work is one LOCAL matmul per cell
    (``_cell_candidates_gemm`` — members gather with one shuffle on
    the cell key, a blocked Xn @ Xn.T scan emits only pairs above
    threshold-minus-margin, and the survivors alone pay the exact
    rescore, so the expected-cell-size^2 candidate volume never
    materializes as rows); hot cells (k > ``max_cell_size``) degrade
    to rank-gap chain edges exactly like MinHash's hot band-buckets
    (shared ``dedup._rank_gap_chain_pairs`` — O(k * cap) bounded
    comparisons, candidate graph stays connected so downstream
    components still merge), and every emitted pair is exact-cosine
    verified, so the cap can only lose recall on hot-but-heterogeneous
    cells, never admit a false positive. At scale, grow
    ``n_centroids`` with the corpus so the expected cell stays
    constant-sized: total pair work is then linear in n."""
    if cells is None:
        if centroids is None and int(n_centroids) > _LITERAL_K_CAP:
            # scale path (VERDICT r11 task 2): k grows with the corpus
            # under the k ~ n/125 cell policy, so past the cap the
            # centroid set must never be a driver array / plan
            # literal — train distributed, assign via cogroup.
            top, sub = distributed_coarse_quantizer(
                embeddings,
                int(n_centroids),
                seed=seed,
                max_iter=max_iter,
                n_hint=n_hint,
            )
            cells = (
                assign_cells_scalable(embeddings, top, sub)
                .select(
                    F.col("vec_id").alias("doc_id"),
                    F.col("centroid_id").alias("band_key"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            if centroids is None:
                _, centroids = ivf_index(
                    embeddings,
                    n_centroids=n_centroids,
                    seed=seed,
                    max_iter=max_iter,
                    n_hint=n_hint,
                )
            # one materialization (same discipline as the MinHash
            # signature frame and the SimHash key arrays):
            # _cell_candidates_gemm references the cells frame from
            # 5 plan branches (size detection, small/mid/hot semi
            # routing, the chain expansion) — uncheckpointed, the
            # corpus scan + Arrow assignment would re-run per branch.
            # Two longs/row.
            cells = embeddings.select(
                F.col("vec_id").alias("doc_id"),
                nearest_centroid_col(centroids).alias("band_key"),
            ).localCheckpoint(eager=True)
    cands = _cell_candidates_gemm(
        cells, embeddings, float(threshold), max_cell_size
    )
    return _rescored(cands, embeddings).filter(
        F.col("cosine") >= float(threshold)
    )


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 64,
    seed: int = 42,
    max_iter: int = 10,
    n_hint: int | None = None,
    max_cell_size: int = 256,
    keep: str = "min_id",
) -> DataFrame:
    """Full SemDeDup: semantic near-dup pairs -> connected components
    -> one keeper per duplicate group. Returns every corpus row as
    (vec_id, cluster_id, is_kept int) — singletons are their own
    cluster and always kept, so ``filter(is_kept = 1)`` IS the
    deduplicated corpus and the dropped fraction is auditable per
    cluster.

    ``keep`` picks the group representative:
      - "min_id" (default): the minimum vec_id — deterministic,
        engine-independent, SQL-expressible (the oracle-verified
        regime; same canonicalization as ``dedup.neardup_clusters``).
      - "far_from_centroid": the member with the LOWEST cosine
        similarity to its own k-means cell centroid — the paper's
        choice (keeping low-similarity examples preserves the tail of
        the semantic distribution instead of the prototype). Ties
        break on vec_id. Requires the learned centroids, so it is
        pinned by pytest rather than a SQL oracle.

    Components resolve with the shared hybrid union-find /
    pointer-jumping CC (``dedup.neardup_clusters``); the keeper window
    partitions by cluster_id — one extra shuffle on a frame that is
    one row per corpus vector, nothing pairwise."""
    from .dedup import neardup_clusters

    scalable = int(n_centroids) > _LITERAL_K_CAP
    if scalable:
        # scale path (VERDICT r11 task 2): centroids stay a DataFrame,
        # assignment is the cogroup join — the driver never holds or
        # plan-embeds the k-proportional centroid array. One
        # assignment pass serves both the banding cells AND the
        # far_from_centroid keeper score (cell_sim).
        centroids = None
        top, sub = distributed_coarse_quantizer(
            embeddings,
            int(n_centroids),
            seed=seed,
            max_iter=max_iter,
            n_hint=n_hint,
        )
        assigned = assign_cells_scalable(
            embeddings, top, sub, with_sim=(keep == "far_from_centroid")
        ).localCheckpoint(eager=True)
        cells = assigned.select(
            F.col("vec_id").alias("doc_id"),
            F.col("centroid_id").alias("band_key"),
        )
        pairs = semantic_neardup_pairs(
            embeddings,
            threshold=threshold,
            max_cell_size=max_cell_size,
            cells=cells,
        )
    else:
        _, centroids = ivf_index(
            embeddings,
            n_centroids=n_centroids,
            seed=seed,
            max_iter=max_iter,
            n_hint=n_hint,
        )
        pairs = semantic_neardup_pairs(
            embeddings,
            threshold=threshold,
            max_cell_size=max_cell_size,
            centroids=centroids,
        )
    comp = neardup_clusters(
        pairs.select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
    ).select(F.col("doc_id").alias("vec_id"), "cluster_id")
    labeled = (
        embeddings.select("vec_id", "embedding")
        .join(comp, "vec_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "vec_id"))
    )
    if keep == "min_id":
        return labeled.select(
            "vec_id",
            "cluster_id",
            (F.col("cluster_id") == F.col("vec_id"))
            .cast("int")
            .alias("is_kept"),
        )
    if keep != "far_from_centroid":
        raise ValueError(f"keep must be min_id|far_from_centroid: {keep!r}")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("_csim").asc(), F.col("vec_id").asc()
    )
    if scalable:
        # the keeper score came out of the assignment cogroup — a
        # (vec_id, cell_sim) join, never a centroid literal
        scored = labeled.join(
            assigned.select("vec_id", F.col("cell_sim").alias("_csim")),
            "vec_id",
        )
    else:
        cent_lit = _nested_centroid_lit(centroids)
        own = F.element_at(cent_lit, nearest_centroid_col(centroids) + 1)
        sim = cosine_similarity_col(
            F.col("embedding").cast("array<double>"), own
        )
        scored = labeled.withColumn("_csim", sim)
    return (
        scored.withColumn(
            "is_kept", (F.row_number().over(w) == 1).cast("int")
        )
        .select("vec_id", "cluster_id", "is_kept")
    )


def semantic_index_build(
    embeddings: DataFrame,
    path: str,
    n_centroids: int = 64,
    seed: int = 42,
    max_iter: int = 10,
    n_hint: int | None = None,
) -> None:
    """Persist the SemDeDup corpus index — the embedding twin of
    ``dedup.minhash_index`` and the float sibling of
    ``quantize.ivf_sq8_index_build``: a 100 TB corpus is KMeans-fit
    and cell-assigned ONCE; daily increments then dedup against it
    without re-scanning or re-assigning the corpus.

    Layout under ``path``:
      ``cells/`` — (vec_id, embedding) HIVE-partitioned by
                   ``centroid_id``, so matching a new batch scans ONLY
                   the cells the batch probes (static partition
                   pruning) and maintenance rewrites only touched
                   cells. Float embeddings, not SQ8 codes: dedup
                   thresholding wants exact cosine, and the read set
                   per batch is a few cells, not the corpus.
      ``meta/``  — single row: the centroid list (flat layout), or the
                   TOP-level centroid list plus a layout marker
                   (two-level layout, below).
      ``centroids/`` — two-level layout only: the full sub-centroid
                   TABLE (top_id, centroid_id, centroid).

    Past ``_LITERAL_K_CAP`` centroids the index is built and persisted
    in the TWO-LEVEL layout (VERDICT r11 task 2, extended to the
    persisted artifact): the quantizer trains distributed
    (``distributed_coarse_quantizer``), corpus assignment runs through
    the cogroup path, ``meta/`` holds only the bounded top-centroid
    list, and the k-proportional centroid set is a parquet TABLE —
    so building, matching against, and appending to the index never
    holds or plan-embeds a k-sized array on the driver.

    ``semantic_match_new`` is the read side,
    ``semantic_index_append`` the live-corpus maintenance."""
    spark = embeddings.sparkSession
    base = path.rstrip("/")
    if int(n_centroids) > _LITERAL_K_CAP:
        top, sub = distributed_coarse_quantizer(
            embeddings,
            int(n_centroids),
            seed=seed,
            max_iter=max_iter,
            n_hint=n_hint,
        )
        cells = embeddings.select("vec_id", "embedding").join(
            assign_cells_scalable(embeddings, top, sub), "vec_id"
        )
        cells.repartition("centroid_id").write.mode(
            "overwrite"
        ).partitionBy("centroid_id").parquet(f"{base}/cells")
        sub.write.mode("overwrite").parquet(f"{base}/centroids")
        from ..functions.localrows import rows_frame

        rows_frame(
            spark,
            [(top, "two_level")],
            "centroids array<array<double>>, layout string",
        ).write.mode("overwrite").parquet(f"{base}/meta")
        return
    _, centroids = ivf_index(
        embeddings,
        n_centroids=n_centroids,
        seed=seed,
        max_iter=max_iter,
        n_hint=n_hint,
    )
    cells = embeddings.select(
        "vec_id",
        "embedding",
        nearest_centroid_col(centroids).alias("centroid_id"),
    )
    cells.repartition("centroid_id").write.mode("overwrite").partitionBy(
        "centroid_id"
    ).parquet(f"{base}/cells")
    from ..functions.localrows import rows_frame

    rows_frame(
        spark, [(centroids,)], "centroids array<array<double>>"
    ).write.mode("overwrite").parquet(f"{base}/meta")


def _index_centroids(spark, path: str) -> list[list[float]]:
    """Flat-layout centroid list; raises on a two-level index (whose
    callers must use the table, never a driver list)."""
    meta = spark.read.parquet(f"{path.rstrip('/')}/meta").collect()[0]
    if "layout" in meta.__fields__ and meta["layout"] == "two_level":
        raise ValueError(
            "two-level semantic index: centroids live in the "
            "centroids/ table, not a driver list"
        )
    return [list(c) for c in meta["centroids"]]


def _index_layout(spark, path: str):
    """(layout, top_centroids_or_flat_list) for a persisted index."""
    meta = spark.read.parquet(f"{path.rstrip('/')}/meta").collect()[0]
    layout = (
        meta["layout"]
        if "layout" in meta.__fields__ and meta["layout"]
        else "flat"
    )
    return layout, [list(c) for c in meta["centroids"]]


def semantic_match_new(
    spark,
    path: str,
    new_embeddings: DataFrame,
    threshold: float = 0.9,
    n_probe: int = 1,
) -> DataFrame:
    """Incremental semantic dedup: match a NEW batch of (vec_id,
    embedding) against a persisted ``semantic_index_build`` artifact.
    Returns (new_id, corpus_id, cosine) for exact cosines at/above
    ``threshold`` — the embedding twin of ``dedup.minhash_match_new``:
    the corpus is never self-joined, never re-assigned, and only the
    cells the batch probes are READ at all (their ids collect to a
    list bounded by n_centroids — driver state the plan already holds
    as the centroid literal — and prune the hive scan statically).

    ``n_probe`` is the recall knob for cell-boundary straddle: with 1
    (the paper's within-cluster semantics) a twin assigned to the
    adjacent cell is missed; 2-3 probes check the runner-up cells at
    proportional extra read cost. A corpus vector lives in exactly one
    cell, so multi-probe never duplicates a pair.

    Two-level indexes (built past ``_LITERAL_K_CAP``) probe through
    the centroid TABLE (``probe_cells_scalable``): the driver holds
    only the top-centroid list and the touched-cell filter, which is
    bounded by |batch| x n_probe regardless of k."""
    base = path.rstrip("/")
    layout, centroids = _index_layout(spark, base)
    new_embeddings = new_embeddings.select("vec_id", "embedding")
    if layout == "two_level":
        sub = spark.read.parquet(f"{base}/centroids")
        probes = probe_cells_scalable(
            new_embeddings, centroids, sub, n_probe=n_probe
        )
    else:
        probes = probe_cells(new_embeddings, centroids, n_probe=n_probe)
    touched = [
        r[0] for r in probes.select("centroid_id").distinct().collect()
    ]
    if not touched:
        from ..functions.localrows import rows_frame

        return rows_frame(
            spark, [], "new_id long, corpus_id long, cosine double"
        )
    corpus = spark.read.parquet(f"{base}/cells").filter(
        F.col("centroid_id").isin(touched)
    )
    # r13: the probe-vs-cell verify runs through the same cogroup GEMM
    # prefilter as semantic_fuzzy_join — the |batch| x cell_size
    # candidate volume per probed cell is scanned as one local
    # Xq @ Xc^T per cell and only pairs above threshold-minus-margin
    # leave the task; the survivors alone pay the exact-cosine join
    # (emitted values bit-identical to the pure-join plan). Cells
    # bigger than the per-task cap keep the original equi-join shape.
    # A corpus vector lives in exactly one cell, so multi-probe still
    # never duplicates a pair.
    import pandas as pd

    v = F.col("embedding").cast("array<double>")
    q64 = probes.join(
        new_embeddings.select(
            F.col("vec_id").alias("query_id"), v.alias("_e")
        ),
        "query_id",
    ).select("centroid_id", "query_id", "_e")
    c64 = corpus.select(
        "centroid_id", F.col("vec_id").alias("corpus_id"), v.alias("_e")
    )
    csz = c64.groupBy("centroid_id").agg(F.count("*").alias("_n"))
    small = csz.filter(F.col("_n") <= _GEMM_CELL_CAP).select("centroid_id")
    big = csz.filter(F.col("_n") > _GEMM_CELL_CAP).select("centroid_id")
    thr = float(threshold) - _GEMM_MARGIN

    def _scan(key, qp: "pd.DataFrame", cp: "pd.DataFrame"):
        empty = pd.DataFrame(
            {
                "new_id": np.array([], dtype=np.int64),
                "corpus_id": np.array([], dtype=np.int64),
            }
        )
        if not len(qp) or not len(cp):
            return empty
        qids = qp["query_id"].to_numpy()
        cids = cp["corpus_id"].to_numpy()

        def _norm(pdf):
            X = np.stack(
                [np.asarray(x, dtype=np.float64) for x in pdf["_e"]]
            )
            n = np.linalg.norm(X, axis=1)
            return np.where(
                n[:, None] > 0.0, X / np.maximum(n, 1e-300)[:, None], 0.0
            )

        Xq, Xc = _norm(qp), _norm(cp)
        out_q, out_c = [], []
        blk = max(1, (1 << 24) // len(cids))
        for s in range(0, len(qids), blk):
            S = Xq[s : s + blk] @ Xc.T
            ii, jj = np.nonzero(S >= thr)
            out_q.append(qids[ii + s])
            out_c.append(cids[jj])
        if not out_q:
            return empty
        return pd.DataFrame(
            {
                "new_id": np.concatenate(out_q),
                "corpus_id": np.concatenate(out_c),
            }
        )

    gemm = (
        q64.join(F.broadcast(small), "centroid_id", "left_semi")
        .groupBy("centroid_id")
        .cogroup(
            c64.join(F.broadcast(small), "centroid_id", "left_semi")
            .groupBy("centroid_id")
        )
        .applyInPandas(_scan, "new_id long, corpus_id long")
    )
    fallback = (
        q64.join(F.broadcast(big), "centroid_id", "left_semi")
        .select("centroid_id", F.col("query_id").alias("new_id"))
        .join(
            c64.join(F.broadcast(big), "centroid_id", "left_semi")
            .select("centroid_id", "corpus_id"),
            "centroid_id",
        )
        .select("new_id", "corpus_id")
    )
    cands = gemm.unionByName(fallback)
    a = new_embeddings.select(
        F.col("vec_id").alias("new_id"),
        v.alias("va"),
        l2_norm_col(v).alias("_na"),
    )
    b = corpus.select(
        F.col("vec_id").alias("corpus_id"),
        v.alias("vb"),
        l2_norm_col(v).alias("_nb"),
    )
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den == 0.0, F.lit(0.0)).otherwise(
        dot_col(F.col("va"), F.col("vb")) / den
    )
    return (
        cands.join(a, "new_id")
        .join(b, "corpus_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= float(threshold))
        .select("new_id", "corpus_id", "cosine")
    )


def semantic_index_append(
    spark,
    path: str,
    new_embeddings: DataFrame,
    skew_threshold: float = 4.0,
) -> dict:
    """Live-corpus maintenance for ``semantic_index_build`` — same
    contract as ``quantize.ivf_sq8_index_append``: nearest EXISTING
    centroid (no retrain), partition-scoped idempotent upsert (only
    touched cells rewrite — O(batch + touched cells), never O(index)),
    then a cell-size skew probe. Appends keep old centroids, so a
    distribution shift concentrates new vectors into few cells and
    within-cell matching degrades toward hot-cell scans;
    ``needs_retrain=True`` past ``skew_threshold`` tells the CALLER to
    schedule ``semantic_index_build`` over the full corpus — this
    function never silently does a full-corpus pass. Replay-safe:
    re-appending the same batch upserts by vec_id into the same
    deterministic cell."""
    from ..sources.sinks import idempotent_merge_parquet

    base = path.rstrip("/")
    layout, centroids = _index_layout(spark, base)
    new_embeddings = new_embeddings.select("vec_id", "embedding")
    # materialize ONCE: three consumers follow (count, the merge
    # write, the touched-cell distinct) and each would otherwise
    # re-run the batch scan + Arrow centroid assignment — on a
    # 1 s-trigger stream that triples the per-batch maintenance work
    # (same discipline as stream_corpus_ingest's id frames)
    if layout == "two_level":
        sub = spark.read.parquet(f"{base}/centroids")
        updates = new_embeddings.join(
            assign_cells_scalable(new_embeddings, centroids, sub),
            "vec_id",
        ).localCheckpoint(eager=True)
    else:
        updates = new_embeddings.withColumn(
            "centroid_id", nearest_centroid_col(centroids)
        ).localCheckpoint(eager=True)
    appended = updates.count()
    idempotent_merge_parquet(
        spark,
        updates,
        f"{base}/cells",
        keys=["vec_id"],
        partition_col="centroid_id",
    )
    sizes = (
        spark.read.parquet(f"{base}/cells")
        .groupBy("centroid_id")
        .agg(F.count("*").alias("n"))
        .agg(F.max("n").alias("mx"), F.avg("n").alias("mean"))
        .collect()[0]
    )
    skew = float(sizes["mx"]) / float(sizes["mean"]) if sizes["mean"] else 0.0
    touched = updates.select("centroid_id").distinct().count()
    return {
        "appended": int(appended),
        "cells_touched": int(touched),
        "skew": round(skew, 3),
        "needs_retrain": bool(skew > float(skew_threshold)),
    }


def semantic_fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.9,
    n_centroids: int = 64,
    seed: int = 42,
    max_iter: int = 10,
    max_cell_size: int | None = 256,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Cross-corpus EMBEDDING join: (left_id, right_id, cosine) for
    every left/right pair with cosine >= ``threshold`` — the
    embedding twin of ``dedup.minhash_fuzzy_join`` (link a new crawl's
    embeddings to a canonical corpus, match product records across
    vendors by embedding) and the ad-hoc two-frame form of
    ``semantic_match_new`` (which requires a PERSISTED index; this
    takes two live DataFrames).

    Plan: ONE set of k-means cells trained on a bounded sample of the
    UNION (both sides must share the partition or co-assignment is
    meaningless), each side assigned in one Arrow matmul pass, a
    cell-key equi-join produces candidates, exact-cosine verify with
    hoisted per-row norms (``cosine >= threshold`` filter) — emitted
    pairs are exact, the learned partition only bounds recall (a true
    pair straddling a cell boundary is missed; near-identical vectors
    almost surely co-assign — the same SemDeDup trade as
    ``semantic_neardup_pairs``, and ``n_centroids=1`` recovers the
    exact all-cross-pairs regime, the oracle anchor).

    Hot cells: ``max_cell_size`` rank-caps EACH side per cell (pair
    fan-out <= cap^2 per cell). As in the text fuzzy join there is no
    chain rescue cross-corpus, so the cap is an honest recall bound;
    ``None`` disarms it. At scale grow ``n_centroids`` with the
    corpora so expected cell size stays constant."""
    scalable = centroids is None and int(n_centroids) > _LITERAL_K_CAP
    if scalable:
        # corpus-sized k: same table-trained quantizer + cogroup
        # assignment as semantic_dedup past the cap — ONE partition
        # shared by both sides (co-assignment stays meaningful), no
        # k-proportional driver array or plan literal
        union = left.select("vec_id", "embedding").unionByName(
            right.select("vec_id", "embedding")
        )
        top, sub = distributed_coarse_quantizer(
            union, int(n_centroids), seed=seed, max_iter=max_iter
        )
    elif centroids is None:
        union = left.select("vec_id", "embedding").unionByName(
            right.select("vec_id", "embedding")
        )
        _, centroids = ivf_index(
            union, n_centroids=n_centroids, seed=seed, max_iter=max_iter
        )

    def _cells(df: DataFrame, idc: str) -> DataFrame:
        if scalable:
            cells = assign_cells_scalable(df, top, sub).select(
                F.col("vec_id").alias(idc),
                F.col("centroid_id").alias("_cell"),
            )
        else:
            cells = df.select(
                F.col("vec_id").alias(idc),
                nearest_centroid_col(centroids).alias("_cell"),
            )
        if max_cell_size is not None:
            w = Window.partitionBy("_cell").orderBy(idc)
            cells = (
                cells.withColumn("_rk", F.row_number().over(w))
                .filter(F.col("_rk") <= int(max_cell_size))
                .drop("_rk")
            )
        # two consumers downstream (the cell join reads both sides);
        # the frame is two longs per row — same materialization
        # discipline as semantic_neardup_pairs' cells frame
        return cells.localCheckpoint(eager=True)

    cl, cr = _cells(left, "left_id"), _cells(right, "right_id")
    # r13: within-cell CROSS pairs via one local GEMM per cell (the
    # cross-side analog of _cell_candidates_gemm, same margin/blocking
    # discipline): for cells where BOTH sides fit the per-task cap,
    # a cogroup task scans Xl_n @ Xr_n.T and emits only pairs scoring
    # >= threshold - margin, so the |L_cell| x |R_cell| candidate
    # volume never materializes as rows; only the survivors pay the
    # exact-cosine join below (emitted values bit-identical to the
    # pure-join plan and the DuckDB oracle). Cells where either side
    # exceeds _GEMM_CELL_CAP (reachable only with the cap disarmed —
    # the small-scale exact-oracle regimes) keep the original
    # cell-equi-join shape.
    import pandas as pd

    sl = cl.groupBy("_cell").agg(F.count("*").alias("_nl"))
    sr = cr.groupBy("_cell").agg(F.count("*").alias("_nr"))
    both = sl.join(sr, "_cell")  # cells missing a side emit nothing
    small = both.filter(
        (F.col("_nl") <= _GEMM_CELL_CAP) & (F.col("_nr") <= _GEMM_CELL_CAP)
    ).select("_cell")
    big = both.filter(
        (F.col("_nl") > _GEMM_CELL_CAP) | (F.col("_nr") > _GEMM_CELL_CAP)
    ).select("_cell")
    e64 = lambda df, idc: df.select(  # noqa: E731
        F.col("vec_id").alias(idc),
        F.col("embedding").cast("array<double>").alias("_e"),
    )
    ml = cl.join(F.broadcast(small), "_cell", "left_semi").join(
        e64(left, "left_id"), "left_id"
    )
    mr = cr.join(F.broadcast(small), "_cell", "left_semi").join(
        e64(right, "right_id"), "right_id"
    )
    thr = float(threshold) - _GEMM_MARGIN

    def _scan(key, lp: "pd.DataFrame", rp: "pd.DataFrame"):
        empty = pd.DataFrame(
            {
                "left_id": np.array([], dtype=np.int64),
                "right_id": np.array([], dtype=np.int64),
            }
        )
        if not len(lp) or not len(rp):
            return empty
        lids = lp["left_id"].to_numpy()
        rids = rp["right_id"].to_numpy()

        def _norm(pdf):
            X = np.stack(
                [np.asarray(v, dtype=np.float64) for v in pdf["_e"]]
            )
            n = np.linalg.norm(X, axis=1)
            return np.where(
                n[:, None] > 0.0, X / np.maximum(n, 1e-300)[:, None], 0.0
            )

        Xl, Xr = _norm(lp), _norm(rp)
        out_l, out_r = [], []
        blk = max(1, (1 << 24) // len(rids))
        for s in range(0, len(lids), blk):
            S = Xl[s : s + blk] @ Xr.T
            ii, jj = np.nonzero(S >= thr)
            out_l.append(lids[ii + s])
            out_r.append(rids[jj])
        if not out_l:
            return empty
        return pd.DataFrame(
            {
                "left_id": np.concatenate(out_l),
                "right_id": np.concatenate(out_r),
            }
        )

    gemm = (
        ml.groupBy("_cell")
        .cogroup(mr.groupBy("_cell"))
        .applyInPandas(_scan, "left_id long, right_id long")
    )
    fallback = (
        cl.join(F.broadcast(big), "_cell", "left_semi")
        .join(cr.join(F.broadcast(big), "_cell", "left_semi"), "_cell")
        .select("left_id", "right_id")
    )
    cands = gemm.unionByName(fallback)
    v = F.col("embedding").cast("array<double>")
    a = left.select(
        F.col("vec_id").alias("left_id"), v.alias("va"),
        l2_norm_col(v).alias("_na"),
    )
    b = right.select(
        F.col("vec_id").alias("right_id"), v.alias("vb"),
        l2_norm_col(v).alias("_nb"),
    )
    den = F.col("_na") * F.col("_nb")
    cos = F.when(den == 0.0, F.lit(0.0)).otherwise(
        dot_col(F.col("va"), F.col("vb")) / den
    )
    return (
        cands.join(a, "left_id")
        .join(b, "right_id")
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= float(threshold))
        .select("left_id", "right_id", "cosine")
    )


# The measured crossover between the two self-join near-dup families
# (SCALE_LADDER.json three_decades, r15): simhash banding's collision
# count is b*2^-r*n^2/2 — quadratic at fixed r, ~n^(1+rho) (rho ~ 0.22
# at cosine 0.9) with r scaled, and its 2M-vector rung measured 522 s
# against semantic_dedup's linear learned-cell shape (two-decade
# exponent 0.406). Below the crossover simhash wins on simplicity (no
# training, deterministic under a fixed seed, no cell-boundary miss
# class); above it the learned cells win on physics.
_AUTO_NEARDUP_MAX_SIMHASH_VECTORS = 1_000_000

# the documented SemDeDup cell policy: grow k with the corpus so the
# expected cell stays ~constant-sized and total pair work stays linear
_AUTO_NEARDUP_CELL_TARGET = 125


def embedding_neardup_auto(
    embeddings: DataFrame,
    threshold: float = 0.9,
    method: str = "auto",
    seed: int = 42,
    n_vecs: int | None = None,
    simhash_kwargs: dict | None = None,
    semantic_kwargs: dict | None = None,
) -> DataFrame:
    """Embedding near-dup pairs with the family choice made by the
    repo's own scale measurements — the front door the operators
    README routes through, as engine behavior instead of prose.

    ``method="auto"`` picks per corpus size (``n_vecs`` skips the
    count when the caller already knows it):

    - below ``_AUTO_NEARDUP_MAX_SIMHASH_VECTORS``:
      ``simhash_neardup_pairs`` — data-oblivious random-hyperplane
      banding; no training step, deterministic under ``seed``, no
      cell-boundary miss class. Its collision count is
      b*2^-r*n^2/2 (SCALE_LADDER.json three_decades: 1.95e9
      collisions = ~500 of 522 s at the 2M-vector rung; LSH-theory
      floor Theta(n^(1+rho))), which is why it is not the default
      past the crossover.
    - at or above it: ``semantic_neardup_pairs`` — SemDeDup learned
      cells under the k ~ n/125 policy (expected cell stays
      constant-sized, total pair work linear; measured two-decade
      exponent 0.406), ``n_centroids`` derived here so callers get
      the linear configuration without knowing the policy.

    ``method="simhash"`` / ``method="semantic"`` pin a family (the
    per-family kwargs dicts pass knobs through untouched). Both
    families return the same contract: (id_a, id_b, cosine), id_a <
    id_b, every emitted pair EXACT-cosine verified at or above
    ``threshold`` — the approximation is candidate recall only
    (banding's detection rate vs cells' boundary-straddle misses)."""
    if method == "auto":
        if n_vecs is None:
            n_vecs = embeddings.count()
        method = (
            "simhash"
            if n_vecs < _AUTO_NEARDUP_MAX_SIMHASH_VECTORS
            else "semantic"
        )
    if method == "simhash":
        kwargs = dict(simhash_kwargs or {})
        if n_vecs is not None:
            # one corpus scan per call, not two (r15 ADVICE): the
            # router's own count rides into the operator, whose
            # prefilter-arming / broadcast-cap / quadratic-gate
            # decisions then read it instead of re-counting the
            # checkpointed signature frame
            kwargs.setdefault("n_hint", n_vecs)
        return simhash_neardup_pairs(
            embeddings, threshold=threshold, seed=seed, **kwargs
        )
    if method == "semantic":
        kwargs = dict(semantic_kwargs or {})
        if "n_centroids" not in kwargs:
            if n_vecs is None:
                n_vecs = embeddings.count()
            kwargs["n_centroids"] = max(
                1, round(n_vecs / _AUTO_NEARDUP_CELL_TARGET)
            )
            kwargs.setdefault("n_hint", n_vecs)
        return semantic_neardup_pairs(
            embeddings, threshold=threshold, seed=seed, **kwargs
        )
    raise ValueError(
        f"embedding_neardup_auto: unknown method {method!r} "
        "(expected 'auto', 'simhash', or 'semantic')"
    )
