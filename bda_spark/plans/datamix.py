"""Training-data mixture construction — the corpus-to-training-set
stage of an LLM data pipeline: benchmark decontamination, deterministic
stratified sampling, train/validation splitting, and GPT-style sequence
packing. The reference stops at cleaned gold tables (its Deliverable_4
medallion ends in Cassandra); these operators carry the same corpus the
rest of the way to a trainable mixture, and every one is expressed as
declarative DataFrame algebra so Catalyst plans the shuffles.

Determinism policy: anything "random" (sampling, splits) uses an
explicit integer hash — Knuth's multiplicative scheme h(k) = (k * A)
mod 2^32 with odd constants A — computed in exact BIGINT arithmetic so
Spark and DuckDB agree bit-for-bit and reruns are reproducible (the
property a 100 TB pipeline needs for resumable, auditable sampling; no
engine rand() is ever involved).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..operators.dedup import shingles
from .registry import query, t

# Knuth multiplicative hash constants (odd, near golden-ratio * 2^32)
_H_SAMPLE = 2654435761
_H_SPLIT = 2246822519
_H_MOD = 4294967296  # 2^32


def _kh(col, mult: int):
    """(col * mult) % 2^32 — the Knuth multiplicative hash — computed
    OVERFLOW-SAFE for any non-negative int64 id. The naive product
    overflows a long (ANSI error) once id exceeds ~2^63/mult ≈ 3.5e9 —
    found by the 100x scale rung, whose replicated id space crosses
    that line (real 100 TB corpora number documents past 2^32 too).
    Identity used: with x = id mod 2^32 and x = hi*2^16 + lo,
    (id*mult) mod 2^32 == (((hi*mult) mod 2^16)*2^16 + lo*mult) mod
    2^32, every intermediate bounded by ~2^48. Bit-equal to the old
    expression wherever the old one could run at all, so every
    committed oracle value is unchanged. ``_kh_sql`` is the DuckDB
    twin — the oracle pays the same discipline (BIGINT overflow raises
    there too)."""
    x = col % F.lit(_H_MOD)
    hi = F.shiftrightunsigned(x, 16)
    lo = x.bitwiseAND(F.lit(65535))
    return (
        ((hi * F.lit(mult)) % F.lit(65536)) * F.lit(65536)
        + lo * F.lit(mult)
    ) % F.lit(_H_MOD)


def _kh_sql(expr: str, mult: int) -> str:
    """DuckDB twin of ``_kh`` (integer // division; all BIGINT exact)."""
    x = f"(({expr}) % {_H_MOD})"
    return (
        f"((((({x}) // 65536) * {mult}) % 65536) * 65536"
        f" + (({x}) % 65536) * {mult}) % {_H_MOD}"
    )

# GPT-3-style decontamination gram size (Brown et al. 2020 used 13-gram
# overlap against evaluation sets).
DECONTAM_NGRAM = 13

_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"


# Shared by doc_decontaminate and its Bloom-prefiltered twin: the
# prefilter provably changes nothing, so one oracle proves both.
ORACLES_SHARED_DECONTAM = f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(tk[i:i+{DECONTAM_NGRAM - 1}], ' ') AS g
      FROM toks, unnest(generate_series(1, greatest(len(tk) - {DECONTAM_NGRAM - 1}, 0))) AS u(i)
    ), bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0)
    SELECT c.doc_id, count(*) AS n_hit_grams
    FROM grams c JOIN bench USING (g)
    WHERE c.doc_id % 7 <> 0
    GROUP BY c.doc_id
    """


@query("doc_decontaminate", ORACLES_SHARED_DECONTAM)
def doc_decontaminate(spark, sf_dir):
    """Benchmark decontamination: flag training documents sharing any
    13-token shingle with a held-out evaluation set (here stood in by
    doc_id % 7 == 0 rows of the same table so the query is
    self-contained on driver data; a real pipeline passes the eval
    corpus). 13-gram overlap is the GPT-3 decontamination rule.

    Scale shape: shingling is a narrow per-row explode; the overlap is
    ONE equi-join on the gram string followed by a count per doc — both
    hash-shuffles keyed by high-cardinality keys, no all-pairs anywhere.
    A real benchmark set is tiny relative to the corpus (thousands of
    eval documents vs billions of training docs), so its distinct-gram
    side broadcast-joins and the corpus is never shuffled at all; here
    the bench side is 1/7 of the table, so AQE picks the strategy.
    """
    docs = t(spark, sf_dir, "documents")
    return contamination_hits(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        broadcast_benchmark=False,  # bench side is 1/7 of the corpus here
    )


@query(
    "docs_stratified_sample",
    f"""
    WITH cnt AS (SELECT source, count(*) AS n_total FROM documents GROUP BY source)
    SELECT d.doc_id, d.source
    FROM documents d JOIN cnt USING (source)
    WHERE (({_kh_sql('d.doc_id', _H_SAMPLE)}) % 1000000) * cnt.n_total
          < 20 * 1000000
    """,
)
def docs_stratified_sample(spark, sf_dir):
    """Deterministic stratified downsampling to ~20 docs per source —
    the domain-rebalancing step of mixture construction (cap
    over-represented crawls, keep small domains whole). A document is
    kept iff hash(doc_id) mod 1e6 falls under its source's acceptance
    rate cap/n_total; the comparison is cross-multiplied into pure
    BIGINT arithmetic so no floating rate ever exists.

    Scale shape: one count aggregation per source (tiny result,
    broadcast back), then a stateless per-row filter — the corpus
    itself is scanned once and never shuffled; sampling a 100 TB table
    costs one pass. Rerunning yields the identical sample (hash, not
    rand), so downstream training is reproducible.
    """
    docs = t(spark, sf_dir, "documents")
    cnt = docs.groupBy("source").agg(F.count("*").alias("n_total"))
    h = _kh(F.col("doc_id"), _H_SAMPLE) % F.lit(1000000)
    return (
        docs.join(F.broadcast(cnt), "source")
        .filter(h * F.col("n_total") < F.lit(20 * 1000000))
        .select("doc_id", "source")
    )


@query(
    "docs_train_val_split",
    f"""
    SELECT source,
           CASE WHEN ({_kh_sql('doc_id', _H_SPLIT)}) % 100 < 10
                THEN 'val' ELSE 'train' END AS split,
           count(*) AS n_docs,
           CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def docs_train_val_split(spark, sf_dir):
    """Deterministic 90/10 train/validation split by document hash,
    reported as the per-(source, split) mixture table a training run
    consumes (doc and token budgets per domain). Hash-based assignment
    means a document NEVER migrates between splits as the corpus grows
    — the leakage guarantee row-number splits can't give — and uses a
    different multiplier than the sampler so the two hashes are
    uncorrelated.

    Scale shape: stateless per-row assignment + one group-agg on
    (source, split) — 2x|sources| result rows, map-side combined.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    split = F.when(
        _kh(F.col("doc_id"), _H_SPLIT) % 100 < 10, "val"
    ).otherwise("train")
    return (
        t(spark, sf_dir, "documents")
        .select("source", split.alias("split"), F.size(toks).alias("n_tok"))
        .groupBy("source", "split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tok").alias("n_tokens"))
    )


@query(
    "doc_unigram_logprob",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest({_TOKS}) AS tk FROM documents
    ), vocab AS (
      SELECT tk, count(*) AS cnt FROM tok GROUP BY tk
    ), tot AS (SELECT sum(cnt) AS total FROM vocab)
    SELECT doc_id, count(*) AS n_tokens,
           round(avg(ln(CAST(cnt AS DOUBLE) / total)), 6) AS avg_logprob
    FROM tok JOIN vocab USING (tk), tot
    GROUP BY doc_id
    """,
)
def doc_unigram_logprob(spark, sf_dir):
    """Per-document mean token log-probability under a unigram model of
    the corpus itself — the lightweight stand-in for CCNet-style LM
    perplexity filtering (docs far below the corpus's typical logprob
    are boilerplate/gibberish candidates; far above, repetitive). The
    model IS the corpus term-frequency table, so the operator is fully
    self-contained: one explode, one vocab aggregation, one join back.

    Scale shape: the vocab is Zipf-bounded (vocabulary grows ~O(n^0.7),
    millions of rows at 100 TB, not billions) and joins the token
    stream by hash on the token string; AQE broadcast-promotes it when
    it fits. The grand-total is a 1-row crossJoin literal. Nothing in
    the plan materializes per-document state beyond the final
    (doc_id, n, avg) aggregate.
    """
    docs = t(spark, sf_dir, "documents")
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    tok = docs.select("doc_id", F.explode(toks).alias("tk"))
    vocab = tok.groupBy("tk").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    return (
        tok.join(vocab, "tk")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(
                F.avg(F.log(F.col("cnt").cast("double") / F.col("total"))), 6
            ).alias("avg_logprob"),
        )
    )


@query(
    "docs_mixture_weights",
    f"""
    WITH s AS (
      SELECT source, CAST(sum(len({_TOKS})) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ), q AS (
      SELECT source, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000000) AS BIGINT)
               AS q_sqrt
      FROM s
    )
    SELECT source, n_tokens,
           round(CAST(n_tokens AS DOUBLE)
                 / CAST(sum(n_tokens) OVER () AS DOUBLE), 6) AS token_share,
           round(CAST(q_sqrt AS DOUBLE)
                 / CAST(sum(q_sqrt) OVER () AS DOUBLE), 6) AS temp_share
    FROM q
    """,
)
def docs_mixture_weights(spark, sf_dir):
    """Domain mixture weights by temperature sampling (T = 2, i.e.
    share^(1/2) renormalized — the mT5/multilingual-corpus formula):
    up-weights small domains, tempers dominant crawls. Output is the
    per-source token budget table plus its raw and temperature-adjusted
    shares — the knob a mixture builder multiplies into sampling rates.

    Determinism: the temperature weight is sqrt(n)/Σsqrt(n) — but a
    double Σsqrt is summation-order-dependent, the exact FP class that
    flaked this suite in r2/r3. So sqrt is QUANTIZED per row to an
    integer (floor(sqrt(n)·1e9): sqrt is IEEE correctly-rounded on both
    engines, one multiply, one floor — all deterministic scalars), the
    window sums are exact BIGINT arithmetic (order-free), and the only
    remaining FP op before round(...,6) is a single double division of
    two exactly-representable integers. Quantization error is ~1e-9
    relative, invisible at 6 digits.

    Scale shape: one token-count aggregation (map-side combined) down
    to |sources| rows; the two normalizations are partitionless windows
    over that TINY frame (row count = number of domains, not data
    size), which is exactly when an unpartitioned window is fine.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    s = (
        t(spark, sf_dir, "documents")
        .select("source", F.size(toks).alias("n_tok"))
        .groupBy("source")
        .agg(F.sum("n_tok").alias("n_tokens"))
    )
    w = Window.partitionBy()
    q = s.withColumn(
        "q_sqrt",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1e9).cast("bigint"),
    )
    return q.select(
        "source",
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double")
            / F.sum("n_tokens").over(w).cast("double"),
            6,
        ).alias("token_share"),
        F.round(
            F.col("q_sqrt").cast("double")
            / F.sum("q_sqrt").over(w).cast("double"),
            6,
        ).alias("temp_share"),
    )


@query(
    "docs_pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id, source, len({_TOKS}) AS n_tokens FROM documents
    ), c AS (
      SELECT source, n_tokens,
             sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT source, CAST(floor((cum - n_tokens) / 128.0) AS BIGINT) AS seq_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS seq_tokens
    FROM c GROUP BY 1, 2
    """,
)
def docs_pack_sequences(spark, sf_dir):
    """GPT-style sequence packing: concatenate each source's documents
    in deterministic doc_id order and chunk the token stream into
    fixed windows (128 tokens here to exercise multiple chunks on the
    small tables; 2048+ in production). A document belongs to the
    sequence its first token lands in; output is the packing manifest
    (docs and tokens per sequence) a dataloader shards by.

    Scale shape: the running token offset is a cumulative-sum window
    partitioned by source — each source's stream sorts within its own
    partition, all sources in parallel, nothing global. At 100 TB a
    single mega-source would make one partition the straggler; the
    production layout sub-buckets each source (source, bucket =
    hash(doc_id) % k) exactly like the salting the LSH operators use,
    at the cost of k boundary sequences per source.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = t(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(toks).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.withColumn(
            "seq_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / 128.0).cast("bigint"),
        )
        .groupBy("source", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
    )


def pack_sequences_salted(docs, seq_len: int = 128, n_buckets: int = 8):
    """Scale twin of ``docs_pack_sequences`` for mega-sources: sub-bucket
    each source by document hash (the same Knuth scheme as the sampler,
    third multiplier-free modulus) so no single dominant source
    serializes into one partition's window sort — the salting promised
    in the packing docstring, same trick the LSH operators use. Each
    (source, salt) stream packs independently in deterministic doc_id
    order; the cost is at most ``n_buckets - 1`` extra boundary
    sequences per source, and the conservation laws (every doc packed
    exactly once, every token accounted) are unchanged.

    Bench-only (no oracle row): the unsalted sibling carries the
    DuckDB oracle; this one is pinned by conservation tests.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = docs.select(
        "doc_id",
        "source",
        (_kh(F.col("doc_id"), _H_SAMPLE) % n_buckets).alias("salt"),
        F.size(toks).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "salt")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = d.withColumn("cum", F.sum("n_tokens").over(w))
    return (
        c.withColumn(
            "seq_id",
            F.floor(
                (F.col("cum") - F.col("n_tokens")) / float(seq_len)
            ).cast("bigint"),
        )
        .groupBy("source", "salt", "seq_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
        )
    )


def contamination_hits(
    docs,
    benchmark,
    n: int = DECONTAM_NGRAM,
    broadcast_benchmark: bool = True,
    benchmark_shingles=None,
):
    """The library form of ``doc_decontaminate``: flag rows of ``docs``
    sharing any n-token shingle with an EXTERNAL ``benchmark`` frame
    (both need doc_id + text). Returns (doc_id, n_hit_grams).

    A real evaluation suite is thousands of documents against a corpus
    of billions, so its distinct-gram set is forced to the broadcast
    side by default and the training corpus is never shuffled; pass
    ``broadcast_benchmark=False`` when the benchmark is a meaningful
    fraction of the corpus (as in the self-contained registry query)
    and AQE picks the join side. Shingling is shared with the MinHash
    pipeline (operators.dedup.shingles).

    ``benchmark_shingles`` (a (shingle) frame, e.g. a localCheckpoint
    of ``shingles(benchmark, n).select("shingle").distinct()``) skips
    the benchmark shingling — the STREAMING ingest computes it once at
    stream start instead of once per micro-batch; ``benchmark`` is
    ignored when it is given (pass None)."""
    g = shingles(docs, n=n)
    bg = (
        benchmark_shingles
        if benchmark_shingles is not None
        else shingles(benchmark, n=n).select("shingle").distinct()
    )
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    return (
        g.join(bg, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )


def contamination_hits_bloom(
    docs,
    benchmark,
    n: int = DECONTAM_NGRAM,
    m_words: int = 1 << 16,
    k: int = 4,
):
    """Bloom-prefiltered decontamination — the shape for benchmark sets
    too big to broadcast exactly: build a FIXED-SIZE blocked-Bloom
    bitmap over the benchmark's shingles (m_words 64-bit words, ~512 KiB
    at the default, whatever the benchmark cardinality), broadcast it,
    prune the corpus's shingles with one codegen'd bits-check, then run
    the exact verify join only on survivors. False positives die in the
    verify; false negatives are impossible (same hash family both
    sides) — so the result is EXACTLY ``contamination_hits``, which is
    why the registry twin shares doc_decontaminate's oracle verbatim.

    At 100 TB the economics: exact broadcast needs the full distinct
    gram set driver-side (GBs for a large eval suite); the bitmap stays
    sub-MB and the corpus-side scan drops ~99% of grams before the only
    shuffle (the verify join's survivor side)."""
    from ..operators.sketch import blocked_bloom_bitmap, blocked_bloom_probe

    g = shingles(docs, n=n)
    # materialize the benchmark's distinct-gram set once (r16): it
    # feeds BOTH the bitmap aggregation and the exact verify join, and
    # without the boundary the benchmark is shingled twice per run.
    # The frame is benchmark-sized (tiny vs the corpus by contract —
    # that asymmetry is this operator's whole premise), so the
    # checkpoint is strictly cheaper than one redundant shingling.
    bg = (
        shingles(benchmark, n=n)
        .select("shingle")
        .distinct()
        .localCheckpoint(eager=True)
    )
    bitmap = blocked_bloom_bitmap(bg, "shingle", m_words, k)
    candidates = blocked_bloom_probe(g, "shingle", bitmap, m_words, k)
    return (
        candidates.join(bg, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit_grams"))
    )


@query("doc_decontaminate_bloom", ORACLES_SHARED_DECONTAM)
def doc_decontaminate_bloom(spark, sf_dir):
    """Registry twin of ``doc_decontaminate`` through the blocked-Bloom
    prefilter (``contamination_hits_bloom``): byte-identical output —
    the shared oracle proves the prefilter drops nothing — with the
    fixed-size-broadcast scale shape. Sits in the DEFERRED_TAIL (the
    driver's 50-row window is full; doc_decontaminate is the in-window
    row for this component) and is oracle-verified on every pytest run
    by test_oracle_queries."""
    docs = t(spark, sf_dir, "documents")
    return contamination_hits_bloom(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
    )


def quality_percentile_filter(
    scored,
    score_col: str,
    keep_frac: float = 0.9,
    by: str = "source",
):
    """Keep each domain's top ``keep_frac`` of documents by a quality
    score — RELATIVE thresholds per source, the way production quality
    gates are run (an absolute cutoff tuned on one domain guts
    another). ``scored`` is any frame carrying ``by`` + ``score_col``
    (e.g. the output of doc_quality_scores or doc_unigram_logprob
    joined back to documents).

    percent_rank is a per-``by``-partition window: each domain sorts
    only its own rows, domains in parallel — same scale shape as the
    sequence packer. When exact rank boundaries aren't worth a full
    per-domain sort, ``quality_threshold_filter_approx`` below is the
    sort-free twin."""
    w = Window.partitionBy(by).orderBy(F.col(score_col).desc())
    return (
        scored.withColumn("_pr", F.percent_rank().over(w))
        .filter(F.col("_pr") <= keep_frac)
        .drop("_pr")
    )


def quality_cutoff(
    scored,
    score_col: str,
    keep_frac: float = 0.9,
    accuracy: int = 10_000,
) -> float:
    """The global (1 - keep_frac) quantile of ``score_col`` over a
    HISTORICAL corpus, as one scalar — the fixed gate a STREAMING
    ingest applies per micro-batch. A micro-batch has no stable corpus
    distribution to rank against (its own percentile would make the
    gate's meaning drift batch to batch), so the streaming loop prices
    the cutoff ONCE here against the landed corpus and re-prices on
    its own schedule — the same frozen-vs-live division as the
    sample-trained IVF centroids. Same mergeable-sketch plan as the
    batch gate: one percentile_approx aggregate, the corpus is never
    sorted."""
    row = scored.agg(
        F.percentile_approx(
            score_col, F.lit(1.0 - float(keep_frac)), F.lit(int(accuracy))
        ).alias("c")
    ).collect()[0]
    return float(row["c"]) if row["c"] is not None else float("-inf")


def quality_threshold_filter_approx(
    scored,
    score_col: str,
    keep_frac: float = 0.9,
    by: str = "source",
    accuracy: int = 10_000,
):
    """Sort-free scale twin of ``quality_percentile_filter``: keep each
    domain's top ``keep_frac`` by computing the domain's cutoff score
    with ``percentile_approx`` — a mergeable KLL-style sketch that
    partial-aggregates map-side — then broadcasting the |domains|-row
    threshold table back and filtering.

    Where the exact gate shuffles and SORTS every domain's full row
    set (percent_rank window), this plan's only shuffle carries one
    sketch buffer per (partition, domain); the corpus itself is never
    sorted and never moved. The trade is boundary fuzz: documents
    whose score sits within the sketch's error of the cutoff may flip
    sides, so the kept fraction is keep_frac +/- epsilon rather than
    the exact rank count — the right trade at 100 TB, where the gate
    feeds a statistical sampler anyway.

    Ties note: every row EQUAL to the cutoff is kept (>=), so heavily
    tied score distributions keep more than keep_frac — same behavior
    as the exact gate at pr == keep_frac boundaries."""
    cutoff = scored.groupBy(by).agg(
        F.percentile_approx(
            score_col, F.lit(1.0 - keep_frac), F.lit(int(accuracy))
        ).alias("_cutoff")
    )
    return (
        scored.join(F.broadcast(cutoff), by)
        .filter(F.col(score_col) >= F.col("_cutoff"))
        .drop("_cutoff")
    )


@query(
    "doc_chunks_overlap",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents
    ), sized AS (
      SELECT doc_id, tk, len(tk) AS n,
             CASE WHEN len(tk) <= 64 THEN 1
                  ELSE 1 + CAST(ceil((len(tk) - 64) / 48.0) AS BIGINT)
             END AS nc
      FROM toks WHERE len(tk) > 0
    )
    SELECT doc_id, i AS chunk_id,
           len(tk[i * 48 + 1 : i * 48 + 64]) AS n_chunk_tokens,
           md5(array_to_string(tk[i * 48 + 1 : i * 48 + 64], ' ')) AS chunk_md5
    FROM sized, unnest(generate_series(0, nc - 1)) AS u(i)
    """,
)
def doc_chunks_overlap(spark, sf_dir):
    """Sliding-window document chunking (64-token chunks, stride 48 →
    16-token overlap): the retrieval / context-window prep step that
    turns documents into embeddable passages. Chunk content is pinned
    by md5 of the joined tokens, so the oracle comparison proves the
    byte-exact text of every chunk, not just counts.

    Registered in the DEFERRED_TAIL (the driver's 50-row window is
    full); verified on every pytest run by test_oracle_queries.

    Scale shape: pure per-row expression work — split once, emit
    ceil-ratio many slices via posexplode; no shuffle at all until a
    downstream consumer aggregates. The 64/48 numbers are test-data
    sized (docs here are ~25-100 tokens); production uses e.g.
    512/384 with the identical plan.
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    d = t(spark, sf_dir, "documents").select(
        "doc_id", toks.alias("tk")
    ).withColumn("n", F.size("tk")).filter(F.col("n") > 0)
    nc = F.when(F.col("n") <= 64, F.lit(1)).otherwise(
        (F.ceil((F.col("n") - 64) / 48.0) + 1).cast("bigint")
    )
    chunk = F.slice("tk", F.col("chunk_id") * 48 + 1, 64)
    return (
        d.withColumn("nc", nc)
        .select(
            "doc_id",
            "tk",
            F.explode(F.sequence(F.lit(0), F.col("nc") - 1)).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size(chunk).alias("n_chunk_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
        )
    )


def corpus_build_pipeline(
    docs,
    benchmark,
    threshold: float = 0.5,
    keep_frac: float = 0.9,
    seq_len: int = 128,
    n_buckets: int = 8,
    decontam_ngram: int = DECONTAM_NGRAM,
    return_fates: bool = False,
    **minhash_kwargs,
):
    """The whole corpus build as ONE composed plan — the LLM-data twin
    of the medallion pipeline, proving the flagship operators chain:

        dedup_corpus (exact + MinHash-LSH near-dup, attributed removals)
          -> per-domain quality gate (sort-free percentile_approx twin)
          -> benchmark decontamination (13-gram overlap, GPT-3 rule)
          -> salted sequence packing (the dataloader manifest)

    ``docs`` needs (doc_id, text, source); ``benchmark`` is the held-out
    evaluation corpus (doc_id, text). Returns ``(clean, removed,
    manifest)``: the surviving documents, the attributed removal map
    from dedup, and the packing manifest over the cleaned corpus. With
    ``return_fates=True`` a fourth frame is appended: (doc_id, fate)
    assigning EVERY input document exactly one of
    ``kept / exact / neardup / quality / contaminated`` — the complete
    audit trail, so every byte that fails to reach training is
    attributable to the stage that dropped it.

    Every stage is the SCALE variant: hot LSH buckets are star-capped,
    the quality cutoff is a mergeable sketch (the corpus is never
    sorted), the benchmark's gram set broadcasts (the corpus is never
    shuffled for the join), and packing is salted so no mega-source
    serializes one partition. Conservation (every doc exactly one of
    clean / dedup-removed / quality-gated / contaminated; every clean
    token packed exactly once) is pinned in tests/test_datamix.py."""
    from ..operators.dedup import dedup_corpus

    kept, removed = dedup_corpus(docs, threshold=threshold, **minhash_kwargs)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    score = (
        F.size(F.array_distinct(toks)).cast("double")
        / F.greatest(F.size(toks), F.lit(1))
    )
    gated = quality_threshold_filter_approx(
        kept.withColumn("_q", score), "_q", keep_frac
    ).drop("_q")
    hits = contamination_hits(gated, benchmark, n=decontam_ngram)
    clean = gated.join(hits.select("doc_id"), "doc_id", "left_anti")
    manifest = pack_sequences_salted(clean, seq_len=seq_len, n_buckets=n_buckets)
    if not return_fates:
        return clean, removed, manifest
    # the fate frame references the gate/contamination sub-DAGs from
    # several branches; materialize the tiny id frames once so the
    # corpus-wide percentile gate and shingle join don't re-run per
    # consumer (ids are 8 bytes/doc — nothing at any scale)
    kept_ids = kept.select("doc_id").localCheckpoint(eager=True)
    gated_ids = gated.select("doc_id").localCheckpoint(eager=True)
    hit_ids = hits.select("doc_id").localCheckpoint(eager=True)
    fates = (
        gated_ids.join(hit_ids, "doc_id", "left_anti")
        .select("doc_id", F.lit("kept").alias("fate"))
        .unionByName(removed.selectExpr("doc_id", "reason AS fate"))
        .unionByName(
            kept_ids.join(gated_ids, "doc_id", "left_anti")
            .select("doc_id", F.lit("quality").alias("fate"))
        )
        .unionByName(
            hit_ids.select("doc_id", F.lit("contaminated").alias("fate"))
        )
    )
    return clean, removed, manifest, fates


def sample_to_token_budget(
    docs,
    budget_tokens: int,
    by: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Deterministic per-domain TOKEN-budget sampling — the mixture
    builder's final materialization step: after ``docs_mixture_weights``
    decides each domain's share, this takes exactly that many tokens
    from the domain (documents in Knuth-hash pseudo-random order, so
    the prefix is an unbiased, reproducible sample; the document that
    crosses the budget boundary is kept, so every domain meets its
    budget). ``docs_stratified_sample`` caps document COUNTS; training
    budgets are set in tokens, which is what this one enforces.

    Returns the kept rows with ``n_tokens``. Same scale shape as the
    sequence packer: one cumulative-sum window per domain partition,
    domains in parallel, nothing global, no rand()."""
    toks = F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    d = docs.select(
        id_col,
        by,
        F.size(toks).alias("n_tokens"),
        _kh(F.col(id_col), _H_SAMPLE).alias("_h"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy("_h", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        d.withColumn("_cum", F.sum("n_tokens").over(w))
        .filter(F.col("_cum") - F.col("n_tokens") < budget_tokens)
        .select(id_col, by, F.col("n_tokens").cast("bigint").alias("n_tokens"))
    )


@query(
    "docs_token_budget_sample",
    f"""
    WITH d AS (
      SELECT doc_id, source,
             len({_TOKS}) AS n_tokens,
             {_kh_sql('doc_id', _H_SAMPLE)} AS h
      FROM documents
    ), c AS (
      SELECT *, sum(n_tokens) OVER (PARTITION BY source ORDER BY h, doc_id
                                    ROWS UNBOUNDED PRECEDING) AS cum
      FROM d
    )
    SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens
    FROM c WHERE cum - n_tokens < 2000
    """,
)
def docs_token_budget_sample(spark, sf_dir):
    """2000-token-per-source deterministic sample (see
    ``sample_to_token_budget``). The oracle replays the identical hash
    order and cumulative boundary rule in SQL — exact BIGINT
    arithmetic end to end, nothing engine-dependent.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    return sample_to_token_budget(
        t(spark, sf_dir, "documents"), budget_tokens=2000
    )


def contamination_spans(
    docs,
    benchmark,
    n: int = DECONTAM_NGRAM,
    min_span_tokens: int | None = None,
    broadcast_benchmark: bool = True,
):
    """Span-LEVEL decontamination: WHERE each benchmark overlap sits —
    (doc_id, pos, span_tokens) for every maximal run of contaminated
    n-grams, so a pipeline can REDACT the leaked passage and keep the
    rest of the document instead of dropping it whole (the GPT-3
    appendix-C move: they cut the overlapping window plus margin, not
    the document; ``contamination_hits`` is the doc-level flag twin).

    Plan: positional grams of the corpus (operators.dedup.
    positional_grams — one narrow codegen pass), LEFT SEMI join
    against the benchmark's distinct gram hashes (broadcast by
    default: a real eval suite is tiny vs the corpus, so the corpus
    is never shuffled by the join), then the same gaps-and-islands
    run-merge as duplicate_passages, per document over consecutive
    positions: span_tokens = run_length + n - 1. The one shuffle is
    the per-doc window; output is linear in contaminated content."""
    from pyspark.sql import Window as W

    from ..operators.dedup import positional_grams

    if min_span_tokens is None:
        min_span_tokens = n
    g = positional_grams(docs, n)
    bg = positional_grams(benchmark, n).select("gh").distinct()
    if broadcast_benchmark:
        bg = F.broadcast(bg)
    hits = g.join(bg, "gh", "left_semi")
    run = F.col("pos") - F.row_number().over(
        W.partitionBy("doc_id").orderBy("pos")
    )
    return (
        hits.withColumn("run", run)
        .groupBy("doc_id", "run")
        .agg(
            F.min("pos").cast("long").alias("pos"),
            (F.count("*") + n - 1).alias("span_tokens"),
        )
        .filter(F.col("span_tokens") >= int(min_span_tokens))
        .select("doc_id", "pos", "span_tokens")
    )


@query(
    "doc_contamination_spans",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS tk FROM documents
    ), grams AS (
      SELECT doc_id, u.pos, u.g FROM (
        SELECT doc_id,
               unnest([{{'pos': i - 1,
                        'g': array_to_string(tk[i:i+{DECONTAM_NGRAM - 1}], ' ')}}
                       FOR i IN range(1, greatest(len(tk) - {DECONTAM_NGRAM - 1}, 0) + 1)]) AS u
        FROM toks)
    ), bench AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % 7 = 0
    ), hits AS (
      SELECT c.doc_id, c.pos FROM grams c
      WHERE c.doc_id % 7 <> 0 AND c.g IN (SELECT g FROM bench)
    ), isl AS (
      SELECT doc_id, pos,
             pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS run
      FROM hits
    )
    SELECT doc_id, min(pos) AS pos,
           count(*) + {DECONTAM_NGRAM - 1} AS span_tokens
    FROM isl GROUP BY doc_id, run
    ORDER BY doc_id, pos
    """,
)
def doc_contamination_spans(spark, sf_dir):
    """Span-level decontamination over the same self-contained
    benchmark stand-in as doc_decontaminate (doc_id % 7 == 0 rows):
    for each contaminated training doc, the exact positions and
    lengths of its leaked 13-gram runs — the redact-don't-drop
    variant. Registered in the DEFERRED_TAIL (driver window frozen at
    50 rows); oracle-verified every pytest run by
    test_oracle_queries."""
    docs = t(spark, sf_dir, "documents")
    return contamination_spans(
        docs.filter(F.col("doc_id") % 7 != 0),
        docs.filter(F.col("doc_id") % 7 == 0),
        broadcast_benchmark=False,
    ).orderBy("doc_id", "pos")


def redact_spans(docs, spans, margin: int = 0):
    """Apply span-level decontamination: drop every token covered by a
    (pos, span_tokens) row of ``spans`` (plus ``margin`` tokens each
    side — GPT-3's appendix C cuts the overlapping window AND a
    surrounding margin), keeping the rest of the document. Returns
    (doc_id, text, n_redacted_tokens); documents with no spans pass
    through byte-identical.

    Plan: spans collect per doc (collect_list of tiny structs — a few
    per contaminated doc, never corpus-scale state), LEFT join back to
    the corpus (broadcast-eligible: contaminated docs are a sliver of
    the corpus), then one codegen pass filters each token by position
    against the doc's own span array (exists() over a few structs per
    token — no shuffle beyond the spans aggregation)."""
    doc_spans = spans.groupBy("doc_id").agg(
        F.collect_list(
            F.struct(
                (F.col("pos") - margin).alias("lo"),
                (F.col("pos") + F.col("span_tokens") + margin).alias("hi"),
            )
        ).alias("_spans")
    )
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    covered = lambda i: F.exists(
        F.col("_spans"),
        lambda s: (i >= s["lo"]) & (i < s["hi"]),
    )
    kept = F.filter(
        F.transform(toks, lambda x, i: F.struct(x.alias("tok"), i.alias("i"))),
        lambda p: ~covered(p["i"]),
    )
    return (
        docs.join(doc_spans, "doc_id", "left")
        .withColumn(
            "_kept",
            F.when(F.col("_spans").isNull(), None).otherwise(
                F.transform(kept, lambda p: p["tok"])
            ),
        )
        .select(
            "doc_id",
            F.when(F.col("_spans").isNull(), F.col("text"))
            .otherwise(F.concat_ws(" ", F.col("_kept")))
            .alias("text"),
            F.when(F.col("_spans").isNull(), F.lit(0))
            .otherwise(F.size(toks) - F.size("_kept"))
            .cast("long")
            .alias("n_redacted_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al., NeurIPS
# 2023) — pick raw-corpus documents whose n-gram distribution best
# matches a small TARGET set, by importance weight under two smoothed
# bag-of-features models, sampled with the deterministic Gumbel-top-k
# trick. The published method hashes n-grams into a fixed bucket space
# to bound the feature table at web scale; the oracle-verified query
# below runs the word-feature regime (vocab is Zipf-bounded — the same
# scale argument as doc_unigram_logprob), and ``n_buckets`` switches on
# the hashed regime for unbounded vocabularies.

_H_DSIR = 2447445413  # third independent odd Knuth-style multiplier

# Auto-regime switch for DSIR's feature space (r12 VERDICT task 2):
# below this many raw documents the WORD regime runs (exact observed
# vocab — the oracle-verified shape; every driver/bench scale sits
# here), above it the HASHED regime (the paper's own web-scale device:
# a fixed 2^18-bucket feature space). The word regime's scale risk is
# the vocab table itself: the log-ratio join back to the token stream
# is only map-side while the vocab broadcasts, and a web corpus'
# observed vocab (Heaps' law, plus tokenization noise/typos that grow
# ~linearly) eventually pushes the table past any broadcast budget —
# at which point EVERY exploded token row would shuffle for the join.
# The hashed table is <= DSIR_N_BUCKETS rows (~6 MB) at any corpus
# size, so the join stays map-side forever; add-1 smoothing uses the
# fixed bucket count, matching Xie et al.'s published estimator.
# Like the hybrid-CC 500k-edge threshold, crossing the switch changes
# RESULTS slightly (a coarser feature space), never correctness
# semantics: selection is still importance resampling, just under the
# hashed model the paper itself specifies at scale.
DSIR_HASHED_MIN_DOCS = 200_000
DSIR_N_BUCKETS = 1 << 18


def dsir_importance_weights(raw, target, n_buckets: int | None = None):
    """(doc_id, n_tokens, log_weight) for every ``raw`` document:
    log_weight = sum over the doc's tokens of
    ln p_target(feature) - ln p_raw(feature), each model add-1
    smoothed over the feature space: the JOINT observed vocab in the
    word regime (|V| = features seen in either corpus), the FIXED
    hash space (|V| = n_buckets, seen or not) in the hashed regime.
    Positive = looks more like the target than like the raw pool.

    Scale shape: two explode->group-agg passes build the feature
    tables (map-side combined; Zipf-bounded word vocab, or at most
    ``n_buckets`` rows in the hashed regime), the log-ratio table
    joins back to the raw token stream by feature hash (AQE broadcast-
    promotes it when it fits), and the per-doc weight is one grouped
    sum. Scalar totals travel as 1-row broadcast crossJoins. Nothing
    materializes beyond (doc_id, n, w).
    """
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    feat = (
        (F.pmod(F.xxhash64(F.col("tk")), F.lit(n_buckets)))
        if n_buckets
        else F.col("tk")
    )
    tok_r = raw.select("doc_id", F.explode(toks).alias("tk")).select(
        "doc_id", feat.alias("f")
    )
    tok_t = target.select(F.explode(toks).alias("tk")).select(feat.alias("f"))
    cr = tok_r.groupBy("f").agg(F.count("*").alias("cr"))
    ct = tok_t.groupBy("f").agg(F.count("*").alias("ct"))
    vocab = cr.join(ct, "f", "full_outer")
    # smoothing space |V|: observed joint vocab in the word regime;
    # the FIXED hash space n_buckets in the hashed regime (the paper's
    # feature space is all buckets, seen or not — counting only
    # observed buckets would shrink the add-1 denominator whenever
    # some buckets are empty)
    totals = vocab.agg(
        F.count("*").alias("vsz"),
        F.sum(F.coalesce("cr", F.lit(0))).alias("tr"),
        F.sum(F.coalesce("ct", F.lit(0))).alias("tt"),
    )
    if n_buckets:
        totals = totals.withColumn(
            "vsz", F.lit(int(n_buckets)).cast("long")
        )
    scalars = F.broadcast(totals)
    lr = (
        vocab.filter(F.col("cr").isNotNull())
        .crossJoin(scalars)
        .select(
            "f",
            (
                F.log(
                    (F.coalesce("ct", F.lit(0)) + 1.0)
                    / (F.col("tt") + F.col("vsz"))
                )
                - F.log((F.col("cr") + 1.0) / (F.col("tr") + F.col("vsz")))
            ).alias("lw"),
        )
    )
    return (
        tok_r.join(lr, "f")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum("lw").alias("log_weight"),
        )
    )


def dsir_select(raw, target, n: int = 100,
                n_buckets: int | None | str = "auto",
                gumbel: bool = True, n_hint: int | None = None):
    """DSIR selection: top-``n`` raw documents by importance weight,
    resampled WITHOUT replacement via Gumbel-top-k (score = log_weight
    + g_i with g_i = -ln(-ln u_i); taking the n largest scores is
    exactly sampling n docs w/o replacement with probability
    proportional to their importance weights — Vieira 2014). u_i is
    the deterministic Knuth hash of doc_id (third multiplier, so it is
    uncorrelated with the sampler and the splitter), never engine
    rand(): reruns and the DuckDB oracle agree bit-for-bit.
    ``gumbel=False`` degenerates to hard top-n by weight (the argmax
    regime for tests and greedy selection). Returns (doc_id, n_tokens,
    log_weight, score) rounded to the 6-digit oracle policy; the
    global top-n is a TakeOrdered, not a full sort.

    ``n_buckets="auto"`` (default) picks the feature regime by corpus
    size: the exact word vocab below ``DSIR_HASHED_MIN_DOCS`` raw
    docs, the paper's fixed ``DSIR_N_BUCKETS`` hash space above it
    (see the constants' comment). The decision is priced by one cheap
    filtered-scan count of ``raw`` — pass ``n_hint`` to skip it when
    the caller already knows the size, or an explicit int/None to pin
    a regime regardless of size."""
    if n_buckets == "auto":
        n_raw = int(n_hint) if n_hint is not None else raw.count()
        n_buckets = (
            DSIR_N_BUCKETS if n_raw >= DSIR_HASHED_MIN_DOCS else None
        )
    w = dsir_importance_weights(raw, target, n_buckets=n_buckets)
    u = (
        _kh(F.col("doc_id"), _H_DSIR) + 1.0
    ) / F.lit(float(_H_MOD + 1))
    score = F.col("log_weight") - F.log(-F.log(u)) if gumbel else F.col(
        "log_weight"
    )
    return (
        w.withColumn("score", F.round(score, 6))
        .withColumn("log_weight", F.round("log_weight", 6))
        .orderBy(F.desc("score"), "doc_id")
        .limit(n)
    )


@query(
    "docs_dsir_sample",
    f"""
    WITH tok_r AS (
      SELECT doc_id, unnest({_TOKS}) AS f FROM documents WHERE doc_id % 10 <> 0
    ), tok_t AS (
      SELECT unnest({_TOKS}) AS f FROM documents WHERE doc_id % 10 = 0
    ), cr AS (SELECT f, count(*) AS cr FROM tok_r GROUP BY f),
    ct AS (SELECT f, count(*) AS ct FROM tok_t GROUP BY f),
    vocab AS (SELECT * FROM cr FULL OUTER JOIN ct USING (f)),
    sc AS (
      SELECT count(*) AS vsz,
             sum(coalesce(cr, 0)) AS tr,
             sum(coalesce(ct, 0)) AS tt
      FROM vocab
    ), lr AS (
      SELECT f,
             ln((coalesce(ct, 0) + 1.0) / (tt + vsz))
               - ln((cr + 1.0) / (tr + vsz)) AS lw
      FROM vocab, sc WHERE cr IS NOT NULL
    ), w AS (
      SELECT doc_id, count(*) AS n_tokens, sum(lw) AS log_weight
      FROM tok_r JOIN lr USING (f) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, round(log_weight, 6) AS log_weight,
           round(log_weight
                 - ln(-ln((({_kh_sql('doc_id', _H_DSIR)}) + 1.0)
                          / {float(_H_MOD + 1)})), 6) AS score
    FROM w
    ORDER BY score DESC, doc_id LIMIT 100
    """,
)
def docs_dsir_sample(spark, sf_dir):
    """DSIR over the driver corpus: target = the doc_id % 10 == 0
    slice (the same self-contained stand-in device as
    doc_decontaminate's benchmark), raw pool = the rest; select the
    100 raw docs whose unigram distribution best matches the target,
    Gumbel-resampled. Promoted into the DRIVER_WINDOW in the round-10
    rotation (ceding docs_token_budget_sample's row); also
    oracle-verified every pytest run."""
    docs = t(spark, sf_dir, "documents")
    return dsir_select(
        docs.filter(F.col("doc_id") % 10 != 0),
        docs.filter(F.col("doc_id") % 10 == 0),
        n=100,
    )
