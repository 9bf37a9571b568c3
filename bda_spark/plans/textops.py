"""Text-analysis queries over ``documents`` (SURVEY extension: the
LLM-training-data operators — token counting, quality scoring,
language-ID, fingerprinting, exact + near dedup).

``documents(doc_id, text, lang, source, n_chars)`` plays the news-article
role (ref scraper.py output, FIXTURES.md §2); keyword counting mirrors
the reference's explode-count (ref load_to_gold_layer.py:45-49).
All hot-path expressions are JVM-side built-ins (split/regexp/aggregate),
no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, language_id_col
from .registry import query, r6, t


def _langid_oracle_sql() -> str:
    """DuckDB twin of language_id_col, generated from the SAME stopword
    dict so the two implementations cannot drift."""
    score_items = ", ".join(
        "len(list_filter(toks, x -> list_contains(["
        + ", ".join(f"'{w}'" for w in words)
        + "], x)))"
        for words in STOPWORDS.values()
    )
    lang_list = ", ".join(f"'{lang}'" for lang in STOPWORDS)
    return f"""
    WITH scored AS (
      SELECT doc_id,
             [{score_items}] AS s
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks
            FROM documents)
    )
    SELECT doc_id,
           CASE WHEN list_aggregate(s, 'max') > 0
                THEN ([{lang_list}])[list_position(s, list_aggregate(s, 'max'))]
                ELSE 'und' END AS detected_lang,
           list_aggregate(s, 'max') AS score
    FROM scored
    """


@query("doc_langid", _langid_oracle_sql())
def doc_langid(spark, sf_dir):
    """Language-ID heuristic per document: stopword-occurrence argmax
    (SURVEY extension — the corpus's ``lang`` column is a producer
    label; this operator computes one from the text itself). Both
    engines score from the same lists via _langid_oracle_sql."""
    from ..functions.text import language_score_col

    d = t(spark, sf_dir, "documents")
    scores = F.array(
        *[language_score_col("text", words) for words in STOPWORDS.values()]
    )
    return d.select(
        "doc_id",
        language_id_col("text").alias("detected_lang"),
        F.array_max(scores).alias("score"),
    )


@query(
    "keyword_counts",
    """
    SELECT keyword, count(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS keyword FROM documents)
    WHERE keyword <> ''
    GROUP BY keyword
    ORDER BY n DESC, keyword
    LIMIT 20
    """,
)
def keyword_counts(spark, sf_dir):
    """Explode words -> count -> top-k (ref A5 keyword frequencies,
    EDA_silver.ipynb cell 9 / load_to_gold_layer.py:45-49)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("keyword"))
        .filter(F.col("keyword") != "")
        .groupBy("keyword")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "keyword")
        .limit(20)
    )


@query(
    "keyword_counts_sketch",
    """
    SELECT keyword AS item, count(*) AS est_count, count(*) AS max_count
    FROM (SELECT unnest(string_split(text, ' ')) AS keyword FROM documents)
    WHERE keyword <> ''
    GROUP BY keyword
    ORDER BY est_count DESC, item
    LIMIT 20
    """,
)
def keyword_counts_sketch(spark, sf_dir):
    """Misra-Gries twin of ``keyword_counts`` (operators.sketch.
    frequent_items): per-partition bounded summaries instead of
    shuffling the full vocabulary — the 100 TB top-k shape. With the
    default 1024 counters >= this corpus's distinct-word count, no
    compaction fires and the sketch is provably EXACT (est == max ==
    true count), which is what lets an aggregate oracle pin it;
    lossy-regime behavior (error bounds, guaranteed-presence) is pinned
    by tests/test_sketch.py with deliberately tiny budgets.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    from ..operators.sketch import frequent_items

    d = t(spark, sf_dir, "documents")
    words = d.select(F.explode(F.split("text", " ")).alias("word")).filter(
        F.col("word") != ""
    )
    return frequent_items(
        words, "word", k=20, counters=1024, include_bound_row=False
    )


@query(
    "doc_canonical_fingerprints",
    r"""
    SELECT doc_id,
           md5(trim(regexp_replace(
             regexp_replace(lower(text), '[^\pL\pN\s]', ' ', 'g'),
             '\s+', ' ', 'g'))) AS canonical_md5
    FROM documents
    """,
)
def doc_canonical_fingerprints(spark, sf_dir):
    """Canonicalization layer for dedup
    (functions.text.canonicalize_text_col): md5 over the lowercased,
    punctuation-stripped, whitespace-collapsed text. The oracle
    recomputes the same normalization in DuckDB's regex dialect — a
    hash match proves the canonical BYTES agree engine-to-engine,
    which is the property that matters when canonical fingerprints
    from different systems are compared in one dedup index.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    from ..functions.text import canonicalize_text_col

    return t(spark, sf_dir, "documents").select(
        "doc_id", F.md5(canonicalize_text_col("text")).alias("canonical_md5")
    )


@query(
    "docs_by_lang_source",
    """
    SELECT lang, source, count(*) AS n_docs,
           round(avg(n_chars), 6) AS avg_chars
    FROM documents GROUP BY lang, source
    """,
)
def docs_by_lang_source(spark, sf_dir):
    """Gold 'aggregated_news' analog: counts per (site, key)
    (ref load_to_gold_layer.py:40-43)."""
    d = t(spark, sf_dir, "documents")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"), r6(F.avg("n_chars")).alias("avg_chars")
    )


@query(
    "token_stats",
    """
    SELECT doc_id,
           len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tokens,
           length(text) AS n_chars_measured
    FROM documents WHERE doc_id < 100
    """,
)
def token_stats(spark, sf_dir):
    """Whitespace token counting — the token-count primitive of a
    training-data pipeline; JVM-side split+filter+size."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "doc_quality_scores",
    """
    SELECT doc_id,
           round(CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS DOUBLE)
                 / greatest(length(text), 1), 6) AS tokens_per_char,
           round(CAST(len(list_distinct(list_filter(string_split(text, ' '), x -> x <> ''))) AS DOUBLE)
                 / greatest(len(list_filter(string_split(text, ' '), x -> x <> '')), 1), 6)
                 AS distinct_token_ratio,
           CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS length_ok
    FROM documents WHERE doc_id < 100
    """,
)
def doc_quality_scores(spark, sf_dir):
    """Quality scoring: token density, lexical diversity, length gate —
    the C4/Gopher-style quality-filter primitives, all JVM-side."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    n_toks = F.size(toks)
    return d.select(
        "doc_id",
        r6(n_toks.cast("double") / F.greatest(F.length("text"), F.lit(1))).alias(
            "tokens_per_char"
        ),
        r6(
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(n_toks, F.lit(1))
        ).alias("distinct_token_ratio"),
        F.when(F.length("text").between(100, 2000), 1).otherwise(0).alias("length_ok"),
    )


@query(
    "regex_token_stats",
    r"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]+'))
             AS n_bpe_tokens,
           len(list_filter(string_split(text, ' '), x -> x <> ''))
             AS n_ws_tokens
    FROM documents WHERE doc_id < 100
    """,
)
def regex_token_stats(spark, sf_dir):
    """BPE-ish token counting: the GPT-2-style pre-tokenizer shape
    (letter runs | digit runs | punctuation runs) as one JVM-side
    regexp_extract_all, next to the whitespace count — the
    tokens-per-doc statistics a training-data pipeline budgets by."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    bpe = F.regexp_extract_all(
        F.lower("text"), F.lit(r"[a-z]+|[0-9]+|[^a-z0-9\s]+"), 0
    )
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        F.size(ws).alias("n_ws_tokens"),
    )


# 31-ary polynomial over character codes mod 2^31-1 — the classic
# Rabin-Karp rolling hash; products stay < 2^36 so 64-bit arithmetic
# never overflows, and both engines fold left with identical mod steps.
_RH_MOD = (1 << 31) - 1


@query(
    "doc_rolling_fingerprints",
    f"""
    SELECT doc_id,
           CASE WHEN length(text) = 0 THEN CAST(0 AS BIGINT)
                ELSE list_reduce(
                  list_transform(
                    list_filter(string_split(text, ''), x -> x <> ''),
                    x -> CAST(ascii(x) AS BIGINT)),
                  (a, b) -> (a * 31 + b) % {_RH_MOD})
           END AS fingerprint,
           length(text) AS n_chars_measured
    FROM documents WHERE doc_id < 50
    """,
)
def doc_rolling_fingerprints(spark, sf_dir):
    """Rolling-hash document fingerprint (Rabin-Karp polynomial) — the
    streaming-friendly alternative to the md5 digest in
    doc_fingerprints: updatable per character, so chunked documents
    fingerprint without re-reading the prefix."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    chars = F.filter(F.split("text", ""), lambda x: x != "")
    rh = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + F.ascii(x)) % _RH_MOD,
    )
    return d.select(
        "doc_id",
        rh.alias("fingerprint"),
        F.length("text").alias("n_chars_measured"),
    )


@query(
    "doc_stopword_quality",
    f"""
    SELECT doc_id,
           round(CAST(len(list_filter(string_split(lower(text), ' '),
                       x -> list_contains([{", ".join(f"'{w}'" for w in STOPWORDS["en"])}], x)))
                      AS DOUBLE)
                 / greatest(len(list_filter(string_split(text, ' '),
                                            x -> x <> '')), 1), 6)
             AS stopword_ratio
    FROM documents WHERE doc_id < 100
    """,
)
def doc_stopword_quality(spark, sf_dir):
    """Stopword-ratio quality signal (Gopher-style filter: natural
    language carries function words; keyword-stuffed or non-linguistic
    text doesn't). Numerator is functions.text.language_score_col over
    the English list — the same expression language-ID scores with."""
    from ..functions.text import STOPWORDS, language_score_col

    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    ws = F.filter(F.split("text", " "), lambda x: x != "")
    return d.select(
        "doc_id",
        r6(
            language_score_col("text", STOPWORDS["en"]).cast("double")
            / F.greatest(F.size(ws), F.lit(1))
        ).alias("stopword_ratio"),
    )


@query(
    "exact_dedup_keyset",
    """
    SELECT user_id, event_type,
           min(event_id) AS keep_event_id, count(*) AS n_copies
    FROM events
    GROUP BY user_id, event_type
    """,
)
def exact_dedup_keyset(spark, sf_dir):
    """Exact key-subset deduplication (ref P9 dropDuplicates,
    load_to_silver_layer.py:45,121): canonical keep-row = min id per
    key group, plus cluster size. Hash-shuffle on the key; at 100 TB
    identical plan with the text hash as key."""
    e = t(spark, sf_dir, "events")
    return e.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("keep_event_id"), F.count("*").alias("n_copies")
    )


@query(
    "doc_fingerprints",
    """
    SELECT doc_id, md5(text) AS fingerprint,
           length(text) AS n_chars_measured
    FROM documents WHERE doc_id < 50
    """,
)
def doc_fingerprints(spark, sf_dir):
    """Document fingerprinting for exact dedup at scale: content digest
    per doc (md5 here since both engines implement it bit-identically;
    the engine's scale path uses xxhash64 — 8-byte shuffle keys)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fingerprint"),
        F.length("text").alias("n_chars_measured"),
    )


# Shingles appearing in more than this many documents are dropped before
# the inverted-index self-join (both engine and oracle): a stop-phrase
# shingle shared by k docs otherwise produces k^2 join rows — the skew
# that kills the plan at 100 TB. Jaccard is then computed over the capped
# shingle vocabulary on BOTH sides, so the oracle still verifies values.
MAX_SHINGLE_DF = 50

@query(
    "ngram_jaccard_pairs",
    f"""
    WITH shingles AS (
      SELECT doc_id, unnest(list_distinct(sh)) AS shingle
      FROM (
        SELECT doc_id,
               [list_aggregate(toks[i:i+2], 'string_agg', ' ')
                FOR i IN range(1, greatest(len(toks) - 2, 0) + 1)] AS sh
        FROM (SELECT doc_id,
                     list_filter(string_split(text, ' '), x -> x <> '') AS toks
              FROM documents WHERE doc_id < 60)
      )
    ), kept AS (
      SELECT doc_id, shingle FROM (
        SELECT doc_id, shingle, count(*) OVER (PARTITION BY shingle) AS df
        FROM shingles
      ) WHERE df <= {MAX_SHINGLE_DF}
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM kept a JOIN kept b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           round(CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.01
    ORDER BY doc_a, doc_b
    """,
)
def ngram_jaccard_pairs(spark, sf_dir):
    """N-gram (3-token shingle) Jaccard near-dup detection: shingle ->
    df-cap -> inverted index self-join -> |A∩B|/|A∪B| >= 0.01. The exact
    oracle for what MinHash-LSH approximates (see plans.lsh for the
    bucketed scale path). High-document-frequency shingles are dropped
    before the self-join (window count over the same shuffle the join
    needs), capping per-key join fan-out at MAX_SHINGLE_DF^2."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    docs = d.select("doc_id", toks.alias("toks"))
    n = F.size("toks")
    # 3-token shingles via transform over a 0..n-3 index sequence
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(n - 3, F.lit(-1))),
        lambda i: F.concat_ws(
            " ", F.col("toks")[i], F.col("toks")[i + 1], F.col("toks")[i + 2]
        ),
    )
    all_shingles = (
        docs.filter(n >= 3)
        .select("doc_id", F.explode(F.array_distinct(sh)).alias("shingle"))
    )
    shingles = (
        all_shingles.withColumn(
            "df", F.count("*").over(Window.partitionBy("shingle"))
        )
        .filter(F.col("df") <= MAX_SHINGLE_DF)
        .drop("df")
    )
    sizes = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shingles.alias("a")
    b = shingles.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common").cast("double") / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        inter.join(sa, F.col("doc_a") == F.col("sa.doc_id"))
        .join(sb, F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= 0.01)
        .select("doc_a", "doc_b", r6(jac).alias("jaccard"))
        .orderBy("doc_a", "doc_b")
    )


@query(
    "doc_repetition_scores",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS toks
      FROM documents WHERE doc_id < 100
    ), words AS (
      SELECT doc_id, len(toks) AS n_words,
             len(list_distinct(toks)) AS n_distinct
      FROM toks
    ), bigrams AS (
      SELECT doc_id,
             unnest([toks[i] || ' ' || toks[i+1]
                     FOR i IN range(1, len(toks))]) AS bg
      FROM toks WHERE len(toks) >= 2
    ), bg_counts AS (
      SELECT doc_id, bg, count(*) AS c FROM bigrams GROUP BY 1, 2
    ), bg_stats AS (
      SELECT doc_id, max(c) AS max_c, sum(c) AS n_bg FROM bg_counts
      GROUP BY doc_id
    )
    SELECT w.doc_id, w.n_words,
           round(1.0 - CAST(n_distinct AS DOUBLE) / n_words, 6)
             AS dup_word_ratio,
           round(CAST(max_c AS DOUBLE) / n_bg, 6) AS top_bigram_ratio
    FROM words w JOIN bg_stats ON w.doc_id = bg_stats.doc_id
    """,
)
def doc_repetition_scores(spark, sf_dir):
    """Repetition-based quality filters (the Gopher repetition rules
    adapted to the corpus's line-less word soup): duplicate-word ratio
    (1 - distinct/total) and the fraction of word bigrams taken by the
    single most frequent bigram. High values flag boilerplate /
    template spam for removal before training. All JVM-side: one
    split, one bigram explode, two aggs joined on doc_id."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    toks = F.filter(F.split("text", " "), lambda x: x != "")
    base = d.select("doc_id", toks.alias("toks")).filter(F.size("toks") >= 2)
    words = base.select(
        "doc_id",
        F.size("toks").alias("n_words"),
        F.size(F.array_distinct("toks")).alias("n_distinct"),
    )
    grams = F.transform(
        F.sequence(F.lit(0), F.size("toks") - 2),
        lambda i: F.concat_ws(" ", F.col("toks")[i], F.col("toks")[i + 1]),
    )
    bg_stats = (
        base.select("doc_id", F.explode(grams).alias("bg"))
        .groupBy("doc_id", "bg")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("max_c"), F.sum("c").alias("n_bg"))
    )
    return words.join(bg_stats, "doc_id").select(
        "doc_id",
        "n_words",
        r6(F.lit(1.0) - F.col("n_distinct").cast("double") / F.col("n_words"))
          .alias("dup_word_ratio"),
        r6(F.col("max_c").cast("double") / F.col("n_bg"))
          .alias("top_bigram_ratio"),
    )


# PII scrubbing: the corpus itself is synthetic word soup, so the query
# PLANTS deterministic PII (same concat on both engines) and then both
# detect and mask it — proving the regex surface, not the corpus.
_EMAIL_RE = "[a-z0-9._]+@[a-z0-9.-]+"
_PHONE_RE = "\\+1-555-[0-9]{4}"


@query(
    "doc_pii_scan",
    f"""
    WITH aug AS (
      SELECT doc_id,
             text || ' contact user' || doc_id
                  || '@mail.example.invalid or +1-555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS t
      FROM documents WHERE doc_id < 100
    )
    SELECT doc_id,
           len(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                              '{_PHONE_RE}', '<PHONE>', 'g')) AS masked_md5,
           length(t) AS n_chars_scanned
    FROM aug
    """,
)
def doc_pii_scan(spark, sf_dir):
    """PII detection + masking for training-data scrubbing: count
    email/phone hits and emit the md5 of the redacted text (the hash
    match proves both engines masked the SAME spans). Narrow map —
    regexp_extract_all / regexp_replace are codegen'd; at 100 TB this
    runs at scan speed with no shuffle."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    aug = d.select(
        "doc_id",
        F.concat(
            F.col("text"), F.lit(" contact user"), F.col("doc_id"),
            F.lit("@mail.example.invalid or +1-555-"),
            F.lpad(F.pmod("doc_id", F.lit(10000)).cast("string"), 4, "0"),
        ).alias("t"),
    )
    masked = F.regexp_replace(
        F.regexp_replace("t", _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return aug.select(
        "doc_id",
        F.size(F.regexp_extract_all("t", F.lit(_EMAIL_RE), 0)).alias("n_emails"),
        F.size(F.regexp_extract_all("t", F.lit(_PHONE_RE), 0)).alias("n_phones"),
        F.md5(masked.cast("binary")).alias("masked_md5"),
        F.length("t").alias("n_chars_scanned"),
    )


@query(
    "docs_listagg_sources",
    """
    SELECT lang, count(*) AS n_docs,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources
    FROM documents GROUP BY lang
    """,
)
def docs_listagg_sources(spark, sf_dir):
    """Ordered string aggregation via Spark 4's ``listagg`` (SQL:2016
    WITHIN GROUP) — the manifest-building aggregate (per-language
    source lists, per-cluster member rosters) that previously needed
    collect_list + array_sort + array_join. DISTINCT + a total ORDER BY
    make the result deterministic, so it hash-matches DuckDB's
    string_agg byte-for-byte. Scale note: the aggregate buffer is the
    distinct-source set per group — bounded by the source domain, not
    rows; an unbounded-domain listagg (e.g. per-doc token concat)
    belongs in docs_pack_sequences' window form instead."""
    d = t(spark, sf_dir, "documents")
    d.createOrReplaceTempView("v_docs_listagg")
    return spark.sql(
        """
        SELECT lang, count(*) AS n_docs,
               listagg(DISTINCT source, ',') WITHIN GROUP (ORDER BY source)
                 AS sources
        FROM v_docs_listagg GROUP BY lang
        """
    )


def strip_frequent_lines(
    docs,
    min_df: int = 3,
    delimiter: str = "\n",
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_boilerplate: bool = True,
):
    """C4-style boilerplate removal: delete every line that occurs in
    at least ``min_df`` DISTINCT documents (nav menus, cookie banners,
    "subscribe" footers — the lines whose document frequency betrays
    them as template, not content). Returns ``docs`` with ``text_col``
    rewritten; line order inside each document is preserved, documents
    reduced to nothing become empty strings (drop them with the
    quality gate, which is the pipeline stage that owns that policy).

    Scale shape: one explode -> one df-count aggregation (partial
    map-side combine on the line hash) -> the frequent-line set, which
    is SMALL by construction (template lines are few; unique content
    never passes min_df), broadcast into an anti-join — the corpus is
    shuffled once for reassembly (groupBy doc, sort_array over
    (position, line) structs restores order), never sorted globally.
    Pass ``broadcast_boilerplate=False`` for pathological corpora
    where the frequent set itself is huge and AQE should pick sides.

    The synthetic driver corpus has no newlines/boilerplate, so the
    semantics are pinned by the planted-fixture pytest
    (tests/test_plans.py::test_strip_frequent_lines_*) rather than a
    vacuous registry row."""
    # F.split takes a Java REGEX while concat_ws rejoins with the
    # LITERAL delimiter — escape metacharacters so e.g. '|' or '.'
    # split on the literal character, not on every position
    delim_regex = "".join(
        ch if ch.isalnum() else "\\" + ch for ch in delimiter
    )
    lines = docs.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.col(text_col), F.lit(delim_regex), -1)
        ).alias("_pos", "_line"),
    )
    freq = (
        lines.filter(F.trim("_line") != "")
        .groupBy("_line")
        .agg(F.count_distinct(id_col).alias("_df"))
        .filter(F.col("_df") >= int(min_df))
        .select("_line")
    )
    if broadcast_boilerplate:
        freq = F.broadcast(freq)
    kept = lines.join(freq, "_line", "left_anti")
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            delimiter,
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("_pos", "_line"))
                ),
                lambda s: s["_line"],
            ),
        ).alias("_new_text")
    )
    return (
        docs.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce("_new_text", F.lit("")))
        .drop("_new_text")
    )


@query(
    "doc_tfidf_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(list_filter(string_split(text, ' '), x -> x <> ''))
               AS token
      FROM documents
    ), tf AS (
      SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2
    ), df AS (
      SELECT token, count(DISTINCT doc_id) AS df FROM toks GROUP BY 1
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT t.doc_id, t.token, CAST(t.tf AS BIGINT) AS tf,
           CAST(d.df AS BIGINT) AS df,
           round(t.tf * ln(CAST(n.n_docs AS DOUBLE) / d.df), 6) AS tfidf
    FROM tf t JOIN df d USING (token) CROSS JOIN n
    WHERE t.doc_id < 20
    """,
)
def doc_tfidf_terms(spark, sf_dir):
    """TF-IDF term weighting — the keyword-extraction primitive of a
    text pipeline (the reference's dashboard surfaces raw keyword
    counts, `load_to_gold_layer.py:40-43`; TF-IDF is the corpus-aware
    upgrade). tf per (doc, token), df per token over the WHOLE corpus,
    weight = tf * ln(N / df).

    Scale shape: two hash aggregations (both map-side partial) and one
    equi-join on the token — no window, no sort, no all-pairs; the
    1-row corpus count broadcasts. Output is the raw weighted terms of
    20 docs (ranking-free: cross-engine `ln` can differ in the last
    ulp, so a top-k rank could flip on near-ties — the top-k form is
    the in-engine `tfidf_topk_terms` below, pinned by pytest).

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows);
    oracle-verified every pytest run by test_oracle_queries."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.explode(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "token"
        ),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = d.agg(F.count("*").alias("n_docs"))
    return (
        tf.filter(F.col("doc_id") < 20)
        .join(df, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            F.col("tf").cast("bigint").alias("tf"),
            F.col("df").cast("bigint").alias("df"),
            r6(
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("tfidf"),
        )
    )


def tfidf_topk_terms(
    docs,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Top-k characteristic terms per document by TF-IDF — the form a
    keyword extractor actually serves. Deterministic tie-break
    (weight desc, token asc); one partitioned window per doc, no
    global sort. In-engine only: see doc_tfidf_terms for why the
    ranked form carries no cross-engine oracle."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
        ).alias("token"),
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    df = toks.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(df, "token")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= int(k))
        .select("doc_id", "rk", "token", "tf", "df", r6(F.col("tfidf")).alias("tfidf"))
    )


def compression_ratios(
    docs,
    id_col: str = "doc_id",
    text_col: str = "text",
    level: int = 6,
):
    """Per-document zlib compression ratio — the RefinedWeb/Gopher-family
    quality signal the token-level heuristics miss: heavily repetitive
    boilerplate compresses far below normal prose (ratio -> 0), while
    random/obfuscated junk barely compresses (ratio -> 1); both tails
    are removal candidates. Returns (id, n_bytes, n_compressed, ratio).

    Arrow-batched ``mapInPandas`` (the documented exception class: zlib
    is not expressible as Catalyst expressions); DEFLATE with a fixed
    level is fully deterministic, so the output is reproducible across
    runs and partitionings. Empty documents get ratio 1.0 (nothing to
    compress, nothing saved)."""
    import pandas as pd  # noqa: F401 (signature clarity)

    def score(batches):
        import zlib

        import pandas as pd

        for pdf in batches:
            raw = pdf[text_col].fillna("").str.encode("utf-8")
            n_bytes = raw.str.len().astype("int64")
            n_comp = raw.map(lambda b: len(zlib.compress(b, level))).astype(
                "int64"
            )
            ratio = (n_comp / n_bytes.where(n_bytes > 0)).fillna(1.0)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n_bytes,
                    "n_compressed": n_comp,
                    "ratio": ratio.round(6),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(
        score, f"{id_col} long, n_bytes long, n_compressed long, ratio double"
    )


@query("doc_compression_ratio", None)
def doc_compression_ratio(spark, sf_dir):
    """Compression-ratio quality scan over the documents table (see
    ``compression_ratios``). Deliberately NO SQL oracle: DuckDB has no
    zlib surface, so cross-engine value equality is impossible — the
    semantics (monotone separation of repetitive vs diverse text,
    determinism, byte accounting) are pinned by
    tests/test_plans.py::test_compression_ratio_separates_quality.

    Registered in the DEFERRED_TAIL (driver window frozen at 50 rows)."""
    return compression_ratios(t(spark, sf_dir, "documents"))


@query(
    "doc_duplicate_passages",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS t
      FROM documents
    ), grams AS (
      SELECT doc_id, u.pos, u.gram FROM (
        SELECT doc_id,
               unnest([{'pos': i - 1,
                        'gram': list_aggregate(t[i:i+7], 'string_agg', ' ')}
                       FOR i IN range(1, greatest(len(t) - 7, 0) + 1)]) AS u
        FROM toks)
    ), capped AS (
      SELECT doc_id, pos, gram FROM (
        SELECT *, count(*) OVER (PARTITION BY gram) AS occ FROM grams
      ) WHERE occ <= 50
    ), m AS (
      SELECT a.doc_id AS doc_a, a.pos AS pos_a,
             b.doc_id AS doc_b, b.pos AS pos_b,
             a.pos - b.pos AS diag
      FROM capped a JOIN capped b
        ON a.gram = b.gram AND a.doc_id < b.doc_id
    ), isl AS (
      SELECT *, pos_a - row_number() OVER (
               PARTITION BY doc_a, doc_b, diag ORDER BY pos_a) AS run
      FROM m
    )
    SELECT doc_a, doc_b, min(pos_a) AS pos_a, min(pos_b) AS pos_b,
           count(*) + 7 AS span_tokens
    FROM isl GROUP BY doc_a, doc_b, diag, run
    HAVING count(*) + 7 >= 12
    ORDER BY doc_a, doc_b, pos_a, pos_b
    """,
)
def doc_duplicate_passages(spark, sf_dir):
    """Substring-level dedup (Lee et al. 2022): exact shared passages
    of >= 12 whitespace tokens across distinct documents, located by
    position on both sides — the leakage/boilerplate detector that
    document-level MinHash/SimHash signatures dilute below threshold.
    Positional 8-gram hash join + diagonal run-merge; oracle is the
    identical computation on gram STRINGS (the Spark side joins on
    xxhash64 — 8 bytes of shuffle per gram; identical output modulo a
    2^-64 collision). See operators.dedup.duplicate_passages for the
    scale analysis."""
    from ..operators.dedup import duplicate_passages

    d = t(spark, sf_dir, "documents")
    return duplicate_passages(
        d, n=8, min_span_tokens=12, max_gram_occurrences=50
    ).orderBy("doc_a", "doc_b", "pos_a", "pos_b")
