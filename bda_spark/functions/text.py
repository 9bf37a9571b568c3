"""Text-analysis column expressions (SURVEY extension: LLM-pipeline
language ID). Pure JVM-side Column logic — tokenize once, score
against per-language stopword lists, argmax with deterministic
first-wins tie-break. The classic fast-path heuristic (the reference
corpus carries a ``lang`` label; this computes one)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small high-frequency function-word lists. Overlapping tokens (la, que,
# un...) legitimately score for every language that uses them.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "eine", "zu"],
    "es": ["el", "la", "los", "las", "es", "y", "que", "en", "un", "una"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "un", "une", "pour"],
}


def language_id_col(
    text_col: str | Column,
    stopwords: dict[str, list[str]] | None = None,
    unknown: str = "und",
) -> Column:
    """Detected language code for a text column: per-language stopword
    occurrence counts, argmax (first language in dict order wins ties),
    ``unknown`` when no stopword of any language occurs.

    Whitespace tokenization on single spaces to match the corpus
    format; swap the tokenizer for regexp_extract_all on real text."""
    sw = stopwords or STOPWORDS
    langs = list(sw)
    scores = F.array(
        *[language_score_col(text_col, words) for words in sw.values()]
    )
    mx = F.array_max(scores)
    idx = F.array_position(scores, mx).cast("int")
    lang_arr = F.array(*[F.lit(lang) for lang in langs])
    return F.when(mx > 0, F.element_at(lang_arr, idx)).otherwise(F.lit(unknown))


def canonicalize_text_col(text_col: str | Column) -> Column:
    """Dedup-grade text canonicalization, builtin-expressions only (no
    UDF, stays in codegen): lowercase, strip everything that is not a
    Unicode letter / digit / whitespace, collapse whitespace runs, and
    trim. This is the normalization layer every near-dup family keys
    on in production — without it, `Hello, World` and `hello world`
    shingle apart and every fingerprint misses the match.

    Deliberately NOT included: Unicode NFC/NFKC folding (Spark has no
    builtin normalizer — doing it right needs an Arrow-batched pandas
    UDF upstream of this, worth it only for corpora where composed vs
    decomposed forms actually co-occur) and stemming (language-
    dependent, changes semantics — a corpus policy, not an engine
    default)."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^\p{L}\p{N}\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def nfc_normalize_udf() -> Column:
    """Unicode NFC normalization as an Arrow-batched pandas UDF — the
    one canonicalization step ``canonicalize_text_col`` cannot do with
    builtins (Spark has no normalizer function). Composed vs
    decomposed forms (é as U+00E9 vs e + U+0301) are byte-different
    but render identically, so corpora mixing sources need this fold
    BEFORE fingerprinting or the same visible text dedups apart.

    pandas UDF (not row-at-a-time): the batch arrives as one Arrow
    buffer and ``unicodedata.normalize`` runs per value inside a
    single-column pandas map — the accepted cost profile for an op
    with no JVM expression, isolated here so the rest of the
    canonicalization pipeline stays in codegen. Returns a callable
    column transformer: ``nfc_normalize_udf()(F.col("text"))``."""
    import unicodedata

    import pandas  # noqa: F401 — annotations below resolve against globals
    from pyspark.sql.functions import pandas_udf

    def _nfc(s):
        return s.map(
            lambda t: unicodedata.normalize("NFC", t) if t is not None else None
        )

    # explicit annotations (module has `from __future__ import
    # annotations`, so inline hints stringify and pandas_udf could not
    # resolve the local `pd` alias)
    _nfc.__annotations__ = {"s": pandas.Series, "return": pandas.Series}
    return pandas_udf(_nfc, "string")


def language_score_col(text_col: str | Column, words: list[str]) -> Column:
    """Occurrence count of ``words`` in the whitespace tokens — the raw
    score behind language_id_col, exposed for quality filters.
    (array_contains, not Column.isin — isin doesn't resolve against
    lambda variables inside higher-order functions.)"""
    tokens = F.split(F.lower(text_col), " ")
    vocab = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens, lambda x: F.array_contains(vocab, x)))
