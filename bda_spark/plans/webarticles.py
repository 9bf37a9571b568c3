"""S13 as a CORRECTNESS query: deterministic HTML pages are synthesized
from the documents table IN-ENGINE, pushed through the full article
extraction (sources.articles.extract_articles — regexp tag extraction,
tag stripping, per-site premium markers, Dutch/Polish date
normalization), and the oracle computes the EXPECTED extraction output
directly from (doc_id, text) without ever touching HTML. A hash match
therefore proves the build->parse round trip is lossless — i.e. the
extraction expressions really invert the page structure, including the
month-name date normalization in both languages.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..sources.articles import extract_articles, synthesize_pages
from .registry import query, t


@query(
    "scraped_articles",
    """
    SELECT doc_id AS article_id,
           'Article ' || doc_id AS title,
           length(trim(text)) AS n_text_chars,
           strftime(make_date(2024, CAST(doc_id % 12 + 1 AS INTEGER),
                              CAST(doc_id % 28 + 1 AS INTEGER)),
                    '%Y-%m-%d') AS date,
           (doc_id % 5 = 0) AS is_premium,
           least(len(list_filter(string_split(text, ' '), x -> x <> '')), 3)
             AS n_keywords,
           CASE doc_id % 3 WHEN 0 THEN 'wnp.example.invalid'
                           WHEN 1 THEN 'beurs.example.invalid'
                           ELSE 'energetyka.example.invalid' END AS source_site
    FROM documents WHERE doc_id < 200
    """,
)
def scraped_articles(spark, sf_dir):
    """Synthesize pages for doc_id < 200, extract articles back, and
    project comparable fields (article_id recovered from the url —
    extraction never sees doc_id directly)."""
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    articles = extract_articles(synthesize_pages(docs))
    return articles.select(
        F.regexp_extract("url", r"/articles/(\d+)$", 1)
        .cast("long")
        .alias("article_id"),
        "title",
        F.length("text").alias("n_text_chars"),
        "date",
        "is_premium",
        F.size("keywords").alias("n_keywords"),
        "source_site",
    )
