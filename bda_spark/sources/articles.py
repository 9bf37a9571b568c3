"""S13: the news-article extraction surface, in-engine (SURVEY.md §2.1
S13, §2.8 F12).

The reference scrapes with requests + BeautifulSoup in a driver-side
Python loop — url discovery, per-site config, premium detection,
Dutch/Polish date normalization (reference: Deliverable_2/Batch Data
Codes/scraper.py:21-300, date normalization :355-395, per-site config
variables_dict.json). Only the network fetch is inherently
out-of-engine; everything AFTER the bytes land is columnar compute and
belongs in the engine, where it parallelizes over the corpus instead
of iterating one article at a time:

- tag extraction       -> regexp_extract / regexp_extract_all (JVM-side)
- tag stripping        -> regexp_replace
- keyword meta         -> regexp_extract + split
- premium detection    -> per-site marker predicates (one CASE chain)
- euro-date normalize  -> month-name map + to_date (replaces strptime
                          loops and the Dutch month dict,
                          scraper.py:355-395)

Input is a DataFrame of (url, html) raw landed pages; output is the
NEWS_SCHEMA article shape the rest of the pipeline already ingests.
At 100 TB this is a narrow map over the landed pages — no shuffle, no
UDF, full codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Month-name -> month-number for the two languages the reference's
# sites use (scraper.py:355-395 normalizes Dutch; the Polish sites'
# genitive month names are the same public fact).
MONTHS = {
    # Dutch
    "januari": 1, "februari": 2, "maart": 3, "april": 4, "mei": 5,
    "juni": 6, "juli": 7, "augustus": 8, "september": 9, "oktober": 10,
    "november": 11, "december": 12,
    # Polish (genitive, as written in dates)
    "stycznia": 1, "lutego": 2, "marca": 3, "kwietnia": 4, "maja": 5,
    "czerwca": 6, "lipca": 7, "sierpnia": 8, "września": 9,
    "października": 10, "listopada": 11, "grudnia": 12,
}

# Per-site premium markers (the reference keeps these in
# variables_dict.json; site keys here are the synthetic test domains).
DEFAULT_PREMIUM_MARKERS = {
    "wnp.example.invalid": 'class="premium-content"',
    "beurs.example.invalid": 'data-premium="true"',
    "energetyka.example.invalid": 'id="paywall"',
}


def euro_date_to_date(col: Column) -> Column:
    """'12 januari 2024' / '7 września 2024' -> DATE. One month-name
    map lookup plus to_date — the engine form of the reference's
    strptime + month-dict loop."""
    s = F.lower(F.trim(col))
    day = F.regexp_extract(s, r"^(\d{1,2})\b", 1)
    month_name = F.regexp_extract(s, r"^\d{1,2}\s+(\S+)", 1)
    year = F.regexp_extract(s, r"(\d{4})$", 1)
    pairs: list[Column] = []
    for name, num in MONTHS.items():
        pairs += [F.lit(name), F.lit(num)]
    month = F.element_at(F.create_map(*pairs), month_name)
    # try_to_date: unparseable page dates become NULL (the scraper's
    # tolerance), never an ANSI-mode job abort
    return F.try_to_date(
        F.concat_ws("-", year, F.lpad(month.cast("string"), 2, "0"),
                    F.lpad(day, 2, "0")),
        "yyyy-MM-dd",
    )


def _strip_tags(col: Column) -> Column:
    return F.trim(F.regexp_replace(col, r"<[^>]+>", " "))


def extract_articles(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    premium_markers: dict[str, str] | None = None,
) -> DataFrame:
    """(url, html) landed pages -> NEWS_SCHEMA-shaped articles.

    Extraction contract (mirrors scraper.py:152-283):
    - title: first <h1> block, tags stripped
    - text: all <p> blocks, tags stripped, space-joined
    - date: <span class="date"> content through euro-date normalization
    - keywords: <meta name="keywords" content="..."> split on commas
    - is_premium: the site's configured marker appears in the page
    - source_site: url host
    """
    markers = premium_markers or DEFAULT_PREMIUM_MARKERS
    html = F.col(html_col)
    site = F.regexp_extract(F.col(url_col), r"^[a-z]+://([^/]+)", 1)
    premium = F.lit(False)
    for host, marker in markers.items():
        premium = F.when(
            site == F.lit(host), html.contains(F.lit(marker))
        ).otherwise(premium)
    paragraphs = F.transform(
        F.regexp_extract_all(html, F.lit(r"(?s)<p[^>]*>(.*?)</p>"), F.lit(1)),
        _strip_tags,
    )
    keywords_raw = F.regexp_extract(
        html, r'<meta\s+name="keywords"\s+content="([^"]*)"', 1
    )
    return pages.select(
        _strip_tags(F.regexp_extract(html, r"(?s)<h1[^>]*>(.*?)</h1>", 1)).alias(
            "title"
        ),
        F.concat_ws(" ", paragraphs).alias("text"),
        F.date_format(
            euro_date_to_date(
                F.regexp_extract(
                    html, r'(?s)<span class="date">(.*?)</span>', 1
                )
            ),
            "yyyy-MM-dd",
        ).alias("date"),
        F.when(keywords_raw == "", F.array().cast("array<string>"))
        .otherwise(F.split(keywords_raw, r",\s*"))
        .alias("keywords"),
        premium.alias("is_premium"),
        site.alias("source_site"),
        F.col(url_col).alias("url"),
        F.monotonically_increasing_id().cast("string").alias("random"),
    )


def synthesize_pages(docs: DataFrame) -> DataFrame:
    """Deterministic HTML pages from the documents table — the test/
    correctness stand-in for landed scrape output (no network in the
    engine, exactly as the reference keeps fetching outside Spark).
    Every field of the page is a pure function of (doc_id, text), so an
    oracle can compute the expected extraction WITHOUT parsing HTML."""
    sites = F.array(*[F.lit(s) for s in DEFAULT_PREMIUM_MARKERS])
    site = F.element_at(sites, F.pmod("doc_id", F.lit(3)).cast("int") + 1)
    url = F.concat(F.lit("https://"), site, F.lit("/articles/"), F.col("doc_id"))
    month_names = list(MONTHS)  # insertion order: 12 Dutch then 12 Polish
    month_idx = F.pmod("doc_id", F.lit(12)).cast("int")
    lang_off = (F.pmod("doc_id", F.lit(2)) * 12).cast("int")
    month_name = F.element_at(
        F.array(*[F.lit(m) for m in month_names]), month_idx + lang_off + 1
    )
    day = (F.pmod("doc_id", F.lit(28)) + 1).cast("int")
    date_span = F.concat(
        F.lit('<span class="date">'), day.cast("string"), F.lit(" "),
        month_name, F.lit(" 2024</span>"),
    )
    kw = F.array_join(F.slice(F.split("text", " "), 1, 3), ", ")
    marker_for_site = F.element_at(
        F.array(*[F.lit(m) for m in DEFAULT_PREMIUM_MARKERS.values()]),
        F.pmod("doc_id", F.lit(3)).cast("int") + 1,
    )
    premium_div = F.when(
        F.pmod("doc_id", F.lit(5)) == 0,
        F.concat(F.lit("<div "), marker_for_site, F.lit(">locked</div>")),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit('<html><head><meta name="keywords" content="'), kw,
        F.lit('"/></head><body><h1>Article '), F.col("doc_id"),
        F.lit("</h1>"), premium_div, F.lit("<p>"), F.col("text"),
        F.lit("</p>"), date_span, F.lit("</body></html>"),
    )
    return docs.select(F.col("doc_id"), url.alias("url"), html.alias("html"))
