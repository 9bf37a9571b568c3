"""S13 tests: in-engine article extraction — tag stripping, per-site
premium markers, Dutch AND Polish date normalization, and graceful
handling of pages with missing pieces."""

from __future__ import annotations

from pyspark.sql import Row

from bda_spark.schemas import NEWS_SCHEMA
from bda_spark.sources.articles import euro_date_to_date, extract_articles

PAGE_NL = (
    '<html><head><meta name="keywords" content="olie, energie"/></head>'
    "<body><h1>Olie <b>omhoog</b></h1>"
    '<div data-premium="true">besloten</div>'
    "<p>Eerste <i>alinea</i>.</p><p>Tweede alinea.</p>"
    '<span class="date">3 mei 2024</span></body></html>'
)
PAGE_PL = (
    "<html><head></head><body><h1>Węgiel w dół</h1>"
    "<p>Pierwszy akapit.</p>"
    '<span class="date">17 września 2024</span></body></html>'
)


def _extract(spark, rows):
    pages = spark.createDataFrame(rows, "url string, html string")
    return {r.url: r for r in extract_articles(pages).collect()}


def test_extraction_fields_and_schema(spark):
    got = _extract(
        spark,
        [
            Row(url="https://beurs.example.invalid/articles/1", html=PAGE_NL),
            Row(url="https://wnp.example.invalid/articles/2", html=PAGE_PL),
        ],
    )
    nl = got["https://beurs.example.invalid/articles/1"]
    assert nl.title == "Olie  omhoog"  # inner tags stripped to spaces
    assert nl.text == "Eerste  alinea . Tweede alinea."
    assert nl.date == "2024-05-03"  # Dutch 'mei'
    assert nl.keywords == ["olie", "energie"]
    assert nl.is_premium is True  # beurs marker = data-premium="true"
    assert nl.source_site == "beurs.example.invalid"
    pl = got["https://wnp.example.invalid/articles/2"]
    assert pl.title == "Węgiel w dół"
    assert pl.date == "2024-09-17"  # Polish 'września' (diacritics)
    assert pl.keywords == []  # no keywords meta -> empty array
    assert pl.is_premium is False  # wnp marker absent
    # output column names line up with the NEWS_SCHEMA ingest shape
    pages = spark.createDataFrame(
        [Row(url="https://x/1", html=PAGE_NL)], "url string, html string"
    )
    assert extract_articles(pages).columns == NEWS_SCHEMA.fieldNames()


def test_premium_marker_is_site_scoped(spark):
    """The SAME page body is premium on the site whose marker it
    carries and non-premium elsewhere (per-site config, not a global
    substring)."""
    got = _extract(
        spark,
        [
            Row(url="https://beurs.example.invalid/articles/1", html=PAGE_NL),
            Row(url="https://energetyka.example.invalid/articles/1", html=PAGE_NL),
        ],
    )
    assert got["https://beurs.example.invalid/articles/1"].is_premium is True
    assert got["https://energetyka.example.invalid/articles/1"].is_premium is False


def test_euro_date_handles_both_languages_and_bad_input(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("1 januari 2024",), ("28 grudnia 2023",), ("not a date",), ("",)],
        "s string",
    )
    got = [r.d for r in df.select(euro_date_to_date(F.col("s")).alias("d")).collect()]
    assert [str(d) if d else None for d in got] == [
        "2024-01-01", "2023-12-28", None, None,
    ]
