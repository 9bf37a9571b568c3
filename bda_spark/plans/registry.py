"""Query registry: every SURVEY.md §2 operator as a named query over the
driver's testdata tables, each paired with a DuckDB oracle SQL string.

Contract (see __spark_entry__.py): each query fn takes (spark, sf_dir)
and returns a DataFrame whose column NAMES and VALUES match the oracle
SQL run by DuckDB over the same parquet files. Floating aggregates are
rounded to 6 digits on BOTH sides so independent summation orders agree.

The registry is deliberately data-driven: modules register queries with
@query(name, sql) so coverage grows one operator at a time.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.batch import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, sql: str | None = None):
    """Register a (spark, sf_dir) -> DataFrame query, optionally with a
    DuckDB oracle. ``sql=None`` marks non-SQL-expressible ops (the driver
    then records a weaker rows-only check)."""

    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    _ensure_loaded()
    return dict(ORACLES)


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Import for registration side effects.
    from . import (  # noqa: F401
        generated,
        lsh,
        media,
        olap,
        relational,
        reporting,
        textops,
        timeseries,
        vectorops,
        webarticles,
    )

    _LOADED = True


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def r6(c) -> Column:
    """Round a float aggregate to 6 digits (oracle-match policy)."""
    return F.round(c, 6)
