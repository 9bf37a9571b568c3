"""Vector math over array<float|double> columns — pure Column expressions.

Everything stays JVM-side (``aggregate``/``zip_with`` higher-order
functions), no Python UDFs, so ANN/dedup scans run under codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_col(a: Column | str, b: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_col(a: Column | str) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine_similarity_col(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity with the zero-norm convention cos(0, x) = 0:
    a zero vector (an empty document's embedding) has no direction, so
    it is similar to NOTHING — without the guard 0/0 yields NaN, which
    Spark sorts ABOVE every real value descending and passes every
    >= threshold filter, turning zero vectors into universal rank-1
    "neighbors". The oracle SQL twins carry the same CASE guard."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    den = l2_norm_col(a) * l2_norm_col(b)
    return F.when(den == 0.0, F.lit(0.0)).otherwise(dot_col(a, b) / den)
