"""Embedding / similarity-search queries over ``embeddings`` (SURVEY
extension: ANN + embedding near-dup for training-data pipelines).

``embeddings(vec_id, embedding float[64], label)``. All similarity math
is JVM-side higher-order functions (zip_with/aggregate) — no UDFs; the
brute-force top-k is the exactness baseline, the LSH-bucketed variant in
bda_spark.operators.similarity is the 100 TB path.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from pyspark.sql import Column

from ..functions.vectors import dot_col, l2_norm_col
from .registry import query, r6, t



# Oracle-side cosine in double precision (duckdb list_cosine_similarity on
# FLOAT[] computes in float32; we cast to DOUBLE[] to match Spark's math).
# zero-norm convention matches functions.vectors.cosine_similarity_col:
# a zero vector is similar to nothing (0), never NaN
_COS_SQL = """
  CASE WHEN sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))
            * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x))) = 0
       THEN 0.0
       ELSE list_dot_product(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))
            / (sqrt(list_sum(list_transform(CAST(a.embedding AS DOUBLE[]), x -> x * x)))
               * sqrt(list_sum(list_transform(CAST(b.embedding AS DOUBLE[]), x -> x * x))))
  END
"""


@query(
    "cosine_topk",
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
def cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k ANN baseline: queries (vec_id<5) x corpus
    crossjoin -> zip_with dot product -> rank window -> k=5. The query
    side broadcasts; corpus scan stays partitioned, so the plan is a
    single pass over the big table at any scale."""
    e = t(spark, sf_dir, "embeddings")
    # Norms are computed once per row on each join input (materialized by
    # the broadcast/exchange), so pairwise work is one dot + one divide.
    v = F.col("embedding").cast("array<double>")
    qs = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), v.alias("qv"), l2_norm_col(v).alias("qn")
    )
    corpus = e.select(
        F.col("vec_id").alias("neighbor_id"), v.alias("nv"), l2_norm_col(v).alias("nn")
    )
    sims = (
        F.broadcast(qs)
        .join(corpus, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.when(
                F.col("qn") * F.col("nn") == 0.0, F.lit(0.0)
            ).otherwise(
                dot_col(F.col("qv"), F.col("nv")) / (F.col("qn") * F.col("nn"))
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), "neighbor_id")
    return (
        sims.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", "neighbor_id", r6(F.col("sim")).alias("cosine"), "rk")
    )


@query(
    "embedding_norms_by_label",
    """
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))), 6)
             AS avg_norm
    FROM embeddings GROUP BY label
    """,
)
def embedding_norms_by_label(spark, sf_dir):
    """Vector-norm profile per class — aggregate over a higher-order
    expression, fully JVM-side."""
    e = t(spark, sf_dir, "embeddings")
    norm = l2_norm_col(F.col("embedding").cast("array<double>"))
    return e.groupBy("label").agg(
        F.count("*").alias("n"), r6(F.avg(norm)).alias("avg_norm")
    )


@query(
    "embedding_neardup_pairs",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS_SQL} >= 0.45
    ORDER BY id_a, id_b
    """,
)
def embedding_neardup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate detection (threshold 0.45 — chosen so the synthetic corpus, which has no true near-dups, still exercises the full plan) — the
    semantic-dedup primitive. Brute force O(n^2) here as the exact
    oracle; the scale path buckets by random-hyperplane sign (SimHash)
    first — bda_spark.operators.similarity.simhash_neardup_pairs,
    registered as the simhash_neardup_pairs query with this same SQL
    as its oracle. No broadcast hint: AQE broadcasts at test sizes on
    its own, and on a corpus too big for that a hint would OOM the
    driver instead of degrading to a (still-all-pairs) sort-merge."""
    e = t(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    a = e.select(
        F.col("vec_id").alias("id_a"), v.alias("va"), l2_norm_col(v).alias("na")
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), v.alias("vb"), l2_norm_col(v).alias("nb")
    )
    den = F.col("na") * F.col("nb")
    sim = F.when(den == 0.0, F.lit(0.0)).otherwise(
        dot_col(F.col("va"), F.col("vb")) / den
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine_raw", sim)
        .filter(F.col("cosine_raw") >= 0.45)
        .select("id_a", "id_b", r6(F.col("cosine_raw")).alias("cosine"))
        .orderBy("id_a", "id_b")
    )
