"""bda_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference system amajczyk/2024Z_BigDataAnalytics
(a financial market + news analytics pipeline), built Spark-first:

- DataFrame/SQL declarative plans (Catalyst optimizes; no hand scheduling)
- medallion batch refinement (bronze -> silver -> gold)
- Structured Streaming (watermarked windows, stream-stream joins,
  foreachBatch train/predict/label-backfill)
- pyspark.ml model tournament with RMSE deploy gating
- large-scale training-data pipeline extensions: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard / embedding cosine),
  similarity search, text analysis, multimodal column plumbing.

The reference composes stock PySpark operators (see SURVEY.md §2);
this engine reproduces that operator surface idiomatically and fixes
the reference's anti-patterns (driver-side collect loops, per-batch
model reloads, row-at-a-time Python UDFs), per SURVEY.md §4.
"""

__version__ = "0.1.0"
