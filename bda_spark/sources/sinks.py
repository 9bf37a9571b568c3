"""Sinks (SURVEY.md §2.1 S4, S6, S7).

Replaces the reference's driver-side ``collect()`` + per-row CQL INSERT
loop (reference: Deliverable_4/load_to_gold_layer.py:76-97) with
distributed ``df.write``; adds an idempotent key-based merge used by the
label-backfill stream in place of Cassandra read-modify-write
(reference: NEW_train_offset_3_10min.py:301-325).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def overwrite_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """Silver/gold table overwrite; partitioned at scale so downstream
    scans partition-prune (the reference wrote unpartitioned tables)."""
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def append_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    writer = df.write.mode("append")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def idempotent_merge_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
) -> None:
    """Upsert-by-primary-key semantics over a parquet table.

    Equivalent of Cassandra's PK overwrite the reference relies on for
    label backfill: rows in ``updates`` replace existing rows with the
    same key; others are kept. Implemented as anti-join + union +
    overwrite (a Delta/Iceberg MERGE on a real deployment — the write
    amplification here is the price of plain parquet; at 100 TB the
    table would be partitioned and only touched partitions rewritten).
    """
    try:
        existing = spark.read.parquet(path)
    except Exception:
        updates.write.mode("overwrite").parquet(path)
        return
    kept = existing.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    merged = kept.unionByName(updates)
    # Must fully materialize before overwriting the path read above.
    merged.cache()
    merged.count()
    merged.write.mode("overwrite").parquet(path)
    merged.unpersist()
