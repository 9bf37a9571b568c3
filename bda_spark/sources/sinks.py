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


def _hadoop_path(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, hpath


def idempotent_merge_parquet(
    spark: SparkSession,
    updates: DataFrame,
    path: str,
    keys: list[str],
) -> None:
    """Upsert-by-primary-key semantics over a parquet table.

    Equivalent of Cassandra's PK overwrite the reference relies on for
    label backfill: rows in ``updates`` replace existing rows with the
    same key; others are kept (a Delta/Iceberg MERGE on a real
    deployment — the write amplification here is the price of plain
    parquet; at 100 TB the table would be partitioned and only touched
    partitions rewritten).

    Crash-safe by construction: the merged output is FULLY written to a
    sibling temp directory before the live path is touched, then swapped
    in with filesystem renames. The live table is never the input of an
    in-flight job that overwrites it (a cache()-then-overwrite would
    silently corrupt on cache eviction mid-write). Table existence is
    checked via the filesystem — a transient read error on an existing
    table propagates instead of being misread as "table absent" and
    destroying it.
    """
    fs, target = _hadoop_path(spark, path)
    if not fs.exists(target):
        updates.write.mode("overwrite").parquet(path)
        return
    existing = spark.read.parquet(path)
    kept = existing.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    merged = kept.unionByName(updates)

    base = path.rstrip("/")
    tmp, old = base + "__merge_tmp", base + "__merge_old"
    fs_tmp, tmp_p = _hadoop_path(spark, tmp)
    fs_old, old_p = _hadoop_path(spark, old)
    fs_tmp.delete(tmp_p, True)
    fs_old.delete(old_p, True)
    merged.write.mode("overwrite").parquet(tmp)  # fully materialized first
    if not fs.rename(target, old_p):
        raise IOError(f"merge swap failed: could not move {path} aside")
    if not fs.rename(tmp_p, target):
        # roll back so the table is never left missing
        fs.rename(old_p, target)
        raise IOError(f"merge swap failed: could not move {tmp} into place")
    fs.delete(old_p, True)
