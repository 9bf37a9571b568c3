"""Bucketed tables: co-located, shuffle-free joins (SURVEY §4 scale
fix; the reference shuffles every join because its silver/gold tables
are plain unpartitioned parquet, load_to_silver_layer.py:125).

Bucketing pre-hashes a table into a fixed number of files per bucket
key at WRITE time; two tables bucketed on the join key with the same
bucket count then join with NO Exchange on either side — at 100 TB
that deletes the single most expensive stage of a fact-fact join
(both shuffles) for every downstream query that joins on the bucket
key, amortizing one write-side shuffle across all of them.

Spark ties bucketing metadata to the catalog, so these helpers write
through ``saveAsTable`` with an explicit external ``path`` — the data
stays ordinary parquet on disk; only the bucket spec lives in the
metastore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write ``df`` as an external bucketed parquet table. ``sort_cols``
    additionally sorts within each bucket file, upgrading downstream
    merge joins to zero-sort streams."""
    writer = (
        df.write.mode("overwrite")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read — the bucket spec only applies through the table
    identifier (a bare spark.read.parquet(path) would see plain files
    and re-shuffle)."""
    return spark.table(table)
