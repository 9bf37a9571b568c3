"""Data layout for scan-time pruning (the read-path half of the 100 TB
story; the write-path half is sources/sinks.py + sources/bucketed.py).

Hive partitioning (partitionBy) prunes at DIRECTORY granularity and is
right for low-cardinality keys (date, source). For the high-resolution
axis inside a partition — a timestamp, an id — the lever is RANGE
layout: ``repartitionByRange`` assigns each output file a disjoint
slice of the axis and ``sortWithinPartitions`` orders rows inside it,
so every parquet row group's min/max stats cover a tight range. A
predicate like ``ts BETWEEN a AND b`` then skips whole files (footer
min/max) and whole row groups inside surviving files — the scan cost
becomes proportional to the selected range, not the table.

Spark's range partitioner samples the column to pick balanced bounds
(reservoir sample per partition — one extra lightweight pass), so the
layout stays balanced under skew, where hash-bucketing the axis would
scatter the range across every file and void pruning entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_range_sorted(
    df: DataFrame,
    path: str,
    col: str,
    num_files: int,
    partition_by: list[str] | None = None,
) -> None:
    """Land ``df`` as parquet range-clustered on ``col``: ``num_files``
    files (per hive partition if ``partition_by``), each owning a
    disjoint, internally-sorted slice of the axis.

    ``num_files`` sizes the slices: pick total_bytes / target_file_size
    (128-512 MB files are the parquet sweet spot — at 100 TB that is
    hundreds of thousands of files, which is exactly why the slicing
    must be done by the engine, not a driver loop)."""
    clustered = df.repartitionByRange(num_files, col).sortWithinPartitions(col)
    writer = clustered.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 256 * 1024 * 1024,
) -> int:
    """Small-file compaction — the maintenance job every streaming sink
    needs at scale: micro-batch appends leave thousands of KB-sized
    files whose per-file open/footer cost eventually dominates scans.
    Rewrites ``path`` into ceil(total_bytes / target_file_bytes) files
    (256 MB default — the parquet sweet spot) and returns the new file
    count.

    ``coalesce`` (not repartition) does the merge: a narrow,
    shuffle-free union of input splits — compaction moves bytes once,
    from source files to compacted files, never through an exchange.

    Crash-safe by the same swap discipline as the idempotent merge
    sink: the compacted table is FULLY written to a sibling temp dir,
    the live dir is moved aside, the temp moved in, and the aside copy
    deleted only last; a crash between the renames is healed by the
    recovery scan at the next call (the aside dir IS the table if the
    live dir is missing). Readers never observe a partial table."""
    from .sinks import _hadoop_path

    fs, target = _hadoop_path(spark, path)
    base = path.rstrip("/")
    tmp, old = base + "__compact_tmp", base + "__compact_old"
    _, tmp_p = _hadoop_path(spark, tmp)
    _, old_p = _hadoop_path(spark, old)

    # heal a previous crash: aside dir present + live dir missing
    if fs.exists(old_p) and not fs.exists(target):
        fs.rename(old_p, target)
    fs.delete(tmp_p, True)
    fs.delete(old_p, True)

    if not fs.exists(target):
        raise FileNotFoundError(f"compact_parquet: no table at {path}")
    total = fs.getContentSummary(target).getLength()
    n_files = max(1, -(-total // target_file_bytes))
    df = spark.read.parquet(path)
    df.coalesce(int(n_files)).write.mode("overwrite").parquet(tmp)

    if not fs.rename(target, old_p):
        raise IOError(f"compaction swap failed: could not move {path} aside")
    if not fs.rename(tmp_p, target):
        fs.rename(old_p, target)  # roll back — never leave the table missing
        raise IOError(f"compaction swap failed: could not move {tmp} in")
    fs.delete(old_p, True)
    return int(n_files)
