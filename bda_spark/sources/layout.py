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
