"""Micro-batch-owned append dirs with versioned compaction — the
replay-idempotent, bounded-file-count sink shape for foreachBatch
appenders (predictions, correlations).

Problem: foreachBatch is at-least-once after a failure, so a blind
``append`` lands a replayed batch twice; per-batch OVERWRITE of one
``batch=<id>`` subdirectory fixes replay (each batch owns its dir) but
grows one directory per micro-batch forever — the small-file path that
kills a 1-second-trigger table at scale. This module adds the
maintenance half: periodically ABSORB the batch dirs into a
read-optimized versioned generation (``sources.versioned`` — reader-
atomic commit markers) that records the max absorbed batch id as a
HIGH-WATERMARK sidecar, the property the reference got for free from
Cassandra's PK-upsert absorbing appends (reference:
NEW_train_offset_3_10min.py:259-270) rebuilt on parquet:

    table/
      batch=00000017/...        hot path: one dir per micro-batch
      _versions/gen-00000003/   compacted data (+ _watermark sidecar)
      _commits/00000003.…       atomic generation markers

- WRITE (per micro-batch): overwrite ``batch=<id>`` — minimum files,
  no shuffle, no hive splitting; the writer SKIPS ids at or below the
  compacted watermark, so a crash-replay of an already-absorbed batch
  is a no-op instead of resurrecting a stale dir.
- READ: compacted generation ∪ batch dirs ABOVE the watermark — exact
  at every instant, including between a compaction commit and its
  cleanup of absorbed dirs (those are ≤ watermark, hence ignored).
- COMPACT: union current generation + fresh batch dirs into a new
  generation (hive-partitioned / re-laid-out for reads), write the new
  watermark INSIDE the generation dir (atomic with the commit marker),
  vacuum old generations, delete absorbed dirs. Crash anywhere
  replays safely: before the marker = invisible debris; after the
  marker but before cleanup = absorbed dirs are ≤ watermark and
  ignored until the next compaction sweeps them.

At 100 TB: the hot path stays O(batch) with zero shuffle; file count
is bounded by (batches since last compaction + compacted layout), not
stream lifetime; reads of old data hit large sorted/hive-partitioned
files, not a million micro-batch fragments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..sources.sinks import _hadoop_path
from ..sources.versioned import (
    commit_generation,
    is_versioned,
    resolve_table,
    vacuum_versions,
)

BATCH_PREFIX = "batch="
WATERMARK_FILE = "_watermark"


def _batch_dirs(spark: SparkSession, root: str) -> dict[int, str]:
    """Existing ``batch=<id>`` dirs under ``root``: id -> path."""
    fs, root_p = _hadoop_path(spark, root)
    if not fs.exists(root_p):
        return {}
    out: dict[int, str] = {}
    for st in fs.listStatus(root_p):
        name = st.getPath().getName()
        if name.startswith(BATCH_PREFIX) and name[len(BATCH_PREFIX):].isdigit():
            out[int(name[len(BATCH_PREFIX):])] = f"{root.rstrip('/')}/{name}"
    return out


def legacy_layout_entries(spark: SparkSession, root: str) -> list[str]:
    """Root-level entries that belong to neither the batch-dir nor the
    versioned layout — i.e. data appended by a pre-batch-dir writer.
    Mixing the two layouts under one root fails Spark's partition
    discovery ('conflicting directory structures'), so both the writer
    and the reader refuse while these exist (run
    ``migrate_batch_layout`` once, offline)."""
    fs, root_p = _hadoop_path(spark, root)
    if not fs.exists(root_p):
        return []
    out = []
    for st in fs.listStatus(root_p):
        name = st.getPath().getName()
        if name.startswith((BATCH_PREFIX, "_", ".")):
            continue
        out.append(name)
    return sorted(out)


def _require_batch_layout(spark: SparkSession, root: str) -> None:
    legacy = legacy_layout_entries(spark, root)
    if legacy:
        raise IOError(
            f"{root} mixes a legacy append layout (root-level entries "
            f"{legacy[:5]}{'...' if len(legacy) > 5 else ''}) with "
            f"batch=<id> dirs — Spark partition discovery cannot read "
            f"that. Run streaming.batchdir.migrate_batch_layout(spark, "
            f"root) once (offline) to absorb the legacy data."
        )


def compacted_watermark(spark: SparkSession, root: str) -> int:
    """Max batch id absorbed into the compacted generation; -1 when
    nothing has been compacted. One generation-resolve + one tiny file
    read."""
    if not is_versioned(spark, root):
        return -1
    gen_dir = resolve_table(spark, root)
    fs, wm_p = _hadoop_path(spark, f"{gen_dir}/{WATERMARK_FILE}")
    if not fs.exists(wm_p):
        return -1
    jvm = spark._jvm
    reader = jvm.java.io.BufferedReader(
        jvm.java.io.InputStreamReader(fs.open(wm_p), "UTF-8")
    )
    try:
        line = reader.readLine()
    finally:
        reader.close()
    return int(line.strip()) if line and line.strip().lstrip("-").isdigit() else -1


def _write_watermark(spark: SparkSession, data_dir: str, watermark: int) -> None:
    fs, wm_p = _hadoop_path(spark, f"{data_dir}/{WATERMARK_FILE}")
    out = fs.create(wm_p, True)
    try:
        out.write(bytearray(str(int(watermark)).encode("utf-8")))
    finally:
        out.close()


def write_batch_dir(df: DataFrame, root: str, batch_id: int) -> bool:
    """The hot-path sink for one micro-batch: overwrite this batch's
    own ``batch=<id>`` dir (replay-idempotent — a re-run batch rewrites
    its own rows and nothing else). Skips (returning False) when the
    batch is already absorbed into the compacted table, so a crash-
    replay from an old checkpoint cannot resurrect a stale dir that
    double-counts against the compacted copy. No shuffle, no hive
    splitting: read-optimized layout is COMPACTION's job, not the
    ingest path's."""
    spark = df.sparkSession
    _require_batch_layout(spark, root)
    if int(batch_id) <= compacted_watermark(spark, root):
        return False
    df.write.mode("overwrite").parquet(
        f"{root.rstrip('/')}/{BATCH_PREFIX}{int(batch_id)}"
    )
    return True


def read_batch_table(
    spark: SparkSession, root: str, schema: StructType
) -> DataFrame:
    """The exact current table: compacted generation ∪ batch dirs above
    the watermark. Returns an EMPTY frame of ``schema`` when neither
    exists yet (a dashboard polling before the first micro-batch lands
    gets zero rows, not an exception). ``schema`` must match the
    writer's columns; the inferred ``batch`` partition column is
    dropped."""
    _require_batch_layout(spark, root)
    wm = compacted_watermark(spark, root)
    parts: list[DataFrame] = []
    if is_versioned(spark, root):
        parts.append(spark.read.parquet(resolve_table(spark, root)))
    fresh = sorted(
        path for bid, path in _batch_dirs(spark, root).items() if bid > wm
    )
    if fresh:
        parts.append(
            spark.read.option("basePath", root).parquet(*fresh).drop("batch")
        )
    if not parts:
        return spark.createDataFrame([], schema)
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return df


def compact_batch_dirs(
    spark: SparkSession,
    root: str,
    partition_by: list[str] | None = None,
    vacuum_keep: int = 2,
    vacuum_min_age_seconds: float = 0.0,
) -> int:
    """Maintenance: absorb every batch dir above the current watermark
    into a new read-optimized generation (hive-partitioned by
    ``partition_by`` with one file per partition value) whose
    ``_watermark`` sidecar — written INSIDE the generation dir, hence
    atomic with its commit marker — records the max absorbed batch id.
    Then vacuums superseded generations and deletes the absorbed dirs.
    Returns the new watermark (the old one when there was nothing to
    absorb).

    Crash-safe at every point: a crash before the commit marker leaves
    invisible debris (next run redoes the work); after the marker but
    before cleanup, the absorbed dirs sit ≤ watermark where readers and
    the batch writer already ignore them, and this function's next run
    deletes them before absorbing anything new."""
    _require_batch_layout(spark, root)
    wm = compacted_watermark(spark, root)
    dirs = _batch_dirs(spark, root)
    fs, _ = _hadoop_path(spark, root)
    # cleanup from a prior run that crashed between commit and delete
    for bid, path in sorted(dirs.items()):
        if bid <= wm:
            _, p = _hadoop_path(spark, path)
            fs.delete(p, True)
    fresh = {bid: path for bid, path in dirs.items() if bid > wm}
    if not fresh:
        return wm
    new_wm = max(fresh)

    def _write(data_dir: str) -> None:
        parts: list[DataFrame] = []
        if is_versioned(spark, root):
            parts.append(spark.read.parquet(resolve_table(spark, root)))
        parts.append(
            spark.read.option("basePath", root)
            .parquet(*sorted(fresh.values()))
            .drop("batch")
        )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        if partition_by:
            # one shuffle keyed on the partition columns -> one file
            # per partition value instead of (tasks x values) fragments
            writer = df.repartition(*partition_by).write.partitionBy(
                *partition_by
            )
        else:
            writer = df.write
        writer.mode("overwrite").parquet(data_dir)
        _write_watermark(spark, data_dir, new_wm)

    commit_generation(spark, root, _write)
    vacuum_versions(
        spark, root, keep=vacuum_keep, min_age_seconds=vacuum_min_age_seconds
    )
    for bid, path in sorted(fresh.items()):
        _, p = _hadoop_path(spark, path)
        fs.delete(p, True)
    return new_wm


def migrate_batch_layout(spark: SparkSession, root: str) -> int:
    """One-time OFFLINE migration of a legacy append-at-root table into
    the batch-dir layout: the root-level data moves into generation 1
    (watermark -1, so every existing and future ``batch=<id>`` dir
    stays visible) and the marker commits. Run without concurrent
    readers or writers — the per-entry rename window exists only here.
    Returns the number of entries moved."""
    if is_versioned(spark, root):
        raise ValueError(
            f"migrate_batch_layout: {root} already has compacted "
            f"generations; root-level legacy entries alongside them "
            f"need manual reconciliation"
        )
    entries = legacy_layout_entries(spark, root)
    if not entries:
        return 0
    fs, root_p = _hadoop_path(spark, root)
    jvm = spark._jvm

    def _write(data_dir: str) -> None:
        _, data_p = _hadoop_path(spark, data_dir)
        fs.mkdirs(data_p)
        for name in entries:
            _, src = _hadoop_path(spark, f"{root.rstrip('/')}/{name}")
            dest = jvm.org.apache.hadoop.fs.Path(f"{data_dir}/{name}")
            if not fs.rename(src, dest):
                raise IOError(
                    f"migrate_batch_layout: could not move {name} into "
                    f"{data_dir}"
                )
        _write_watermark(spark, data_dir, -1)

    commit_generation(spark, root, _write)
    return len(entries)
