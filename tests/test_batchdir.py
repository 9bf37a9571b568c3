"""streaming.batchdir: the bounded-file-count foreachBatch sink —
per-micro-batch dirs absorbed into versioned generations with a
batch-id high-watermark (the parquet rebuild of the reference's
Cassandra-absorbs-appends property, NEW_train_offset_3_10min.py:259-270)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from bda_spark.streaming.batchdir import (
    compact_batch_dirs,
    compacted_watermark,
    legacy_layout_entries,
    migrate_batch_layout,
    read_batch_table,
    write_batch_dir,
)

SCHEMA = StructType(
    [
        StructField("k", IntegerType()),
        StructField("v", StringType()),
        StructField("day", StringType()),
    ]
)


def _batch(spark, bid, n=10):
    return spark.createDataFrame(
        [Row(k=bid * 100 + i, v=f"b{bid}", day=f"d{i % 2}") for i in range(n)],
        SCHEMA,
    )


def _rows(spark, root):
    return sorted(
        (r.k, r.v, r.day) for r in read_batch_table(spark, root, SCHEMA).collect()
    )


def _parquet_files(root):
    return [
        p for p in glob.glob(os.path.join(root, "**", "*.parquet"), recursive=True)
    ]


def test_empty_table_reads_as_typed_empty_frame(spark, tmp_path):
    """A dashboard polling before the first micro-batch lands gets zero
    rows with the declared schema — not an exception (ADVICE r7)."""
    root = str(tmp_path / "never_written")
    got = read_batch_table(spark, root, SCHEMA)
    assert got.count() == 0
    assert got.schema == SCHEMA


def test_compaction_preserves_rows_and_bounds_files(spark, tmp_path):
    """N micro-batches then maintenance: row set identical, the batch
    dirs are gone, and the file count collapses to the compacted
    layout (one file per hive partition value)."""
    root = str(tmp_path / "tbl")
    for bid in range(6):
        assert write_batch_dir(_batch(spark, bid), root, bid)
    before = _rows(spark, root)
    files_before = len(_parquet_files(root))
    assert compacted_watermark(spark, root) == -1

    wm = compact_batch_dirs(spark, root, partition_by=["day"])
    assert wm == 5
    assert compacted_watermark(spark, root) == 5
    assert _rows(spark, root) == before
    # every batch dir absorbed and deleted
    assert not [d for d in os.listdir(root) if d.startswith("batch=")]
    # read-optimized: one file per day value, far below the hot layout
    files_after = len(_parquet_files(root))
    assert files_after == 2 < files_before

    # new batches after compaction land and read alongside the table
    assert write_batch_dir(_batch(spark, 6), root, 6)
    assert _rows(spark, root) == sorted(
        before + [(600 + i, "b6", f"d{i % 2}") for i in range(10)]
    )
    # second compaction absorbs only the fresh dir, advancing the mark
    assert compact_batch_dirs(spark, root, partition_by=["day"]) == 6


def test_replay_of_absorbed_batch_is_a_noop(spark, tmp_path):
    """Kill-and-replay from an old checkpoint: re-delivering a batch
    that compaction already absorbed must write nothing and produce
    zero duplicate rows."""
    root = str(tmp_path / "replay")
    for bid in range(3):
        write_batch_dir(_batch(spark, bid), root, bid)
    compact_batch_dirs(spark, root, partition_by=["day"])
    before = _rows(spark, root)
    # checkpoint rolled back: batches 1 and 2 are delivered again
    assert not write_batch_dir(_batch(spark, 1), root, 1)
    assert not write_batch_dir(_batch(spark, 2), root, 2)
    assert _rows(spark, root) == before
    assert not [d for d in os.listdir(root) if d.startswith("batch=")]


def test_crash_between_commit_and_cleanup_never_double_counts(spark, tmp_path):
    """The crash window compaction must survive: the generation (with
    its watermark) committed but the absorbed dirs were not yet
    deleted. Readers ignore dirs <= watermark; the next compaction
    sweeps them without re-absorbing."""
    root = str(tmp_path / "crashwin")
    for bid in range(3):
        write_batch_dir(_batch(spark, bid), root, bid)
    compact_batch_dirs(spark, root)
    before = _rows(spark, root)
    # resurrect an absorbed dir exactly as a mid-cleanup crash leaves it
    _batch(spark, 1).write.mode("overwrite").parquet(
        os.path.join(root, "batch=1")
    )
    assert _rows(spark, root) == before  # <= watermark: invisible
    wm = compact_batch_dirs(spark, root)
    assert wm == 2  # nothing new absorbed
    assert _rows(spark, root) == before
    assert not os.path.exists(os.path.join(root, "batch=1"))


def test_legacy_layout_is_refused_then_migrated(spark, tmp_path):
    """ADVICE r7: a table written by the old append-at-root layout must
    be refused (Spark partition discovery would fail on the mix), and
    migrate_batch_layout absorbs it as generation 1 / watermark -1 so
    every batch dir stays visible."""
    root = str(tmp_path / "legacy")
    legacy = spark.createDataFrame(
        [Row(k=i, v="old", day="d0") for i in range(5)], SCHEMA
    )
    legacy.write.parquet(root)  # root-level part files
    assert legacy_layout_entries(spark, root)
    with pytest.raises(IOError, match="legacy append layout"):
        write_batch_dir(_batch(spark, 0), root, 0)
    with pytest.raises(IOError, match="legacy append layout"):
        read_batch_table(spark, root, SCHEMA).count()

    assert migrate_batch_layout(spark, root) > 0
    assert legacy_layout_entries(spark, root) == []
    assert compacted_watermark(spark, root) == -1
    old = _rows(spark, root)
    assert old == [(i, "old", "d0") for i in range(5)]
    # batch dirs (including batch=0: watermark is -1) now land normally
    assert write_batch_dir(_batch(spark, 0), root, 0)
    assert len(_rows(spark, root)) == 15
    # and compaction unifies everything
    compact_batch_dirs(spark, root, partition_by=["day"])
    assert len(_rows(spark, root)) == 15


def test_pipeline_compact_predictions_end_to_end(spark, tmp_path_factory):
    """The TickPipeline integration: run the replay, compact, and the
    labeled view is row-identical with a bounded file count; fresh
    batches after compaction still surface."""
    import json

    from bda_spark.streaming import TickPipeline, file_replay_tick_stream

    tick_dir = tmp_path_factory.mktemp("bd_ticks")
    base_ms = 1_700_000_000_000
    with open(tick_dir / "bp.jsonl", "w") as f:
        for i in range(30):
            f.write(json.dumps({
                "symbol": "BP", "timestamp": base_ms + i * 60_000,
                "source": "YLIFE_FEED", "data_type": "MARKET_DATA",
                "bid": -1.0, "ask": -1.0, "price": 100.0 + i,
                "volume": 10.0 + i, "spread_raw": -1.0,
                "spread_table": -1.0, "volatility": 1.0,
                "market_sentiment": 0.5, "trading_activity": 50.0,
            }) + "\n")
    work = str(tmp_path_factory.mktemp("compact_preds"))
    ticks = file_replay_tick_stream(spark, str(tick_dir))
    pipe = TickPipeline(spark, ticks, "BP", work)
    pipe.run_available_now()
    before = sorted(
        (r.timestamp, r.prediction, r.label)
        for r in pipe.predictions().collect()
    )
    assert before
    files_before = len(_parquet_files(pipe.predictions_path))
    wm = pipe.compact_predictions()
    assert wm >= 0
    after = sorted(
        (r.timestamp, r.prediction, r.label)
        for r in pipe.predictions().collect()
    )
    assert after == before
    assert not [
        d for d in os.listdir(pipe.predictions_path) if d.startswith("batch=")
    ]
    assert len(_parquet_files(pipe.predictions_path)) <= files_before
    # the compacted generation is hive-partitioned by pred_date: a
    # day-scoped dashboard scan partition-prunes
    gen_dirs = os.listdir(os.path.join(pipe.predictions_path, "_versions"))
    gen = [d for d in gen_dirs if not d.endswith(".lock")][0]
    assert any(
        n.startswith("pred_date=")
        for n in os.listdir(
            os.path.join(pipe.predictions_path, "_versions", gen)
        )
    )
