"""Deletion / tombstone propagation (operators/deletes.py +
sources.sinks.delete_keys_parquet): a taken-down document disappears
from the corpus and every derived artifact (MinHash signature index,
semantic cell index, IVF+SQ8 code table, match flags), the rewrite
touches only doomed partitions, a replayed delete is a strict no-op,
and tombstones stop a replayed pre-delete ingest batch from
resurrecting the doc."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from bda_spark.operators.deletes import delete_docs, filter_tombstoned
from bda_spark.sources.sinks import delete_keys_parquet

BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4


def _ids(spark, vals, col="doc_id"):
    return spark.createDataFrame([(int(v),) for v in vals], f"{col} long")


def _tree(path: str) -> dict[str, float]:
    """relative file path -> mtime for every data file under path."""
    out = {}
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            out[os.path.relpath(p, path)] = os.path.getmtime(p)
    return out


# --- delete_keys_parquet: the three layouts --------------------------


def test_flat_delete_and_replay_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "doc_id long, v string"
    ).write.parquet(path)
    removed = delete_keys_parquet(
        spark, _ids(spark, [3, 7, 999]), path, keys=["doc_id"]
    )
    assert removed == 2
    assert {r.doc_id for r in spark.read.parquet(path).collect()} == (
        set(range(10)) - {3, 7}
    )
    before = _tree(path)
    assert (
        delete_keys_parquet(spark, _ids(spark, [3, 7]), path, keys=["doc_id"])
        == 0
    )
    # replay rewrote NOTHING: every data file byte-identical in place
    assert _tree(path) == before


def test_partitioned_delete_touches_only_doomed_partitions(spark, tmp_path):
    path = str(tmp_path / "t")
    rows = [(i, i % 4, f"v{i}") for i in range(40)]
    spark.createDataFrame(
        rows, "doc_id long, cell int, v string"
    ).write.partitionBy("cell").parquet(path)
    untouched_before = {
        k: v for k, v in _tree(path).items() if k.startswith("cell=1/")
        or k.startswith("cell=3/")
    }
    # doomed ids live in cells 0 and 2 only
    removed = delete_keys_parquet(
        spark, _ids(spark, [0, 2, 4]), path, keys=["doc_id"],
        partition_col="cell",
    )
    assert removed == 3
    got = spark.read.parquet(path)
    assert got.count() == 37
    assert {r.doc_id for r in got.filter("cell in (0, 2)").collect()} == (
        {i for i in range(40) if i % 4 in (0, 2)} - {0, 2, 4}
    )
    # cells 1 and 3 were never rewritten
    untouched_after = {
        k: v for k, v in _tree(path).items() if k.startswith("cell=1/")
        or k.startswith("cell=3/")
    }
    assert untouched_after == untouched_before
    # replay: no hits, no writes anywhere
    before = _tree(path)
    assert (
        delete_keys_parquet(
            spark, _ids(spark, [0, 2, 4]), path, keys=["doc_id"],
            partition_col="cell",
        )
        == 0
    )
    assert _tree(path) == before


def test_partitioned_delete_removes_emptied_partition(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1), (5, 2)],
        "doc_id long, cell int",
    ).write.partitionBy("cell").parquet(path)
    removed = delete_keys_parquet(
        spark, _ids(spark, [3, 4]), path, keys=["doc_id"],
        partition_col="cell",
    )
    assert removed == 2
    assert not os.path.exists(os.path.join(path, "cell=1"))
    got = spark.read.parquet(path)
    assert {(r.doc_id, r.cell) for r in got.collect()} == {
        (1, 0), (2, 0), (5, 2),
    }


def test_versioned_delete_is_reader_atomic_and_replay_safe(spark, tmp_path):
    from bda_spark.sources.versioned import (
        current_generation,
        read_versioned,
        to_versioned,
    )

    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "doc_id long, v string"
    ).write.parquet(path)
    to_versioned(spark, path)
    gen0 = current_generation(spark, path)
    removed = delete_keys_parquet(
        spark, _ids(spark, [1, 5]), path, keys=["doc_id"],
        vacuum_min_age_seconds=0.0,
    )
    assert removed == 2
    # the delete committed a NEW generation (readers resolving mid-
    # delete saw gen0 whole; no in-place rewrite ever happened)
    assert current_generation(spark, path) == gen0 + 1
    assert {r.doc_id for r in read_versioned(spark, path).collect()} == (
        set(range(8)) - {1, 5}
    )
    # replay: zero hits -> NO new generation committed
    assert (
        delete_keys_parquet(
            spark, _ids(spark, [1, 5]), path, keys=["doc_id"],
            vacuum_min_age_seconds=0.0,
        )
        == 0
    )
    assert current_generation(spark, path) == gen0 + 1


def test_delete_missing_table_returns_zero(spark, tmp_path):
    assert (
        delete_keys_parquet(
            spark, _ids(spark, [1]), str(tmp_path / "absent"), keys=["doc_id"]
        )
        == 0
    )


# --- delete_docs: propagation to the match surfaces -------------------


def test_deleted_doc_stops_matching_minhash(spark, tmp_path):
    from bda_spark.operators.dedup import minhash_index, minhash_match_new

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE),
            Row(doc_id=2, text="totally different words " * 10),
        ]
    )
    idx = str(tmp_path / "mh_index")
    minhash_index(corpus).write.parquet(idx)
    probe = spark.createDataFrame(
        [Row(doc_id=101, text=BASE + "tail variation words")]
    )

    def matches():
        return {
            (r.new_id, r.corpus_id)
            for r in minhash_match_new(
                probe, spark.read.parquet(idx), threshold=0.5
            ).collect()
        }

    assert matches() == {(101, 1)}
    removed = delete_docs(spark, [1], minhash_index_path=idx)
    assert removed == {"minhash_index": 1}
    assert matches() == set()
    # replayed delete: strict no-op
    assert delete_docs(spark, [1], minhash_index_path=idx) == {
        "minhash_index": 0
    }


def test_deleted_vec_stops_matching_semantic_and_cells_prune(
    spark, tmp_path
):
    from bda_spark.operators.similarity import (
        semantic_index_build,
        semantic_match_new,
    )

    rng = np.random.default_rng(7)
    dim = 16
    base = rng.normal(size=dim)
    vecs = [(0, [float(x) for x in base])] + [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(1, 40)
    ]
    emb = spark.createDataFrame(
        vecs, "vec_id long, embedding array<double>"
    )
    path = str(tmp_path / "semidx")
    semantic_index_build(emb, path, n_centroids=4, seed=3, max_iter=8)
    twin = spark.createDataFrame(
        [(9000, [float(x) for x in base + rng.normal(scale=1e-3, size=dim)])],
        "vec_id long, embedding array<double>",
    )

    def matches():
        return {
            (r.new_id, r.corpus_id)
            for r in semantic_match_new(
                spark, path, twin, threshold=0.95
            ).collect()
        }

    assert matches() == {(9000, 0)}
    cells = os.path.join(path, "cells")
    # which cell holds vec 0? every OTHER cell must not be rewritten
    doomed_cell = (
        spark.read.parquet(cells).filter("vec_id = 0").collect()[0].centroid_id
    )
    others_before = {
        k: v
        for k, v in _tree(cells).items()
        if not k.startswith(f"centroid_id={doomed_cell}/")
    }
    removed = delete_docs(spark, [0], semantic_index_path=path)
    assert removed == {"semantic_index": 1}
    assert matches() == set()
    others_after = {
        k: v
        for k, v in _tree(cells).items()
        if not k.startswith(f"centroid_id={doomed_cell}/")
    }
    assert others_after == others_before  # O(touched cells), measured
    assert delete_docs(spark, [0], semantic_index_path=path) == {
        "semantic_index": 0
    }


def test_deleted_vec_leaves_ivf_sq8_search(spark, tmp_path):
    from bda_spark.operators.quantize import (
        ivf_sq8_index_build,
        ivf_sq8_search,
    )

    rng = np.random.default_rng(11)
    dim = 16
    vecs = [
        (i, [float(x) for x in rng.normal(size=dim)]) for i in range(60)
    ]
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ann")
    ivf_sq8_index_build(emb, path, n_centroids=4)
    # probe with a NEW near-twin of vec 0 (self-matches are excluded by
    # design, so querying with vec 0 itself would never return 0)
    base0 = np.asarray(vecs[0][1])
    q = spark.createDataFrame(
        [(9000, [float(x) for x in base0 + rng.normal(scale=1e-3, size=dim)])],
        "vec_id long, embedding array<double>",
    )
    full = {
        r.neighbor_id
        for r in ivf_sq8_search(
            spark, path, q, emb, k=5, n_probe=4, oversample=12
        ).collect()
    }
    assert 0 in full  # the twin's nearest corpus neighbor is vec 0
    removed = delete_docs(spark, [0], ivf_sq8_index_path=path)
    assert removed == {"ivf_sq8_index": 1}
    after = {
        r.neighbor_id
        for r in ivf_sq8_search(
            spark, path, q, emb, k=5, n_probe=4, oversample=12
        ).collect()
    }
    assert 0 not in after
    assert len(after) == 5  # still returns a full top-k from survivors


def test_delete_docs_scrubs_flags_both_sides(spark, tmp_path):
    flags = str(tmp_path / "flags")
    spark.createDataFrame(
        [(101, 1, 0.9), (102, 2, 0.8), (1, 103, 0.7)],
        "new_id long, corpus_id long, est_jaccard double",
    ).write.parquet(flags)
    removed = delete_docs(spark, [1], flags_paths=[flags])
    assert removed == {"flags_0": 2}  # corpus side of one, new side of other
    assert {
        (r.new_id, r.corpus_id)
        for r in spark.read.parquet(flags).collect()
    } == {(102, 2)}


# --- tombstones: the resurrection guard -------------------------------


def test_tombstones_block_replayed_batch_resurrection(spark, tmp_path):
    """End-to-end takedown under at-least-once replay: ingest a corpus
    via the streaming loop, delete one doc (tombstoned), then REPLAY
    the original batch from a fresh checkpoint — the deleted doc must
    NOT reappear in the index, while the untouched doc upserts
    normally."""
    from bda_spark.streaming.incremental import stream_dedup_against_index

    src = tmp_path / "docs"
    src.mkdir()
    with open(src / "b1.jsonl", "w") as f:
        f.write(json.dumps({"doc_id": 1, "text": BASE}) + "\n")
        f.write(
            json.dumps({"doc_id": 2, "text": "totally different " * 10})
            + "\n"
        )
    index_path = str(tmp_path / "index")
    flags_path = str(tmp_path / "flags")
    ts_path = str(tmp_path / "tombstones")

    def run(ckpt: str):
        q = stream_dedup_against_index(
            spark.readStream.schema("doc_id long, text string").json(
                str(src)
            ),
            index_path,
            flags_path,
            checkpoint=str(tmp_path / ckpt),
            threshold=0.5,
            available_now=True,
            tombstones_path=ts_path,
        )
        assert q.awaitTermination(300)
        assert q.exception() is None, q.exception()

    run("ckpt1")
    assert {
        r.doc_id for r in spark.read.parquet(index_path).collect()
    } == {1, 2}
    removed = delete_docs(
        spark, [1], minhash_index_path=index_path, tombstones_path=ts_path
    )
    assert removed == {"minhash_index": 1, "tombstoned": 1}
    # redelivery: fresh checkpoint replays the SAME source files
    run("ckpt2")
    assert {
        r.doc_id for r in spark.read.parquet(index_path).collect()
    } == {2}
    # replayed delete after the replayed batch: still a no-op
    assert delete_docs(
        spark, [1], minhash_index_path=index_path, tombstones_path=ts_path
    ) == {"minhash_index": 0, "tombstoned": 1}


def test_filter_tombstoned_noop_without_table(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    got = filter_tombstoned(df, str(tmp_path / "absent_ts"))
    assert got.count() == 1
