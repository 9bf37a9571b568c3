"""Streaming incremental dedup (streaming/incremental.py): a document
stream matched micro-batch by micro-batch against a growing persisted
MinHash index — batch 2's near-dup of a batch-1 doc is flagged, fresh
docs are not, and the index ends holding every doc's signature."""

from __future__ import annotations

import json
import os

import pytest


BASE = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4


def _write_batch(d: str, name: str, rows: list[dict]) -> None:
    with open(os.path.join(d, name), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture()
def doc_stream_dir(tmp_path):
    d = tmp_path / "docs"
    d.mkdir()
    # batch 1: two unique docs
    _write_batch(
        str(d), "b1.jsonl",
        [
            {"doc_id": 1, "text": BASE},
            {"doc_id": 2, "text": "totally different words " * 10},
        ],
    )
    # batch 2: a near-dup of doc 1 + a fresh doc
    _write_batch(
        str(d), "b2.jsonl",
        [
            {"doc_id": 101, "text": BASE + "tail variation words"},
            {"doc_id": 102, "text": "completely fresh content here " * 9},
        ],
    )
    return str(d)


def test_stream_dedup_flags_cross_batch_near_dup(spark, doc_stream_dir, tmp_path):
    from bda_spark.streaming.incremental import stream_dedup_against_index

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(doc_stream_dir)
    )
    index_path = str(tmp_path / "index")
    flags_path = str(tmp_path / "flags")
    q = stream_dedup_against_index(
        stream,
        index_path,
        flags_path,
        checkpoint=str(tmp_path / "ckpt"),
        threshold=0.5,
        available_now=True,
    )
    assert q.awaitTermination(300), "incremental dedup stream wedged"
    assert q.exception() is None, q.exception()

    index = spark.read.parquet(index_path)
    assert {r["doc_id"] for r in index.select("doc_id").collect()} == {
        1, 2, 101, 102,
    }
    flags = spark.read.parquet(flags_path).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in flags} == {(101, 1)}
    assert all(r["est_jaccard"] > 0.5 for r in flags)

    # restart-safety: re-running the whole stream from a FRESH
    # checkpoint (same sinks) must not duplicate flags or signatures —
    # the merges are keyed upserts
    q2 = stream_dedup_against_index(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .json(doc_stream_dir),
        index_path,
        flags_path,
        checkpoint=str(tmp_path / "ckpt2"),
        threshold=0.5,
        available_now=True,
    )
    assert q2.awaitTermination(300)
    assert q2.exception() is None, q2.exception()
    assert spark.read.parquet(index_path).count() == 4
    again = spark.read.parquet(flags_path).collect()
    assert {(r["new_id"], r["corpus_id"]) for r in again} == {(101, 1)}
    assert len(again) == 1
