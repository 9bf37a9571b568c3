"""Unit tests for the bucketed near-dup/ANN operators on planted
duplicates (the oracle harness separately checks them against exact
all-pairs SQL on the driver tables)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import Row

from bda_spark.operators.dedup import minhash_neardup_pairs, shingles
from bda_spark.operators.similarity import simhash_neardup_pairs, simhash_topk


def _doc(words):
    return " ".join(words)


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    vocab = [f"w{i}" for i in range(500)]
    base = list(rng.choice(vocab, size=60))
    near = base.copy()
    near[5] = "CHANGED"  # one token edit -> jaccard ~ 0.9
    rows = [
        Row(doc_id=0, text=_doc(base)),
        Row(doc_id=1, text=_doc(near)),
    ]
    for i in range(2, 30):
        rows.append(Row(doc_id=i, text=_doc(list(rng.choice(vocab, size=60)))))
    return spark.createDataFrame(rows)


def test_shingles_shape(spark, docs):
    sh = shingles(docs, n=3)
    counts = {r.doc_id: r.n for r in sh.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()}
    assert counts[0] == 58  # 60 tokens -> 58 distinct 3-gram shingles


def test_minhash_finds_planted_pair_only(spark, docs):
    pairs = minhash_neardup_pairs(docs, threshold=0.5).collect()
    assert [(p.doc_a, p.doc_b) for p in pairs] == [(0, 1)]
    # one token edit kills shingles at 3 positions: 55 shared / 61 union
    assert pairs[0].jaccard == pytest.approx(55 / 61, abs=1e-6)


@pytest.fixture(scope="module")
def emb(spark):
    rng = np.random.default_rng(11)
    base = rng.standard_normal(64)
    near = base + rng.standard_normal(64) * 0.01  # cosine ~ 1.0
    rows = [
        Row(vec_id=0, embedding=[float(x) for x in base]),
        Row(vec_id=1, embedding=[float(x) for x in near]),
    ]
    for i in range(2, 40):
        rows.append(
            Row(vec_id=i, embedding=[float(x) for x in rng.standard_normal(64)])
        )
    return spark.createDataFrame(rows)


def test_simhash_finds_planted_pair(spark, emb):
    pairs = simhash_neardup_pairs(emb, threshold=0.9).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]
    assert pairs[0].cosine > 0.99


def test_simhash_topk_ranks_planted_neighbor_first(spark, emb):
    queries = emb.filter("vec_id = 0")
    topk = simhash_topk(emb, queries, k=3).collect()
    assert len(topk) == 3
    assert topk[0].query_id == 0
    by_rank = sorted(topk, key=lambda r: r.rk)
    assert by_rank[0].neighbor_id == 1  # the planted near-dup
    assert by_rank[0].cosine > 0.99
    assert by_rank[0].cosine >= by_rank[1].cosine >= by_rank[2].cosine
