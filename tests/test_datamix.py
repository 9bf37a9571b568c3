"""Mixture-construction semantics beyond oracle parity: the invariants
a training pipeline actually relies on — benchmark exclusion,
reproducible hash sampling, split stability under corpus growth, and
packing conservation laws. Independent recomputation is done in plain
Python over the same parquet (not DuckDB), so these checks don't share
blind spots with the oracle harness."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from bda_spark.plans import get_queries
from bda_spark.plans.datamix import _H_MOD, _H_SAMPLE, _H_SPLIT

QUERIES = get_queries()


@pytest.fixture(scope="module")
def docs_pd(sf_dir):
    return pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()


def _n_tokens(text: str) -> int:
    return len([w for w in text.split(" ") if w])


def test_decontaminate_never_flags_benchmark_docs(spark, sf_dir):
    rows = QUERIES["doc_decontaminate"](spark, sf_dir).collect()
    assert rows, "planted duplicates should produce contamination hits"
    assert all(r.doc_id % 7 != 0 for r in rows)
    assert all(r.n_hit_grams > 0 for r in rows)
    # every flagged doc really shares a 13-gram with some benchmark doc
    pdf = pq.read_table(f"{sf_dir}/documents.parquet").to_pandas()
    texts = dict(zip(pdf.doc_id, pdf.text))
    bench_grams = set()
    for did, text in texts.items():
        if did % 7 == 0:
            tk = [w for w in text.split(" ") if w]
            bench_grams.update(
                " ".join(tk[i : i + 13]) for i in range(len(tk) - 12)
            )
    for r in rows:
        tk = [w for w in texts[r.doc_id].split(" ") if w]
        grams = {" ".join(tk[i : i + 13]) for i in range(len(tk) - 12)}
        assert len(grams & bench_grams) == r.n_hit_grams


def test_stratified_sample_matches_integer_hash_rule(spark, sf_dir, docs_pd):
    got = {
        (r.doc_id, r.source)
        for r in QUERIES["docs_stratified_sample"](spark, sf_dir).collect()
    }
    counts = docs_pd.groupby("source").size().to_dict()
    expected = {
        (int(d), s)
        for d, s in zip(docs_pd.doc_id, docs_pd.source)
        if (int(d) * _H_SAMPLE) % _H_MOD % 1000000 * counts[s] < 20 * 1000000
    }
    assert got == expected  # exact reproducibility, not just counts
    # the sampler downsamples every source yet keeps each represented
    per_src = {}
    for _, s in got:
        per_src[s] = per_src.get(s, 0) + 1
    assert set(per_src) == set(counts)
    assert all(n <= counts[s] for s, n in per_src.items())


def test_train_val_split_stable_under_corpus_growth(spark, sf_dir, docs_pd):
    rows = QUERIES["docs_train_val_split"](spark, sf_dir).collect()
    # conservation: every doc and every token lands in exactly one split
    assert sum(r.n_docs for r in rows) == len(docs_pd)
    assert sum(r.n_tokens for r in rows) == sum(
        _n_tokens(t) for t in docs_pd.text
    )
    # hash assignment is per-document, so a HALF corpus yields the same
    # split for every surviving doc — the no-migration guarantee
    full = {
        int(d): "val" if (int(d) * _H_SPLIT) % _H_MOD % 100 < 10 else "train"
        for d in docs_pd.doc_id
    }
    half = {
        int(d): "val" if (int(d) * _H_SPLIT) % _H_MOD % 100 < 10 else "train"
        for d in docs_pd.doc_id[: len(docs_pd) // 2]
    }
    assert all(full[d] == s for d, s in half.items())
    val_frac = sum(1 for s in full.values() if s == "val") / len(full)
    assert 0.03 < val_frac < 0.2  # ~10% modulo hash noise


def test_unigram_logprob_matches_python_model(spark, sf_dir, docs_pd):
    rows = QUERIES["doc_unigram_logprob"](spark, sf_dir).collect()
    assert len(rows) == len(docs_pd)
    import math
    from collections import Counter

    vocab = Counter()
    doc_toks = {}
    for did, text in zip(docs_pd.doc_id, docs_pd.text):
        tk = [w for w in text.split(" ") if w]
        doc_toks[int(did)] = tk
        vocab.update(tk)
    total = sum(vocab.values())
    for r in rows[:25]:
        tk = doc_toks[r.doc_id]
        assert r.n_tokens == len(tk)
        exp = sum(math.log(vocab[w] / total) for w in tk) / len(tk)
        assert r.avg_logprob == pytest.approx(exp, abs=1e-5)
    # every logprob is negative and finite (a unigram model over the
    # corpus assigns every seen token p < 1)
    assert all(r.avg_logprob < 0 for r in rows)


def test_mixture_weights_temper_dominant_sources(spark, sf_dir, docs_pd):
    rows = QUERIES["docs_mixture_weights"](spark, sf_dir).collect()
    assert {r.source for r in rows} == set(docs_pd.source)
    assert sum(r.token_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    assert sum(r.temp_share for r in rows) == pytest.approx(1.0, abs=1e-4)
    shares = sorted(r.token_share for r in rows)
    temps = sorted(r.temp_share for r in rows)
    # temperature sampling compresses the spread: the ratio between the
    # biggest and smallest domain strictly shrinks
    assert temps[-1] / temps[0] < shares[-1] / shares[0]
    # token budgets agree with an independent recount
    exp = (
        docs_pd.assign(nt=docs_pd.text.map(_n_tokens))
        .groupby("source")
        .nt.sum()
        .to_dict()
    )
    assert {r.source: r.n_tokens for r in rows} == exp


def test_contamination_hits_external_benchmark(spark):
    """The library form takes a SEPARATE benchmark table: docs sharing
    a 13-gram are flagged with the exact overlap count, clean docs are
    absent, and the benchmark side broadcasts."""
    from pyspark.sql import Row

    from bda_spark.plans.datamix import contamination_hits

    run = " ".join(f"w{i}" for i in range(13))  # the shared 13-gram
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=f"intro {run} outro"),
            Row(doc_id=2, text=" ".join(f"x{i}" for i in range(20))),
        ]
    )
    bench = spark.createDataFrame(
        [Row(doc_id=100, text=f"other words {run} trailing stuff here")]
    )
    out = contamination_hits(docs, bench)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the hint forces the bench side
    rows = {r.doc_id: r.n_hit_grams for r in out.collect()}
    assert rows == {1: 1}


def test_quality_percentile_filter_is_per_source(spark):
    """Relative gate: each source keeps its own top fraction, so a
    uniformly weaker source is not wiped out by a global cutoff."""
    from pyspark.sql import Row

    from bda_spark.plans.datamix import quality_percentile_filter

    rows = [
        Row(doc_id=i, source="strong", score=float(100 + i)) for i in range(10)
    ] + [Row(doc_id=100 + i, source="weak", score=float(i)) for i in range(10)]
    out = quality_percentile_filter(
        spark.createDataFrame(rows), "score", keep_frac=0.5, by="source"
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, set()).add(r.doc_id)
    # percent_rank <= 0.5 keeps the top 5 of each 10 (ranks 1-5 have
    # pr 0, 1/9 .. 4/9; rank 6 is 5/9 > 0.5)
    assert by_src == {
        "strong": {5, 6, 7, 8, 9},
        "weak": {105, 106, 107, 108, 109},
    }


def test_quality_threshold_approx_tracks_exact_gate(spark):
    """The sort-free twin: per-source kept fraction within a few
    percent of keep_frac on a 1000-doc-per-source spread, and NO Sort
    node anywhere in its plan (the exact gate's plan has one)."""
    from pyspark.sql import Row

    from bda_spark.plans.datamix import (
        quality_percentile_filter,
        quality_threshold_filter_approx,
    )

    rows = [
        Row(doc_id=s * 10_000 + i, source=src, score=float((i * 7919) % 1000))
        for s, src in enumerate(["a", "b"])
        for i in range(1000)
    ]
    df = spark.createDataFrame(rows)
    approx = quality_threshold_filter_approx(df, "score", keep_frac=0.9)
    kept = approx.groupBy("source").count().collect()
    for r in kept:
        assert abs(r["count"] - 900) <= 30, (r["source"], r["count"])
    # the kept set is exactly "score >= cutoff": nothing kept may score
    # below anything dropped within a source
    dropped = df.join(approx.select("doc_id"), "doc_id", "left_anti")
    lo_kept = {
        r["source"]: r["m"]
        for r in approx.groupBy("source").agg(F.min("score").alias("m")).collect()
    }
    hi_drop = {
        r["source"]: r["m"]
        for r in dropped.groupBy("source").agg(F.max("score").alias("m")).collect()
    }
    for src in lo_kept:
        assert lo_kept[src] > hi_drop[src], (src, lo_kept[src], hi_drop[src])
    # plan shape: no sort in the approx gate; the exact gate has one
    import re

    approx_plan = approx._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    exact_plan = (
        quality_percentile_filter(df, "score", keep_frac=0.9)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    assert not re.findall(r"\bSort \(\d+\)", approx_plan), approx_plan
    assert re.findall(r"\bSort \(\d+\)", exact_plan)


def test_salted_packing_conserves_and_bounds_overhead(spark, sf_dir, docs_pd):
    """The mega-source scale twin: sub-bucketed packing keeps the
    conservation laws and costs at most (n_buckets - 1) extra boundary
    sequences per source vs the unsalted manifest."""
    from bda_spark.plans.datamix import _H_MOD, _H_SAMPLE, pack_sequences_salted
    from bda_spark.sources.batch import load_table

    n_buckets = 4
    rows = pack_sequences_salted(
        load_table(spark, sf_dir, "documents"), seq_len=128, n_buckets=n_buckets
    ).collect()
    # conservation across salts
    per_src_docs, per_src_tokens = {}, {}
    for r in rows:
        assert 0 <= r.salt < n_buckets
        per_src_docs[r.source] = per_src_docs.get(r.source, 0) + r.n_docs
        per_src_tokens[r.source] = per_src_tokens.get(r.source, 0) + r.seq_tokens
    assert per_src_docs == docs_pd.groupby("source").size().to_dict()
    exp_tokens = (
        docs_pd.assign(nt=docs_pd.text.map(_n_tokens))
        .groupby("source")
        .nt.sum()
        .to_dict()
    )
    assert per_src_tokens == exp_tokens
    # bounded boundary overhead vs the unsalted packing
    unsalted = QUERIES["docs_pack_sequences"](spark, sf_dir).collect()
    n_unsalted = {}
    for r in unsalted:
        n_unsalted[r.source] = n_unsalted.get(r.source, 0) + 1
    n_salted = {}
    for r in rows:
        n_salted[r.source] = n_salted.get(r.source, 0) + 1
    for src, n in n_salted.items():
        assert n <= n_unsalted[src] + (n_buckets - 1)
    # full manifest matches an independent Python recompute
    expected = {}
    for _, row in docs_pd.sort_values("doc_id").iterrows():
        salt = int(row.doc_id) * _H_SAMPLE % _H_MOD % n_buckets
        key = (row.source, salt)
        offset = expected.setdefault(key, {"offset": 0, "seqs": {}})
        sid = offset["offset"] // 128
        seq = offset["seqs"].setdefault(sid, [0, 0])
        nt = _n_tokens(row.text)
        seq[0] += 1
        seq[1] += nt
        offset["offset"] += nt
    got = {
        (r.source, r.salt, r.seq_id): (r.n_docs, r.seq_tokens) for r in rows
    }
    exp_flat = {
        (src, salt, sid): tuple(v)
        for (src, salt), d in expected.items()
        for sid, v in d["seqs"].items()
    }
    assert got == exp_flat


def test_pack_sequences_conserves_docs_and_tokens(spark, sf_dir, docs_pd):
    rows = QUERIES["docs_pack_sequences"](spark, sf_dir).collect()
    per_src_docs = docs_pd.groupby("source").size().to_dict()
    got_docs, got_tokens = {}, {}
    for r in rows:
        got_docs[r.source] = got_docs.get(r.source, 0) + r.n_docs
        got_tokens[r.source] = got_tokens.get(r.source, 0) + r.seq_tokens
    assert got_docs == per_src_docs
    exp_tokens = (
        docs_pd.assign(nt=docs_pd.text.map(_n_tokens))
        .groupby("source")
        .nt.sum()
        .to_dict()
    )
    assert got_tokens == exp_tokens
    # seq_ids are the chunk index of each doc's START offset: they are
    # dense-ish and strictly ordered per source with no negative ids
    for r in rows:
        assert r.seq_id >= 0
    # a doc's start offset determines its chunk — recompute for one source
    src = sorted(per_src_docs)[0]
    sub = docs_pd[docs_pd.source == src].sort_values("doc_id")
    offset, expected = 0, {}
    for t in sub.text:
        nt = _n_tokens(t)
        sid = offset // 128
        expected[sid] = expected.get(sid, 0) + 1
        offset += nt
    got_src = {r.seq_id: r.n_docs for r in rows if r.source == src}
    assert got_src == expected


def test_corpus_build_pipeline_conservation(spark):
    """End-to-end composition: every input doc lands in exactly one
    fate (clean / dedup-removed / quality-gated / contaminated), every
    removal's kept_id survives in clean-or-gated space, and the packing
    manifest accounts every clean token exactly once."""
    from pyspark.sql import Row

    from bda_spark.plans.datamix import corpus_build_pipeline

    base = " ".join(f"tok{i}" for i in range(40))
    low_quality = " ".join(["dup"] * 40)  # diversity 1/40 -> gated
    contaminated = " ".join(f"bench{i}" for i in range(20))
    rows = [
        Row(doc_id=1, text=base, source="a"),
        Row(doc_id=2, text=base.upper() + "!", source="a"),     # exact dup
        Row(
            doc_id=3,
            text=" ".join(
                f"tok{i}" if i != 20 else "EDIT" for i in range(40)
            ),
            source="a",
        ),                                                      # near dup
        Row(doc_id=4, text=low_quality, source="b"),
        Row(doc_id=5, text=contaminated + " trailing words here", source="b"),
    ]
    for i in range(6, 26):  # bulk unique corpus so the gate has mass
        rows.append(
            Row(
                doc_id=i,
                text=" ".join(f"u{i}w{j}" for j in range(40)),
                source="b",
            )
        )
    docs = spark.createDataFrame(rows)
    benchmark = spark.createDataFrame([Row(doc_id=900, text=contaminated)])
    clean, removed, manifest, fates = corpus_build_pipeline(
        docs, benchmark, keep_frac=0.9, decontam_ngram=13, return_fates=True
    )
    clean_ids = {r.doc_id for r in clean.collect()}
    removed_rows = {r.doc_id: (r.kept_id, r.reason) for r in removed.collect()}
    # dedup fates
    assert removed_rows[2] == (1, "exact") and removed_rows[3] == (1, "neardup")
    assert set(removed_rows) & clean_ids == set()
    # quality gate dropped the degenerate doc, decontamination doc 5
    assert 4 not in clean_ids and 5 not in clean_ids
    assert 1 in clean_ids and {6, 7, 8} <= clean_ids
    # every doc has exactly one fate
    all_ids = {r.doc_id for r in docs.collect()}
    gated_or_contaminated = all_ids - clean_ids - set(removed_rows)
    assert gated_or_contaminated == {4, 5}
    # the explicit fate map partitions the input and names each stage
    fate_rows = fates.collect()
    assert len(fate_rows) == len(all_ids)
    fate_map = {r["doc_id"]: r["fate"] for r in fate_rows}
    assert fate_map[2] == "exact" and fate_map[3] == "neardup"
    assert fate_map[4] == "quality" and fate_map[5] == "contaminated"
    assert {d for d, f in fate_map.items() if f == "kept"} == clean_ids
    # manifest conservation: docs and tokens packed exactly once
    m = manifest.collect()
    assert sum(r.n_docs for r in m) == len(clean_ids)
    tok_count = {
        r.doc_id: len([w for w in r.text.split(" ") if w])
        for r in docs.collect()
    }
    assert sum(r.seq_tokens for r in m) == sum(
        tok_count[d] for d in clean_ids
    )


def test_token_budget_sample_meets_budget_deterministically(spark, sf_dir, docs_pd):
    """Every domain's sample covers its token budget (crossing doc
    included), nothing past the boundary leaks in, and the kept set is
    exactly the hash-order prefix — recomputed independently in Python."""
    from bda_spark.plans.datamix import sample_to_token_budget
    from bda_spark.sources.batch import load_table

    budget = 2000
    docs = load_table(spark, sf_dir, "documents")
    got = sample_to_token_budget(docs, budget_tokens=budget).collect()
    kept = {}
    for r in got:
        kept.setdefault(r["source"], set()).add(r["doc_id"])

    for source, grp in docs_pd.groupby("source"):
        order = sorted(
            (
                ((int(r.doc_id) * _H_SAMPLE) % _H_MOD, int(r.doc_id)),
                int(r.doc_id),
                _n_tokens(r.text),
            )
            for r in grp.itertuples()
        )
        cum, want = 0, set()
        for _key, doc_id, n in order:
            if cum < budget:
                want.add(doc_id)
            cum += n
        assert kept.get(source, set()) == want, source
        total = sum(n for _k, d, n in order if d in want)
        assert total >= min(budget, sum(n for *_x, n in order))


def test_contamination_spans_positions_and_redaction(spark):
    """Planted leak: a benchmark 13-gram sequence inside a training doc
    must be located at its exact position with its exact length; a doc
    with no overlap emits nothing; two separated leaks in one doc are
    two spans."""
    from bda_spark.plans.datamix import contamination_spans

    leak = " ".join(f"l{i}" for i in range(15))  # 15 tokens -> 3 grams
    filler = lambda tag, n: " ".join(f"{tag}{i}" for i in range(n))
    docs = spark.createDataFrame(
        [
            (1, filler("a", 4) + " " + leak + " " + filler("b", 5)),
            (2, filler("c", 20)),
            (3, leak + " " + filler("d", 13) + " " + leak),
        ],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, leak)], ["doc_id", "text"])
    got = sorted(
        (r.doc_id, r.pos, r.span_tokens)
        for r in contamination_spans(docs, bench, n=13).collect()
    )
    # doc 1: leak at token offset 4, 15 tokens; doc 3: offsets 0 and 28
    assert got == [(1, 4, 15), (3, 0, 15), (3, 28, 15)]


def test_redact_spans_cuts_leak_and_margin_keeps_rest(spark):
    """End-to-end redaction: contaminated tokens (plus margin)
    disappear, every other token survives in order, clean docs pass
    through byte-identical (trailing/extra whitespace included)."""
    from bda_spark.plans.datamix import contamination_spans, redact_spans

    leak = " ".join(f"l{i}" for i in range(15))
    pre = " ".join(f"a{i}" for i in range(4))
    post = " ".join(f"b{i}" for i in range(5))
    clean_text = "keep me  exactly   as-is "
    docs = spark.createDataFrame(
        [(1, f"{pre} {leak} {post}"), (2, clean_text)],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(100, leak)], ["doc_id", "text"])
    spans = contamination_spans(docs, bench, n=13)
    got = {r.doc_id: r for r in redact_spans(docs, spans).collect()}
    assert got[1].text == f"{pre} {post}"
    assert got[1].n_redacted_tokens == 15
    assert got[2].text == clean_text and got[2].n_redacted_tokens == 0
    # margin widens the cut one token each side
    m = {r.doc_id: r for r in redact_spans(docs, spans, margin=1).collect()}
    assert m[1].text == " ".join(f"a{i}" for i in range(3)) + " " + " ".join(
        f"b{i}" for i in range(1, 5)
    )
    assert m[1].n_redacted_tokens == 17


# ---------------------------------------------------------------------------
# DSIR importance resampling (plans/datamix.py::dsir_select)


def _dsir_fixture(spark):
    """Two clearly-separated vocabularies: 'science' docs share the
    target's tokens, 'spam' docs share none — the importance-weight
    gap is large, so selection outcomes are unambiguous."""
    sci = "atoms energy quantum field theory experiment data model"
    spam = "buy cheap now click offer deal win prize"
    rows = []
    for i in range(40):
        words = (sci if i % 2 == 0 else spam).split()
        text = " ".join(words[(i + j) % len(words)] for j in range(24))
        rows.append((i + 1, text))
    # target: pure science vocabulary, disjoint doc ids
    tgt = [(1000 + i, " ".join(sci.split()[i % 8:] + sci.split()[: i % 8]))
           for i in range(10)]
    raw_df = spark.createDataFrame(rows, "doc_id long, text string")
    tgt_df = spark.createDataFrame(tgt, "doc_id long, text string")
    return raw_df, tgt_df


def test_dsir_topn_prefers_target_matching_docs(spark):
    from bda_spark.plans.datamix import dsir_select

    raw, tgt = _dsir_fixture(spark)
    picked = dsir_select(raw, tgt, n=20, gumbel=False).collect()
    assert len(picked) == 20
    # the 20 science docs (odd ids, from i%2==0 -> id=i+1) out-weigh
    # every spam doc
    assert {r.doc_id % 2 for r in picked} == {1}, [r.doc_id for r in picked]


def test_dsir_hashed_regime_matches_on_separated_fixture(spark):
    from bda_spark.plans.datamix import dsir_select

    raw, tgt = _dsir_fixture(spark)
    exact = {r.doc_id for r in dsir_select(raw, tgt, n=20, gumbel=False).collect()}
    hashed = {
        r.doc_id
        for r in dsir_select(
            raw, tgt, n=20, n_buckets=1 << 20, gumbel=False
        ).collect()
    }
    # the decision margin is vocabulary-level; a bucketed feature space
    # big enough to avoid cross-vocabulary collisions picks the same set
    assert hashed == exact


def test_dsir_auto_regime_switches_on_corpus_size(spark):
    """r12 VERDICT task 2: n_buckets="auto" runs the exact word vocab
    below DSIR_HASHED_MIN_DOCS (bit-identical to the oracle-verified
    regime) and the paper's fixed hash space above it. n_hint prices
    the decision without a count; the hashed pick on the separated
    fixture still lands entirely on target-matching docs."""
    from bda_spark.plans.datamix import (
        DSIR_HASHED_MIN_DOCS,
        DSIR_N_BUCKETS,
        dsir_select,
    )

    raw, tgt = _dsir_fixture(spark)
    word = dsir_select(raw, tgt, n=20, n_buckets=None, gumbel=False)
    auto_small = dsir_select(
        raw, tgt, n=20, gumbel=False, n_hint=DSIR_HASHED_MIN_DOCS - 1
    )
    assert [r.asDict() for r in auto_small.collect()] == [
        r.asDict() for r in word.collect()
    ]
    hashed = dsir_select(
        raw, tgt, n=20, n_buckets=DSIR_N_BUCKETS, gumbel=False
    )
    auto_big = dsir_select(
        raw, tgt, n=20, gumbel=False, n_hint=DSIR_HASHED_MIN_DOCS
    )
    assert [r.asDict() for r in auto_big.collect()] == [
        r.asDict() for r in hashed.collect()
    ]
    assert {r.doc_id % 2 for r in auto_big.collect()} == {1}


def test_dsir_gumbel_is_deterministic_and_weight_biased(spark):
    from bda_spark.plans.datamix import dsir_select

    raw, tgt = _dsir_fixture(spark)
    a = dsir_select(raw, tgt, n=10).collect()
    b = dsir_select(raw, tgt, n=10).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]
    # with a vocabulary-scale weight gap, Gumbel noise (stddev ~1.3)
    # cannot promote a spam doc over 20 science docs
    assert all(r.doc_id % 2 == 1 for r in a)


def test_knuth_hash_overflow_safe_and_bit_equal(spark):
    """r12: the naive (id * A) % 2^32 overflows int64 (ANSI error) once
    id exceeds ~2^63/A — the 100x rung's replicated id space crossed
    that line inside corpus_build_pipeline. The split form must (a)
    run at any non-negative int64 id, (b) equal exact big-int
    arithmetic, and (c) agree with its DuckDB SQL twin — on BOTH sides
    of the old overflow boundary."""
    import duckdb

    from bda_spark.plans.datamix import _H_MOD, _H_SAMPLE, _kh, _kh_sql
    from pyspark.sql import functions as F

    ids = [
        0, 1, 65535, 65536, 12345678, 2**31 - 1, 2**32 - 1, 2**32,
        3_500_000_000, 2**40 + 7, 2**62 + 123456789, 2**63 - 1,
    ]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r.doc_id: r.h
        for r in df.select(
            "doc_id", _kh(F.col("doc_id"), _H_SAMPLE).alias("h")
        ).collect()
    }
    duck = duckdb.connect()
    for i in ids:
        want = (i * _H_SAMPLE) % _H_MOD  # exact python big-int
        assert got[i] == want, (i, got[i], want)
        sql_val = duck.execute(
            f"SELECT {_kh_sql(str(i), _H_SAMPLE)}"
        ).fetchone()[0]
        assert sql_val == want, (i, sql_val, want)


def test_salted_packer_runs_past_the_overflow_boundary(spark):
    """The exact operator/line the 100x rung failed on: pack a corpus
    whose doc_ids sit past 2^63/A. Conservation holds (every doc
    packed once)."""
    from bda_spark.plans.datamix import pack_sequences_salted

    base = 2**62
    docs = spark.createDataFrame(
        [(base + i, "s", "alpha beta gamma delta") for i in range(40)],
        "doc_id long, source string, text string",
    )
    out = pack_sequences_salted(docs, seq_len=8, n_buckets=4).collect()
    assert sum(r.n_docs for r in out) == 40
    assert all(r.seq_tokens > 0 for r in out)
