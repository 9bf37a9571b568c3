"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Per-query timing includes full execution to collect() (the driver-side
materialization the reference also pays). A warmup query absorbs JVM/
codegen startup, and each headline query is executed TWICE — as two
INTERLEAVED full passes over the query list, min per query — because
all entries share one long-lived JVM, so a single run folds whatever
GC pause / codegen-cache eviction the session happens to hit into a
0.3-3 s number (the r1->r2 "regression" was exactly this — every
shared query drifted 1.3-1.9x with identical plans). Interleaving
rather than back-to-back min-of-2 matters: a transient JVM episode
spans several consecutive queries and poisons BOTH back-to-back
samples (observed r10: two same-code runs, each with a different
CONTIGUOUS block of queries 2-3x slow). Spark caches no results across
actions, so the second pass re-executes the full plan — only JVM
warm-up, not work, is elided.

SELF-CALIBRATING (r10): min-of-2 de-noises within a session but cannot
detect the machine itself being slower than last round's machine (the
r9 bench drifted a uniform ~1.4x on queries whose code had ZERO diffs,
and nothing in the output could prove it was environment, not code). So
the bench now:
  - times a FIXED-COST, data-independent calibration job (pinned
    range->hash->groupBy aggregate) first, after the headline loop,
    and last; "drift_pct" >> 10% across the three means the machine
    shifted mid-run and the round's numbers deserve suspicion (the
    mid probe exists because a concurrent job that starts AND ends
    inside the run is invisible to a pre/post-only bracket);
  - emits "normalized" per-query seconds (raw / calibration) — the
    unit is "calibrations", a machine-speed-free number comparable
    across rounds;
  - if a previous BENCH_r*.json with a calibration row exists in the
    repo, emits "vs_prev" drift-normalized ratios per query:
    (t/cal) / (t_prev/cal_prev) — ~1.0 means the PLAN is unchanged
    regardless of what the machine did between rounds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import shutil

from pyspark.sql import functions as F

from bda_spark.operators.gold import (
    aggregated_keywords,
    aggregated_news,
    aggregated_yfinance,
)
from bda_spark.operators.silver import silver_news, silver_yfinance
from bda_spark.plans import get_queries
from bda_spark.session import get_spark
from bda_spark.sources.batch import load_table

# Headline set: the medallion/gold analogs, the streaming-analog windowed
# queries, joins, and one of each LLM-pipeline operator family.
HEADLINE = [
    "pricing_summary",
    "gold_daily_orders",
    "top_customers",
    "regional_order_stats",
    "events_windowed_10min",
    "events_bucket_join_corr",
    "events_asof_join",
    "events_lead_label",
    "keyword_counts",
    "doc_quality_scores",
    "exact_dedup_keyset",
    "ngram_jaccard_pairs",
    "doc_duplicate_passages",
    "cosine_topk",
    # round-2 surface: bucketed near-dup/ANN scale paths, interpolation,
    # reporting views, language ID, multimodal decode
    "minhash_neardup_pairs",
    "simhash_neardup_strict",
    "cosine_topk_bucketed",
    "events_interpolate_1h",
    "events_spearman",
    "report_corr_matrix",
    "doc_langid",
    "media_image_features",
    # round-3 surface: dedup clustering, IVF ANN, repetition/PII filters,
    # the Spark-native tick generator, in-engine article extraction
    "neardup_clusters",
    "ivf_topk",
    "doc_repetition_scores",
    "doc_pii_scan",
    "generated_ticks_profile",
    "scraped_articles",
    # OLAP extensions: rollup, exact grouped percentiles, ranked top-k
    "orders_rollup_totals",
    "lineitem_quantity_quantiles",
    "orders_rank_topk",
    # round-4 surface: mixture construction (decontamination, stratified
    # sampling, train/val split, sequence packing)
    "doc_decontaminate",
    "docs_stratified_sample",
    "docs_pack_sequences",
    "doc_unigram_logprob",
    "events_sessionize",
    # round-4 OLAP widening: cube + count-distinct, engine-side reshape
    # in both directions, argmax aggregate
    "orders_cube_customers",
    "events_pivot_daily",
    "docs_unpivot_stats",
    "events_argmax_daily",
    "doc_decontaminate_bloom",
    "events_trailing_7d",
    "events_variant_extract",
    "customer_balance_ntiles",
    "docs_listagg_sources",
    # round-6 surface: Misra-Gries frequent-items beside the exact top-k
    "keyword_counts_sketch",
    # round-7 surface: the sort-free binned-rank Spearman beside the exact
    # rank path (same registry family as the other approx scale twins)
    "events_spearman_approx",
    # round-10 surface: PQ/ADC compressed-domain ANN beside IVF/SQ8,
    # DSIR target-matched data selection beside the quality/mixture ops
    "pq_adc_topk",
    "docs_dsir_sample",
]


def lineitem_quantiles_approx(spark, sf_dir):
    """Bench-only scale twin of ``lineitem_quantity_quantiles``: at 100 TB
    the exact per-group sort gives way to ``percentile_approx`` (one-pass
    KLL-style sketch, mergeable map-side) — timed here, oracled via its
    exact sibling."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.percentile_approx(
            "l_quantity", F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75)), F.lit(10000)
        ).alias("qs")
    )


def ivf_sq8_topk_bench(spark, sf_dir):
    """Bench-only: the composed FAISS-style IVF+SQ8 ANN shape — probe a
    fraction of cells, coarse-rank probed candidates on int8 codes,
    exact-rerank the survivors. Timed here; recall pinned vs brute
    force in tests/test_quantize.py."""
    from bda_spark.operators.quantize import ivf_sq8_topk
    from pyspark.sql import functions as SF

    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_sq8_topk(
        emb, emb.filter(SF.col("vec_id") < 5),
        k=5, n_centroids=16, n_probe=4, oversample=4,
    )


def corpus_build_bench(spark, sf_dir):
    """Bench-only: the end-to-end corpus build (dedup -> quality gate ->
    decontaminate -> pack) as one composed plan over the documents
    table — the LLM-data twin of medallion_pipeline. Conservation laws
    pinned in tests/test_datamix.py."""
    from bda_spark.plans.datamix import corpus_build_pipeline
    from pyspark.sql import functions as SF

    docs = load_table(spark, sf_dir, "documents")
    _, _, manifest = corpus_build_pipeline(
        docs.filter(SF.col("doc_id") % 7 != 0),
        docs.filter(SF.col("doc_id") % 7 == 0),
    )
    return manifest


def cosine_topk_sq8(spark, sf_dir):
    """Bench-only scale twin of ``cosine_topk``: int8-quantized coarse
    scan (4x fewer candidate-phase bytes) + exact rerank of the 4k
    survivors — timed here, recall pinned vs brute force in
    tests/test_quantize.py."""
    from bda_spark.operators.quantize import sq8_topk
    from pyspark.sql import functions as SF

    emb = load_table(spark, sf_dir, "embeddings")
    return sq8_topk(emb, emb.filter(SF.col("vec_id") < 5), k=5, oversample=4)


def pq_adc_topk_ladder(spark, sf_dir):
    """Bench-only PRUNING regime of PQ/ADC (the oracle-verified
    pq_adc_topk row runs the corpus-covering-oversample exactness
    regime): real codebooks, compressed-domain coarse scan keeping
    k*oversample candidates, exact rerank of the survivors — the
    read-1.6%-of-the-bytes plan that runs at 100 TB. Recall pinned in
    tests/test_pq.py; also a scale-ladder rung."""
    from bda_spark.operators.pq import pq_adc_topk
    from pyspark.sql import functions as SF

    emb = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        emb, emb.filter(SF.col("vec_id") < 5),
        k=5, m=8, n_codewords=64, oversample=4,
    )


def semantic_dedup_bench(spark, sf_dir):
    """Bench-only MULTI-CELL regime of SemDeDup (the oracle-verified
    semantic_dedup_keepers row runs the exact 1-cell regime): learned
    k-means cells, within-cell candidates, hot-cell rank-gap cap, CC,
    keeper per group — the plan shape that runs at 100 TB. Recall and
    cap behavior pinned in tests/test_semdedup.py."""
    from bda_spark.operators.similarity import semantic_dedup

    emb = load_table(spark, sf_dir, "embeddings")
    return semantic_dedup(emb, threshold=0.45, n_centroids=16, seed=42)


def events_approx_distinct(spark, sf_dir):
    """Bench-only scale twin of the exact count-distinct measures
    (count_distinct_custkeys, orders_cube_customers): at 100 TB exact
    distinct counting shuffles every distinct key; HyperLogLog++
    (``approx_count_distinct``) is a fixed-size mergeable sketch — the
    shuffle carries one ~few-KB buffer per (partition, group)
    regardless of cardinality. Timed here; accuracy pinned against the
    exact count in tests/test_plans.py (rsd 5% default)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.count("*").alias("n_events"),
    )


def calibration_sec(spark) -> float:
    """One fixed-cost, data-independent probe of this machine+session's
    current speed: a pinned range -> hash -> groupBy aggregate that
    exercises codegen, shuffle, and the driver collect path, with ZERO
    dependence on sf_dir. min-of-2, same de-noising policy as the
    queries. The absolute number is meaningless; the RATIO between two
    measurements of it (start vs end of a run, round N vs round N-1)
    isolates machine drift from plan changes."""

    def _run():
        # 250M rows: compute-dominated (a 50M probe is ~half fixed
        # job-scheduling overhead, whose run-to-run noise is ±20%)
        (
            spark.range(0, 250_000_000, 1, 32)
            .select(F.pmod(F.hash("id"), F.lit(997)).alias("k"), "id")
            .groupBy("k")
            .agg(F.sum("id").alias("s"), F.avg("id").alias("a"))
            .orderBy("k")
            .collect()
        )

    # Warm-6 + min-of-5 at BOTH measurement points: the probe's JIT
    # steady state needs several executions on a fresh JVM (C2 tiered
    # compilation lands late), and a pre-C2 "pre" against a post-C2
    # "post" would read as 30-50% machine drift that never happened.
    # Symmetric policy so pre and post measure the same thing.
    for _ in range(6):
        _run()
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        _run()
        best = min(best, time.time() - t0)
    return best


def bench_records() -> dict[int, tuple[dict, str]]:
    """round -> (parsed record, source FILENAME) for every usable bench
    record beside this script. Scans BOTH the driver-written
    BENCH_r{N}.json (which may be a truncated 2 kB stdout tail — the
    r10 record lost its calibration block exactly that way) and the
    bench's own full-fidelity BENCH_LOCAL_r{N}.json; for the same
    round a record WITH a calibration row wins, so comparisons stay
    drift-normalized even when the driver capture truncates. The
    filename travels with the record so every emitted comparison can
    name its baseline VERBATIM — the r12 VERDICT blemish was a notes
    file attributing a vs_prev to the wrong baseline because the
    provenance lived nowhere in the record. Read-only, best-effort —
    the bench must keep its output contract even on a checkout
    without history."""
    import glob as _glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    by_round: dict[int, tuple[dict, str]] = {}
    for pat in ("BENCH_r*.json", "BENCH_LOCAL_r*.json"):
        for p in _glob.glob(os.path.join(here, pat)):
            m = _re.search(r"BENCH(?:_LOCAL)?_r(\d+)\.json$", p)
            if not m:
                continue
            n = int(m.group(1))
            try:
                with open(p) as f:
                    d = json.load(f)
            except (OSError, ValueError):
                continue
            parsed = d.get("parsed", d)
            if not (isinstance(parsed, dict) and "queries" in parsed):
                continue
            cur = by_round.get(n)
            if cur is None or (
                parsed.get("calibration") and not cur[0].get("calibration")
            ):
                by_round[n] = (parsed, os.path.basename(p))
    return by_round


BENCH_TICKERS = ["BP", "COP", "SHEL", "XOM"]


def prepare_bronze(spark, sf_dir: str, out_dir: str) -> None:
    """Untimed setup: derive deterministic bronze fixtures from the
    driver tables (events -> nested yfinance bronze, documents -> news
    bronze) and land them as parquet, so the timed job reads bronze
    from disk exactly like the baseline (bronze -> silver -> gold,
    reference spark_bronze_to_silver.log)."""
    events = load_table(spark, sf_dir, "events")
    ticker = F.element_at(
        F.array(*[F.lit(t) for t in BENCH_TICKERS]),
        (F.pmod("user_id", len(BENCH_TICKERS)) + 1).cast("int"),
    )
    upd = F.struct(
        F.col("value").alias("price"),
        (F.col("user_id") * 100.0).alias("volume"),
        (F.col("value") / 10.0).alias("volatility"),
        F.lit(0.01).alias("bid_ask_spread"),
        F.lit(0.1).alias("market_sentiment"),
        F.lit(50.0).alias("trading_activity"),
        F.col("ts").alias("timestamp"),
        F.lit("YLIFE_FEED").alias("source"),
    )
    assigned = events.withColumn("ticker", ticker)
    bronze_yf = assigned.groupBy(
        F.window("ts", "1 minute")["start"].alias("timestamp")
    ).agg(
        *[
            F.collect_list(F.when(F.col("ticker") == t, upd)).alias(f"updates_{t}")
            for t in BENCH_TICKERS
        ]
    )
    bronze_yf.write.mode("overwrite").parquet(os.path.join(out_dir, "bronze_yf"))

    docs = load_table(spark, sf_dir, "documents")
    bronze_news = docs.select(
        F.concat(F.lit("title_"), F.col("doc_id")).alias("title"),
        "text",
        F.date_format(
            F.date_add(F.lit("2024-01-01").cast("date"), F.pmod("doc_id", 30).cast("int")),
            "yyyy-MM-dd",
        ).alias("date"),
        F.slice(F.split("text", " "), 1, 3).alias("keywords"),
        (F.pmod("doc_id", 5) == 0).alias("is_premium"),
        F.col("source").alias("source_site"),
        F.concat(F.lit("https://example.invalid/"), F.col("doc_id")).alias("url"),
        F.col("doc_id").cast("string").alias("random"),
    )
    bronze_news.write.mode("overwrite").parquet(os.path.join(out_dir, "bronze_news"))


def prepare_ticks(spark, sf_dir: str, out_dir: str) -> None:
    """Untimed setup: re-shape the events table into the 13-field JSON
    tick records the streaming app decodes (one line per Kafka record),
    so the timed section replays a real file-source stream."""
    events = load_table(spark, sf_dir, "events")
    tick = F.struct(
        F.lit("BP").alias("symbol"),
        # cast: belt-and-braces vs NTZ parquet (load_table canonicalizes,
        # but a setup crash here killed the whole round-5 bench).
        F.unix_millis(F.col("ts").cast("timestamp")).alias("timestamp"),
        F.lit("YLIFE_FEED").alias("source"),
        F.lit("MARKET_DATA").alias("data_type"),
        F.lit(-1.0).alias("bid"),
        F.lit(-1.0).alias("ask"),
        F.col("value").alias("price"),
        (F.col("user_id") * 10.0).alias("volume"),
        F.lit(-1.0).alias("spread_raw"),
        F.lit(-1.0).alias("spread_table"),
        (F.col("value") / 10.0).alias("volatility"),
        F.lit(0.5).alias("market_sentiment"),
        F.lit(50.0).alias("trading_activity"),
    )
    events.select(F.to_json(tick).alias("value")).write.mode("overwrite").text(
        os.path.join(out_dir, "ticks")
    )


def run_streaming(spark, work: str) -> int:
    """The timed streaming job: decode -> watermarked window trainer ->
    per-tick predictor -> label backfill, replayed to completion with
    AvailableNow (the reference's three-query app; its predictor budget
    is one 1-second trigger per batch).

    Streaming state-store partition count is fixed by
    spark.sql.shuffle.partitions at first query start and should be
    sized to KEY CARDINALITY, not CPU count: this pipeline keys state
    by a handful of symbols/windows, so 32 near-empty state stores
    would just multiply per-micro-batch commit overhead (measured ~3x
    on this replay). 8 is the workload-sized choice; a deployment with
    millions of keys raises it. Restored after the run so the batch
    queries keep their 32."""
    from bda_spark.streaming import TickPipeline, file_replay_tick_stream

    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        ticks = file_replay_tick_stream(spark, os.path.join(work, "ticks"))
        pipe = TickPipeline(spark, ticks, "BP", os.path.join(work, "pipe"))
        pipe.run_available_now()
        return pipe.predictions().count()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def run_medallion(spark, bronze_dir: str, gold_dir: str) -> None:
    """The timed end-to-end job the 347-813 s baseline measures: bronze
    parquet -> silver refinement -> three gold aggregates -> parquet
    sinks (the reference's Cassandra INSERT loop, as distributed
    writes)."""
    news = silver_news(spark.read.parquet(os.path.join(bronze_dir, "bronze_news")))
    yf = silver_yfinance(
        spark.read.parquet(os.path.join(bronze_dir, "bronze_yf")), BENCH_TICKERS
    )
    for name, df in (
        ("aggregated_news", aggregated_news(news)),
        ("aggregated_keywords", aggregated_keywords(news)),
        ("aggregated_yfinance", aggregated_yfinance(yf)),
    ):
        df.write.mode("overwrite").parquet(os.path.join(gold_dir, name))


# Drift gate (r13 VERDICT task 1): a run whose three calibration probes
# disagree by more than this is machine-noise-poisoned — its per-query
# ratios are not trustworthy (the driver's r13 record carried 22% drift
# and contradicted a clean 6.5%-drift run on two queries). Instead of
# only FLAGGING the drift, the bench now rejects the attempt and
# re-measures, up to the attempt cap; if every attempt drifts, the
# least-drifted one is emitted (with the full per-attempt drift list in
# the record, so a reader can see the gate never passed).
DRIFT_GATE_PCT = 10.0
DRIFT_GATE_MAX_ATTEMPTS = 3


def pick_attempt(attempts: list[tuple[dict, dict]]) -> tuple[dict, dict]:
    """Gate decision, separated for unit testing: the accepted attempt
    is the LEAST-DRIFTED one (the loop in main() already stops at the
    first attempt under the gate, so when one passed it is also the
    last; when none passed this picks the most trustworthy of the
    noisy ones — ties resolve to the earliest, min() is stable)."""
    return min(attempts, key=lambda a: a[1]["drift_pct"])


def measure_attempt(spark, sf_dir: str, qs) -> tuple[dict, dict]:
    """One complete measured pass — calibration bracket, two interleaved
    query passes, medallion, streaming — returning (timings,
    calibration block). Pulled out of main() so the drift gate can
    re-run the whole thing."""
    cal_pre = calibration_sec(spark)

    timings: dict[str, float] = {}

    def run_once(name: str, run) -> None:
        t0 = time.time()
        run()
        dt = time.time() - t0
        timings[name] = round(min(timings.get(name, float("inf")), dt), 3)

    # Bench-only scale twin: sub-bucketed sequence packing (no single
    # mega-source serializes one partition's window sort).
    from bda_spark.plans.datamix import pack_sequences_salted

    entries: list[tuple[str, object]] = [
        (n, (lambda nn=n: qs[nn](spark, sf_dir).collect())) for n in HEADLINE
    ] + [
        (
            "lineitem_quantiles_approx",
            lambda: lineitem_quantiles_approx(spark, sf_dir).collect(),
        ),
        (
            "events_approx_distinct",
            lambda: events_approx_distinct(spark, sf_dir).collect(),
        ),
        ("cosine_topk_sq8", lambda: cosine_topk_sq8(spark, sf_dir).collect()),
        ("ivf_sq8_topk", lambda: ivf_sq8_topk_bench(spark, sf_dir).collect()),
        (
            "pq_adc_topk_pruned",
            lambda: pq_adc_topk_ladder(spark, sf_dir).collect(),
        ),
        ("semantic_dedup", lambda: semantic_dedup_bench(spark, sf_dir).collect()),
        (
            "corpus_build_pipeline",
            lambda: corpus_build_bench(spark, sf_dir).collect(),
        ),
        (
            "docs_pack_sequences_salted",
            lambda: pack_sequences_salted(
                load_table(spark, sf_dir, "documents")
            ).collect(),
        ),
    ]

    # Two INTERLEAVED passes over the whole list, min per query — NOT
    # back-to-back min-of-2: a transient JVM episode (GC storm, codegen
    # cache churn, an external process stealing cores for a couple of
    # minutes) spans several consecutive queries, and two back-to-back
    # runs both sit inside it (observed: two same-code runs where a
    # CONTIGUOUS block of headline queries read 2-3x slower, different
    # block each run). Interleaving separates a query's two samples by
    # the full suite length, so one bad window can only poison one.
    for name, run in entries:
        run_once(name, run)

    # Mid-run calibration point: pre/post probes bracket the run but
    # cannot see contention that starts AND ends inside it (a
    # concurrent job stealing cores for five minutes in the middle
    # reads as clean pre/post drift while every query number lies).
    # One sample between the passes closes that window.
    cal_mid = calibration_sec(spark)

    for name, run in entries:
        run_once(name, run)

    # Medallion end-to-end (bronze fixture prep is untimed setup).
    # Same min-of-2 policy as the queries: each run re-executes the full
    # job against a fresh output dir, only session noise is elided.
    work = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_tmp")
    shutil.rmtree(work, ignore_errors=True)
    prepare_bronze(spark, sf_dir, work)
    best = float("inf")
    for i in range(2):
        t0 = time.time()
        run_medallion(spark, work, os.path.join(work, f"gold{i}"))
        best = min(best, time.time() - t0)
    timings["medallion_pipeline"] = round(best, 3)

    # Streaming train/predict/backfill replay (tick prep untimed; each
    # run replays from a FRESH checkpoint+sink dir, so both runs do the
    # complete train/predict/backfill work).
    prepare_ticks(spark, sf_dir, work)
    best = float("inf")
    for _ in range(2):
        shutil.rmtree(os.path.join(work, "pipe"), ignore_errors=True)
        t0 = time.time()
        n_preds = run_streaming(spark, work)
        best = min(best, time.time() - t0)
    timings["streaming_pipeline"] = round(best, 3)
    assert n_preds > 0, "streaming bench produced no predictions"
    shutil.rmtree(work, ignore_errors=True)

    cal_post = calibration_sec(spark)
    cal = min(cal_pre, cal_mid, cal_post)
    drift_pct = round(
        100.0 * (max(cal_pre, cal_mid, cal_post) - cal) / cal, 1
    )
    return timings, {
        "pre": round(cal_pre, 3),
        "mid": round(cal_mid, 3),
        "post": round(cal_post, 3),
        "sec": round(cal, 3),
        "drift_pct": drift_pct,
    }


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bda_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()

    # Warmup: JVM + codegen + parquet footer caches.
    qs["grand_totals"](spark, sf_dir).collect()

    # Drift-gated measurement: retry whole attempts whose calibration
    # bracket exceeds DRIFT_GATE_PCT; accept the first clean one, else
    # the least-drifted of the cap. Each finished attempt flushes a
    # provisional BENCH_LOCAL record immediately — a retrying run can
    # take 3x the usual wall clock, and a caller that times it out
    # mid-retry must still find the best-so-far evidence on disk (the
    # final write below overwrites it with the full record).
    import glob as _glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    driver_rounds = [
        int(m.group(1))
        for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
        if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    cur = (max(driver_rounds) + 1) if driver_rounds else 1
    local_path = os.path.join(here, f"BENCH_LOCAL_r{cur}.json")
    # Snapshot the on-disk records BEFORE the first provisional flush:
    # the flush overwrites BENCH_LOCAL_r{cur}.json, and reading the
    # records afterwards would make vs_same_round compare this run to
    # its own provisional output (all-1.0 ratios) instead of to a
    # genuine earlier same-round run.
    pre_records = bench_records()

    def _base_record(t: dict, c: dict) -> dict:
        return {
            "metric": "headline_queries_total",
            "value": round(sum(t.values()), 3),
            "unit": "sec",
            "queries": t,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            "calibration": c,
        }

    attempts: list[tuple[dict, dict]] = []
    for _ in range(DRIFT_GATE_MAX_ATTEMPTS):
        attempts.append(measure_attempt(spark, sf_dir, qs))
        best_t, best_c = pick_attempt(attempts)
        with open(local_path, "w") as f:
            json.dump(
                {
                    **_base_record(best_t, best_c),
                    "partial": "attempt flush; final record overwrites",
                },
                f,
                indent=1,
            )
            f.write("\n")
        if attempts[-1][1]["drift_pct"] <= DRIFT_GATE_PCT:
            break
    timings, cal_block = pick_attempt(attempts)
    cal = cal_block["sec"]
    cal_block = {
        **cal_block,
        "drift_gate_pct": DRIFT_GATE_PCT,
        "attempts": len(attempts),
        "attempt_drifts": [a[1]["drift_pct"] for a in attempts],
        "gate_passed": cal_block["drift_pct"] <= DRIFT_GATE_PCT,
    }

    out = {
        **_base_record(timings, cal_block),
        # machine-speed-free per-query numbers (unit: calibrations)
        "normalized": {k: round(v / cal, 3) for k, v in timings.items()},
    }
    # The current round = newest driver BENCH_r{N} + 1 (the driver
    # writes BENCH_r{N}.json at the END of round N, so any run during
    # round N sees N-1 as the newest driver file; `cur`, `here`, and
    # `local_path` were computed before the attempt loop above so the
    # per-attempt flushes target the same file).

    def _compare(prev: dict) -> tuple[float | None, dict]:
        prev_cal = (prev.get("calibration") or {}).get("sec")
        pq = prev.get("queries", {})
        ratios = {}
        for k, v in timings.items():
            if not pq.get(k):
                continue
            r = v / pq[k]
            if prev_cal:  # drift-normalized when the prev round has a row
                r *= prev_cal / cal
            ratios[k] = round(r, 3)
        return prev_cal, ratios

    # vs_prev: the HEADLINE comparison, always against the newest
    # PREVIOUS round (r12 VERDICT task 4: mid-round, the newest record
    # on disk is this round's own earlier commit — comparing against
    # it silently changes what "vs_prev" means; that drift produced
    # the r12 notes misattribution). A same-round record still gets a
    # secondary vs_same_round block, and BOTH name their baseline
    # file so the provenance is in the record, not in prose.
    records = {
        n: rec
        for n, rec in pre_records.items()
        if rec[0].get("sf") == out["sf"]
    }
    prev_rounds = [n for n in records if n < cur]
    if prev_rounds:
        prev_n = max(prev_rounds)
        prev, prev_file = records[prev_n]
        prev_cal, ratios = _compare(prev)
        out["vs_prev"] = {
            "round": prev_n,
            "baseline_file": prev_file,
            "prev_calibration": prev_cal,
            "normalized": bool(prev_cal),
            "ratios": ratios,
        }
    if cur in records:
        same, same_file = records[cur]
        same_cal, same_ratios = _compare(same)
        out["vs_same_round"] = {
            "round": cur,
            "baseline_file": same_file,
            "prev_calibration": same_cal,
            "normalized": bool(same_cal),
            "ratios": same_ratios,
        }
    with open(local_path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")

    # Stdout: ONE compact JSON line sized to survive the 2 kB tail
    # capture intact — keep the essentials (value, calibration, the
    # full raw queries dict, vs_prev), shed the reconstructable
    # "normalized" dict (= queries/cal), and degrade vs_prev.ratios
    # to the worst offenders if the line still doesn't fit. The full
    # record is always in BENCH_LOCAL_r{N}.json regardless.
    compact = {
        "metric": out["metric"],
        "value": out["value"],
        "unit": out["unit"],
        "sf": out["sf"],
        "full": os.path.basename(local_path),
        "calibration": out["calibration"],
        "queries": {k: round(v, 2) for k, v in timings.items()},
    }
    if "vs_prev" in out:
        vp = out["vs_prev"]
        rs = sorted(vp["ratios"].values())
        compact["vs_prev"] = {
            "round": vp["round"],
            "baseline_file": vp["baseline_file"],
            "normalized": vp["normalized"],
            "median_ratio": round(rs[len(rs) // 2], 3) if rs else None,
            # worst offenders only on stdout; the full ratio dict is in
            # the local file (the stdout line must fit the 2 kB tail)
            "worst8": dict(
                sorted(vp["ratios"].items(), key=lambda kv: -kv[1])[:8]
            ),
        }
    # the driver keeps the last 2000 stdout chars and json-parses the
    # final line; leave headroom for the newline and value-width growth
    _sep, _budget = (",", ":"), 1950
    line = json.dumps(compact, separators=_sep)
    if len(line) > _budget and "vs_prev" in compact:
        compact["vs_prev"]["worst8"] = dict(
            sorted(
                compact["vs_prev"]["worst8"].items(),
                key=lambda kv: -kv[1],
            )[:4]
        )
        cal_c = compact["calibration"]
        compact["calibration"] = {
            "sec": cal_c["sec"],
            "drift_pct": cal_c["drift_pct"],
            "attempts": cal_c["attempts"],
            "gate_passed": cal_c["gate_passed"],
        }
        line = json.dumps(compact, separators=_sep)
    if len(line) > _budget:
        compact["queries"] = dict(
            sorted(timings.items(), key=lambda kv: -kv[1])[:20]
        )
        compact["queries_note"] = "top20_full_in_local"
        line = json.dumps(compact, separators=_sep)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
