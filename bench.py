"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}.

Per-query timing includes full execution to collect() (the driver-side
materialization the reference also pays). A warmup query absorbs JVM/
codegen startup so numbers reflect steady-state plan execution.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bda_spark.plans import get_queries
from bda_spark.session import get_spark

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
    "cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("bda_spark_bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()

    # Warmup: JVM + codegen + parquet footer caches.
    qs["grand_totals"](spark, sf_dir).collect()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        qs[name](spark, sf_dir).collect()
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
