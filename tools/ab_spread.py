"""A/B the r17 cost-gated scan spreading (BDA_SPREAD_SCANS on/off) on
the affected bench queries — interleaved reps in ONE session so host
drift hits both variants equally (the r16 A/B discipline).

Usage: python tools/ab_spread.py [reps] [q1,q2,...]
Timed with the noop sink (guide §1.4); prints min-per-variant and the
ratio. The env toggle works because spread_scan consults the env at
plan-construction time.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bda_spark.plans import get_queries  # noqa: E402
from bda_spark.session import get_spark  # noqa: E402

DEFAULT = (
    "minhash_neardup_pairs,neardup_clusters,corpus_build_pipeline,"
    "doc_duplicate_passages,doc_decontaminate,doc_decontaminate_bloom,"
    "docs_fuzzy_join,pricing_summary,doc_contamination_spans"
)


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    names = (sys.argv[2] if len(sys.argv) > 2 else DEFAULT).split(",")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_spread", extra_confs={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(get_queries())
    import bench

    qs.setdefault("corpus_build_pipeline", bench.corpus_build_bench)
    qs["grand_totals"](spark, sf_dir).collect()  # warmup

    t: dict[tuple[str, str], list[float]] = {}
    for rep in range(reps):
        for n in names:
            for variant in ("on", "off"):
                os.environ["BDA_SPREAD_SCANS"] = "1" if variant == "on" else "0"
                spark.sparkContext.setJobDescription(f"{n}@{variant}#{rep}")
                t0 = time.time()
                qs[n](spark, sf_dir).write.format("noop").mode("overwrite").save()
                t.setdefault((n, variant), []).append(time.time() - t0)
                spark.sparkContext.setJobDescription(None)
    os.environ["BDA_SPREAD_SCANS"] = "1"

    out = {}
    for n in names:
        on = min(t[(n, "on")])
        off = min(t[(n, "off")])
        out[n] = {
            "on_min": round(on, 3),
            "off_min": round(off, 3),
            "speedup_off_over_on": round(off / on, 3),
            "on_all": [round(v, 3) for v in t[(n, "on")]],
            "off_all": [round(v, 3) for v in t[(n, "off")]],
        }
        print(
            f"{n:<32} on={on:6.3f}s off={off:6.3f}s  off/on={off / on:5.2f}x"
        )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
