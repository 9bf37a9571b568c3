"""Per-stage runtime attribution for the expensive bench queries
(guide §1/§7: find WHERE the time goes before changing anything).

Runs each named query twice (min-of-2, warm JVM) with a job
description, then pulls per-job/per-stage metrics from the local UI
REST API: task counts, executor run time, shuffle bytes — so a 2 s
query can be split into "1.4 s single-task scan stage + 0.3 s of
32-task shuffle stages + scheduling".

Usage: python tools/profile_queries.py q1,q2,... [out.json]
Timed with the noop sink (guide §1.4) unless NOOP=0.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bda_spark.plans import get_queries  # noqa: E402
from bda_spark.session import get_spark  # noqa: E402


def _bench_only() -> dict:
    """The bench's non-registry entries, loadable by name too."""
    import bench

    return {
        "lineitem_quantiles_approx": bench.lineitem_quantiles_approx,
        "events_approx_distinct": bench.events_approx_distinct,
        "cosine_topk_sq8": bench.cosine_topk_sq8,
        "ivf_sq8_topk": bench.ivf_sq8_topk_bench,
        "pq_adc_topk_pruned": bench.pq_adc_topk_ladder,
        "semantic_dedup": bench.semantic_dedup_bench,
        "corpus_build_pipeline": bench.corpus_build_bench,
    }

UI_PORT = 4059  # requested; the BOUND port is read back from the session

_UI_BASE: str | None = None


def _api(path: str):
    with urllib.request.urlopen(f"{_UI_BASE}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


def main() -> None:
    names = sys.argv[1].split(",")
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    noop = os.environ.get("NOOP", "1") == "1"
    spark = get_spark(
        "bda_spark_profile",
        extra_confs={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # ADVICE r16: read the BOUND UI url (the requested port may be
    # taken and Spark walks forward) and select THIS app by id instead
    # of applications[0]
    global _UI_BASE
    _UI_BASE = spark.sparkContext.uiWebUrl
    qs = dict(get_queries())
    qs.update(_bench_only())
    # warmup
    qs["grand_totals"](spark, sf_dir).collect()

    walls: dict[str, list[float]] = {}
    for rep in range(2):
        for n in names:
            spark.sparkContext.setJobDescription(f"{n}#r{rep}")
            t0 = time.time()
            df = qs[n](spark, sf_dir)
            if noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.collect()
            walls.setdefault(n, []).append(time.time() - t0)
            spark.sparkContext.setJobDescription(None)

    app = spark.sparkContext.applicationId
    jobs = _api(f"applications/{app}/jobs?status=succeeded")
    stages = {
        s["stageId"]: s
        for s in _api(f"applications/{app}/stages?status=COMPLETE")
    }
    per_query: dict[str, dict] = {}
    for j in jobs:
        desc = j.get("description") or ""
        if "#r" not in desc:
            continue
        qname = desc.split("#r")[0]
        rep = desc.split("#r")[1]
        q = per_query.setdefault(qname, {"jobs": 0, "stages": []})
        if rep != "1":  # attribute stages from the second (warm) pass only
            continue
        q["jobs"] += 1
        for sid in j["stageIds"]:
            s = stages.get(sid)
            if not s:
                continue
            q["stages"].append(
                {
                    "stage": sid,
                    "name": s["name"].split("\n")[0][:60],
                    "tasks": s["numCompleteTasks"],
                    "run_ms": s["executorRunTime"],
                    "cpu_ms": round(s.get("executorCpuTime", 0) / 1e6),
                    "sh_read_mb": round(s["shuffleReadBytes"] / 1e6, 2),
                    "sh_write_mb": round(s["shuffleWriteBytes"] / 1e6, 2),
                    "input_mb": round(s["inputBytes"] / 1e6, 2),
                    "wall_ms": None,
                }
            )
    report = {}
    for n in names:
        st = sorted(
            per_query.get(n, {}).get("stages", []),
            key=lambda s: -s["run_ms"],
        )
        report[n] = {
            "wall_sec": [round(w, 3) for w in walls[n]],
            "n_jobs_warm": per_query.get(n, {}).get("jobs", 0),
            "top_stages": st[:12],
            "sum_run_ms": sum(s["run_ms"] for s in st),
        }
        print(f"\n=== {n}  wall={report[n]['wall_sec']} "
              f"jobs={report[n]['n_jobs_warm']} "
              f"sum_exec_run_ms={report[n]['sum_run_ms']}")
        for s in st[:12]:
            print(
                f"  stage {s['stage']:>4} tasks={s['tasks']:>3} "
                f"run={s['run_ms']:>6}ms cpu={s['cpu_ms']:>6}ms "
                f"in={s['input_mb']:>7}MB shR={s['sh_read_mb']:>7}MB "
                f"shW={s['sh_write_mb']:>7}MB  {s['name']}"
            )
    if out_path:
        with open(out_path, "w") as f:
            json.dump(report, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
