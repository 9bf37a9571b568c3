"""Capture .explain("formatted") for every declared query into
plans/<tag>/<query>_<suffix>.txt (guide §1: measure first — plan shape,
Exchange count, join strategy, PushedFilters/ReadSchema, Python nodes).

Usage: python tools/capture_plans.py <tag> <suffix> [only_csv]
  e.g. python tools/capture_plans.py r16 before
       python tools/capture_plans.py r16 after pricing_summary,cosine_topk

Plans are captured at $SPARK_GRAFT_SF_DIR (default sf0.1, the bench
scale) so AQE-pre plans match what the bench executes.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bda_spark.plans import get_queries  # noqa: E402
from bda_spark.session import get_spark  # noqa: E402


def plan_text(df) -> str:
    return df._jdf.queryExecution().explainString(
        df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r16"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("bda_spark_plan_capture")
    spark.sparkContext.setLogLevel("ERROR")
    qs = get_queries()
    failed: list[str] = []
    for name, fn in qs.items():
        if only is not None and name not in only:
            continue
        try:
            txt = plan_text(fn(spark, sf_dir))
        except Exception as e:  # capture the failure, keep going
            txt = f"PLAN CAPTURE FAILED: {e!r}\n"
            failed.append(name)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(txt)
        print(name, "FAILED" if name in failed else "ok", flush=True)
    if failed:
        print("FAILED:", ",".join(failed))
    spark.stop()


if __name__ == "__main__":
    main()
