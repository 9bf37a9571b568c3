"""Stage attribution for the streaming_pipeline bench row (VERDICT r14
#4): the 5-6 s replay was the #2 headline bench entry and the only
unattributed one. This harness replays the SAME job bench.py times
(prepare_ticks fixture -> fused trainer+backfiller drain -> predictor
drain -> predictions count) with per-stage instrumentation:

- the fused foreachBatch is wrapped to split each batch into the
  stateful-aggregate materialization (repartition+cache+count), the
  LinearRegression fit, and the label merge;
- the predictor foreachBatch is wrapped to split model transform+write
  from the emptiness/model gates;
- micro-batch scheduling overhead is what remains of each query's wall
  clock after the instrumented foreachBatch time — commit/offset-log
  writes, state-store bookkeeping, trigger planning;
- a RATE x N variant replicates every tick N times (distinct
  timestamps inside the same windows, so window count and model shape
  stay fixed while per-batch volume grows Nx) to measure where
  per-event cost starts to dominate the fixed per-batch overhead —
  the basis for the max-sustainable-events/s note against the
  reference's 1-second predictor trigger budget.

Writes PROFILE_STREAMING.json beside the repo root; the prose summary
lands in BENCH_NOTES_r{N}.md.

Usage:  python tools/profile_streaming.py [rate_factors...]
        (default factors: 1 10)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


class _Timed:
    """Accumulates (calls, seconds) per stage label."""

    def __init__(self) -> None:
        self.stages: dict[str, list[float]] = {}

    def add(self, stage: str, sec: float) -> None:
        self.stages.setdefault(stage, []).append(sec)

    def report(self) -> dict:
        return {
            k: {"calls": len(v), "sec": round(sum(v), 3)}
            for k, v in self.stages.items()
        }


def _instrumented_pipeline(spark, ticks, symbol, work, timer: _Timed):
    """A TickPipeline whose fused and predictor foreachBatch bodies are
    split into timed stages — same work, same order, same sinks (the
    overridden methods re-state the originals' steps 1:1; any logic
    drift would show up as a different predictions count)."""
    from pyspark.ml.regression import LinearRegression

    from bda_spark.sources.sinks import idempotent_merge_parquet
    from bda_spark.streaming.batchdir import write_batch_dir
    from bda_spark.streaming.pipeline import TickPipeline

    class Profiled(TickPipeline):
        def _train_and_backfill_batch(self, batch_df, batch_id):
            t0 = time.time()
            windowed = batch_df.repartition(1).cache()
            try:
                n = windowed.count()
                timer.add("fused.agg_materialize", time.time() - t0)
                if n == 0:
                    return
                t1 = time.time()
                assembled = self._assembler_agg.transform(windowed).select(
                    "features", "label"
                )
                model = LinearRegression(
                    featuresCol="features", labelCol="label",
                    **self._lr_params,
                ).fit(assembled)
                self.store.save(model, "LinearRegression")
                timer.add("fused.lr_fit_and_publish", time.time() - t1)
                t2 = time.time()
                labels = windowed.select(
                    "symbol",
                    "window_start",
                    F.col("label").alias("actual_price"),
                )
                idempotent_merge_parquet(
                    self.spark, labels, self.labels_path,
                    keys=["symbol", "window_start"],
                    vacuum_min_age_seconds=self.labels_vacuum_min_age_seconds,
                    versioned=True,
                )
                timer.add("fused.label_merge", time.time() - t2)
            finally:
                windowed.unpersist()

        def _predict_batch(self, batch_df, batch_id):
            t0 = time.time()
            if batch_df.isEmpty():
                timer.add("pred.empty_gate", time.time() - t0)
                return
            model = self.store.current()
            timer.add("pred.gate_and_model_load", time.time() - t0)
            if model is None:
                return
            t1 = time.time()
            preds = model.transform(
                self._assembler_pred.transform(batch_df)
            ).withColumnRenamed("prediction", "prediction_streaming")
            historical = (
                self.historical_store.current()
                if self.historical_store
                else None
            )
            if historical is not None:
                preds = historical.transform(preds).withColumnRenamed(
                    "prediction", "prediction_historical"
                )
            else:
                preds = preds.withColumn(
                    "prediction_historical", F.lit(None).cast("double")
                )
            out = preds.select(
                "symbol",
                "timestamp",
                "event_time",
                F.to_json(
                    F.struct(*[F.col(f) for f in self.feature_cols])
                ).alias("input_data"),
                F.col("prediction_streaming").alias("prediction"),
                "prediction_historical",
                F.to_date("event_time").alias("pred_date"),
            )
            write_batch_dir(out, self.predictions_path, batch_id)
            timer.add("pred.transform_and_write", time.time() - t1)

    return Profiled(spark, ticks, symbol, work)


def _query_progress(q) -> dict:
    """Micro-batch counts + engine-reported durations from the query's
    recentProgress (the scheduler's own accounting, independent of the
    foreachBatch wall clocks)."""
    batches, rows = 0, 0
    dur: dict[str, float] = {}
    for p in q.recentProgress:
        batches += 1
        rows += p["numInputRows"]
        for k, v in (p.get("durationMs") or {}).items():
            dur[k] = dur.get(k, 0.0) + v / 1000.0
    return {
        "micro_batches": batches,
        "input_rows": rows,
        "engine_duration_sec": {k: round(v, 3) for k, v in dur.items()},
    }


def profile_once(spark, ticks_dir: str, work: str, timer: _Timed) -> dict:
    from bda_spark.streaming import file_replay_tick_stream

    shutil.rmtree(work, ignore_errors=True)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        ticks = file_replay_tick_stream(spark, ticks_dir)
        pipe = _instrumented_pipeline(spark, ticks, "BP", work, timer)
        out: dict = {}
        t0 = time.time()
        q = pipe.start_trainer_and_backfiller(available_now=True)
        q.awaitTermination()
        out["fused_wall_sec"] = round(time.time() - t0, 3)
        out["fused_progress"] = _query_progress(q)
        t1 = time.time()
        q = pipe.start_predictor(available_now=True)
        q.awaitTermination()
        out["predictor_wall_sec"] = round(time.time() - t1, 3)
        out["predictor_progress"] = _query_progress(q)
        t2 = time.time()
        out["n_predictions"] = pipe.predictions().count()
        out["predictions_read_sec"] = round(time.time() - t2, 3)
        out["total_wall_sec"] = round(time.time() - t0, 3)
        out["stages"] = timer.report()
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)


def main() -> None:
    import bench
    from bda_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    factors = [int(a) for a in sys.argv[1:]] or [1, 10]
    spark = get_spark("profile_streaming")
    spark.sparkContext.setLogLevel("ERROR")
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.join(here, ".profile_streaming_tmp")
    shutil.rmtree(root, ignore_errors=True)
    ticks1 = os.path.join(root, "ticks1x")
    bench.prepare_ticks(spark, sf_dir, os.path.join(root, "prep"))
    os.rename(os.path.join(root, "prep", "ticks"), ticks1)

    report: dict = {"sf_dir": sf_dir, "factors": {}}
    base_rows = spark.read.text(ticks1).count()
    for factor in factors:
        ticks_dir = ticks1
        if factor > 1:
            # replicate each tick `factor`x with jittered epoch-millis
            # (+0..factor-1 ms: same windows, distinct rows) — volume
            # grows factor-x, window/model shape stays fixed
            ticks_dir = os.path.join(root, f"ticks{factor}x")
            src = spark.read.text(ticks1)
            reps = (
                src.select(
                    F.explode(
                        F.sequence(F.lit(0), F.lit(factor - 1))
                    ).alias("k"),
                    "value",
                )
                .select(
                    F.to_json(
                        F.struct(
                            # bump the millis timestamp by k so rows
                            # stay distinct without leaving the window
                            *[
                                (
                                    F.get_json_object("value", "$.timestamp")
                                    .cast("long")
                                    + F.col("k")
                                ).alias("timestamp")
                                if f == "timestamp"
                                else F.get_json_object("value", f"$.{f}")
                                .cast(t)
                                .alias(f)
                                for f, t in [
                                    ("symbol", "string"),
                                    ("timestamp", "long"),
                                    ("source", "string"),
                                    ("data_type", "string"),
                                    ("bid", "double"),
                                    ("ask", "double"),
                                    ("price", "double"),
                                    ("volume", "double"),
                                    ("spread_raw", "double"),
                                    ("spread_table", "double"),
                                    ("volatility", "double"),
                                    ("market_sentiment", "double"),
                                    ("trading_activity", "double"),
                                ]
                            ]
                        )
                    ).alias("value")
                )
            )
            reps.write.mode("overwrite").text(ticks_dir)
        timer = _Timed()
        run = profile_once(
            spark, ticks_dir, os.path.join(root, f"pipe{factor}x"), timer
        )
        run["tick_rows"] = base_rows * factor
        run["predictor_events_per_sec"] = (
            round(run["tick_rows"] / run["predictor_wall_sec"], 1)
            if run["predictor_wall_sec"] > 0
            else None
        )
        report["factors"][f"{factor}x"] = run
        print(json.dumps({f"{factor}x": run}, indent=1))

    out_path = os.path.join(here, "PROFILE_STREAMING.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
        f.write("\n")
    shutil.rmtree(root, ignore_errors=True)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
