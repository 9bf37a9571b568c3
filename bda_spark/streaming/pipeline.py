"""The continuous train / predict / label-backfill app (SURVEY.md §3.1,
§2.9 T1-T8, §2.10 D1/D3/D4).

Reproduces the reference's three concurrent streaming queries per symbol
(reference: Deliverable_3/NEW_train_offset_3_10min.py:94-334) with its
anti-patterns fixed per SURVEY §4:

- trainer: watermarked 10-min tumbling window -> avg features ->
  VectorAssembler -> foreachBatch LinearRegression refit, model saved
  through the pointer-file ModelStore (ref :124-211)
- predictor: per-tick features -> foreachBatch model.transform; the
  model is CACHED and reloaded only when the pointer changes (the
  reference re-read it from disk every 1-second batch, ref :237);
  feature serialization is ``to_json(struct(...))`` — JVM-side — instead
  of the reference's row-at-a-time Python UDF (ref :244-248)
- label backfiller: 10-min window avg of the actual price, upserted
  into a SEPARATE small ``labels`` table keyed by (symbol, window) with
  the crash-safe idempotent merge sink; the predictions table itself is
  append-only and labels are joined on the window bucket AT READ TIME
  (``predictions()``). No driver-side collect() loop of per-window
  read-modify-writes (ref :301-325), checkpointed (the reference's
  label query wasn't, ref :328-332) — and, because every table has
  exactly ONE writer (predictor -> predictions/, backfiller ->
  labels/), the three queries of ``start_all`` can run genuinely
  concurrently with no append-vs-merge race on the predictions dir.

Every query is checkpointed and driven either by
``Trigger.AvailableNow`` (tests: deterministic replay-to-completion) or
a processing-time trigger (production cadence: 10 min / 1 s / 10 min,
ref :211,:280,:331).
"""

from __future__ import annotations

import os

from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import LinearRegression
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.cleaning import validate_ticks
from ..functions.timeutils import event_time_from_millis
from ..ml.persistence import ModelStore
from ..sources.sinks import idempotent_merge_parquet

# Per-symbol feature sets (reference: NEW_train_offset_3_10min.py:21-27;
# equity feeds carry volume/volatility/sentiment/activity, the crypto
# feed carries the bid/ask book columns).
SYMBOL_FEATURES: dict[str, list[str]] = {
    "BP": ["volume", "volatility", "market_sentiment", "trading_activity", "price"],
    "COP": ["volume", "volatility", "market_sentiment", "trading_activity", "price"],
    "SHEL": ["volume", "volatility", "market_sentiment", "trading_activity", "price"],
    "XOM": ["volume", "volatility", "market_sentiment", "trading_activity", "price"],
    "ETHEREUM": ["bid", "ask", "spread_raw", "spread_table", "price"],
}

LABEL_COLUMN = "price"


def normalize_ticks(
    ticks: DataFrame, symbol: str, feature_cols: list[str]
) -> DataFrame:
    """Symbol filter + double casts + label + exact epoch-millis
    event_time (reference: :107-121; timestamp_millis instead of the
    reference's /1000 double cast)."""
    return (
        ticks.filter(F.col("symbol") == symbol)
        .select(
            "symbol",
            *[F.col(f).cast("double").alias(f) for f in feature_cols],
            F.col(LABEL_COLUMN).cast("double").alias("label"),
            F.col("timestamp").cast("long").alias("timestamp"),
        )
        .withColumn("event_time", event_time_from_millis("timestamp"))
    )


def windowed_features(
    df: DataFrame,
    feature_cols: list[str],
    window: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """T1/T2/A1: watermarked tumbling window x symbol -> avg of each
    feature + avg label (reference: :124-151). Works identically on a
    batch frame (no watermark applied) — the batch twin is the
    events_windowed_10min CORRECTNESS query."""
    if df.isStreaming:
        df = df.withWatermark("event_time", watermark)
    return (
        df.groupBy(F.window("event_time", window), "symbol")
        .agg(
            *[F.avg(f).alias(f"avg_{f}") for f in feature_cols],
            F.avg("label").alias("label"),
        )
        .select(
            "symbol",
            *[f"avg_{f}" for f in feature_cols],
            "label",
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
        )
    )


class TickPipeline:
    """One symbol's three-query continuous app over a decoded tick stream.

    Layout under ``work_dir``: models/, checkpoints/{agg,pred,labels}/,
    predictions/ (append-only, hive-partitioned by ``pred_date`` so a
    dashboard scan of recent days partition-prunes; the parquet
    stand-in for the reference's Cassandra ``model_predictions_10m``
    table, schema per schemas.PREDICTIONS_SCHEMA minus the historical
    column), labels/ (tiny: one row per (symbol, window), upserted by
    the backfiller alone).
    """

    def __init__(
        self,
        spark: SparkSession,
        ticks: DataFrame,
        symbol: str,
        work_dir: str,
        feature_cols: list[str] | None = None,
        window: str = "10 minutes",
        watermark: str = "20 minutes",
        max_iter: int = 50,
        reg_param: float = 0.01,
        elastic_net_param: float = 0.5,
        historical_store: ModelStore | None = None,
    ):
        self.spark = spark
        self.symbol = symbol
        self.feature_cols = feature_cols or SYMBOL_FEATURES[symbol]
        self.window = window
        self.watermark = watermark
        self.work_dir = work_dir
        self.models_dir = os.path.join(work_dir, "models")
        self.predictions_path = os.path.join(work_dir, "predictions")
        self.labels_path = os.path.join(work_dir, "labels")
        self.checkpoints = {
            q: os.path.join(work_dir, "checkpoints", q) for q in ("agg", "pred", "labels")
        }
        self.store = ModelStore(self.models_dir)
        self.historical_store = historical_store
        self._lr_params = dict(
            maxIter=max_iter, regParam=reg_param, elasticNetParam=elastic_net_param
        )
        # the ingest gate the decode path promises: malformed/partial
        # records (PERMISSIVE nulls, enum violations) die HERE, not as a
        # VectorAssembler crash that would crash-loop the checkpointed
        # predictor on the same poisoned offset forever
        self.normalized = normalize_ticks(
            validate_ticks(ticks), symbol, self.feature_cols
        )
        # belt-and-braces: a null that still reaches an assembler (e.g.
        # a tick passing the gate with a null optional feature) drops
        # the row instead of killing the query
        self._assembler_agg = VectorAssembler(
            inputCols=[f"avg_{f}" for f in self.feature_cols],
            outputCol="features", handleInvalid="skip",
        )
        self._assembler_pred = VectorAssembler(
            inputCols=self.feature_cols, outputCol="features",
            handleInvalid="skip",
        )

    # ---------------------------------------------------------- trainer
    def _train_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """D4: refit a fresh LinearRegression on each windowed micro-batch
        and publish it through the pointer file (reference: :177-203)."""
        if batch_df.isEmpty():
            return
        assembled = self._assembler_agg.transform(batch_df).select("features", "label")
        model = LinearRegression(
            featuresCol="features", labelCol="label", **self._lr_params
        ).fit(assembled)
        self.store.save(model, "LinearRegression")

    # -------------------------------------------------------- predictor
    def _predict_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Per-tick prediction with the cached current model; appends to
        the predictions table with a NULL label (backfilled later).
        input_data = to_json(struct(features)) — D1's UDF-free form.

        With a ``historical_store`` set, the tournament-selected
        historical model scores the SAME frame via a second chained
        transform — no join at all, which fixes the reference's
        symbol-only join (ref stream_and_historical_model.py:599-603,
        a cross-match at >1 row per symbol per batch; SURVEY §2.3 J2)."""
        if batch_df.isEmpty():
            return
        model = self.store.current()
        if model is None:
            return
        preds = model.transform(self._assembler_pred.transform(batch_df)).withColumnRenamed(
            "prediction", "prediction_streaming"
        )
        historical = self.historical_store.current() if self.historical_store else None
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
            F.to_json(F.struct(*[F.col(f) for f in self.feature_cols])).alias(
                "input_data"
            ),
            F.col("prediction_streaming").alias("prediction"),
            "prediction_historical",
            F.to_date("event_time").alias("pred_date"),
        )
        # batch-scoped overwrite = replay idempotence: foreachBatch is
        # at-least-once after a failure, and a blind append would land
        # the re-run batch twice. Each batch owns one subdirectory, so
        # the replay overwrites its own rows and nothing else; dates
        # stay hive-partitioned INSIDE the batch dir for pruning.
        out.write.mode("overwrite").partitionBy("pred_date").parquet(
            os.path.join(self.predictions_path, f"batch={batch_id}")
        )

    # --------------------------------------------------- label backfill
    def _backfill_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """T7/T10: upsert the stream's CUMULATIVE per-window label rows
        into the tiny ``labels`` table (one row per window; rewriting it
        costs nothing and the backfiller is its only writer, so there is
        no concurrent-append race). The incoming rows come from the
        WATERMARKED windowed aggregation in update mode — Spark's state
        store carries each window's running average across micro-batch
        boundaries, so every emitted row is the full cumulative value
        and the keyed replace-merge converges to the true window
        average under ANY trigger alignment (a per-batch groupBy here
        would overwrite a split window's label with the last partial).
        The labels meet the predictions via the bucket equi-join in
        ``predictions()`` — one distributed join at read time replaces
        the reference's collect() loop of per-window Cassandra
        read-modify-writes (ref :301-325) AND the in-place rewrite of
        the big predictions table."""
        if batch_df.isEmpty():
            return
        idempotent_merge_parquet(
            self.spark, batch_df, self.labels_path,
            keys=["symbol", "window_start"],
        )

    # ------------------------------------------------------------ start
    def _writer(self, df: DataFrame, fn, checkpoint: str, mode: str,
                available_now: bool, processing_time: str | None):
        writer = (
            df.writeStream.foreachBatch(fn)
            .outputMode(mode)
            .option("checkpointLocation", checkpoint)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer

    def start_trainer(self, available_now: bool = True,
                      processing_time: str | None = "10 minutes"):
        windowed = windowed_features(
            self.normalized, self.feature_cols, self.window, self.watermark
        )
        return self._writer(
            windowed, self._train_batch, self.checkpoints["agg"], "update",
            available_now, processing_time,
        ).start()

    def start_predictor(self, available_now: bool = True,
                        processing_time: str | None = "1 second"):
        return self._writer(
            self.normalized, self._predict_batch, self.checkpoints["pred"], "append",
            available_now, processing_time,
        ).start()

    def window_labels_stream(self) -> DataFrame:
        """The backfiller's source: watermarked windowed average of the
        actual price in update mode — state carries each window's
        running aggregate across micro-batches, so every emitted row is
        cumulative (see _backfill_batch)."""
        return (
            self.normalized.withWatermark("event_time", self.watermark)
            .groupBy(F.window("event_time", self.window).alias("w"))
            .agg(F.avg("label").alias("actual_price"))
            .select(
                F.lit(self.symbol).alias("symbol"),
                F.col("w.start").alias("window_start"),
                "actual_price",
            )
        )

    def start_label_backfiller(self, available_now: bool = True,
                               processing_time: str | None = "10 minutes"):
        return self._writer(
            self.window_labels_stream(), self._backfill_batch,
            self.checkpoints["labels"], "update", available_now,
            processing_time,
        ).start()

    def run_available_now(self) -> None:
        """Deterministic replay: drain the source through trainer, then
        predictor, then backfiller (tests sequence the queries so the
        predictor always sees a trained model; production starts all
        three concurrently and awaits — see start_all)."""
        for starter in (self.start_trainer, self.start_predictor,
                        self.start_label_backfiller):
            q = starter(available_now=True)
            q.awaitTermination()

    def start_all(
        self,
        processing_time_triggers: bool = True,
        triggers: dict[str, str] | None = None,
    ) -> list:
        """T8: the production multi-query app; caller awaits via
        spark.streams.awaitAnyTermination() (reference: :334).

        Concurrency-safe: the three queries write disjoint locations
        (models/ vs predictions/ appends vs labels/ merges), so none of
        them can clobber another's in-flight output. ``triggers``
        overrides the per-query processingTime cadence (production
        defaults mirror the reference: 10 min / 1 s / 10 min)."""
        t = {"trainer": "10 minutes", "predictor": "1 second",
             "backfiller": "10 minutes"}
        if triggers:
            t.update(triggers)
        available_now = not processing_time_triggers
        return [
            self.start_trainer(available_now, t["trainer"]),
            self.start_predictor(available_now, t["predictor"]),
            self.start_label_backfiller(available_now, t["backfiller"]),
        ]

    def predictions(self) -> DataFrame:
        """The labeled predictions view: append-only predictions bucket
        equi-joined with the labels table (broadcast — one row per
        window). Label-less windows read as NULL, exactly like the
        reference's Cassandra rows before their backfill write.

        Existence of the labels table is decided by the FILESYSTEM, not
        by catching read errors: a corrupt or unreadable labels table
        raises instead of silently reading as 'nothing labeled yet'
        (the bare-except hazard the merge sink also guards against)."""
        from ..sources.sinks import _hadoop_path

        preds = self.spark.read.parquet(self.predictions_path).drop("batch")
        fs, labels_p = _hadoop_path(self.spark, self.labels_path)
        if not fs.exists(labels_p):
            return preds.withColumn("label", F.lit(None).cast("double"))
        labels = self.spark.read.parquet(self.labels_path)
        bucketed = preds.withColumn(
            "window_start", F.window("event_time", self.window)["start"]
        )
        return (
            bucketed.join(
                F.broadcast(labels), ["symbol", "window_start"], "left"
            )
            .withColumn("label", F.col("actual_price"))
            .drop("actual_price", "window_start")
        )
