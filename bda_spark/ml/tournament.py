"""Model tournament + deploy gate (SURVEY.md §2.10 D3-D7).

Reproduces the reference's historical-model selection (reference:
Deliverable_4/stream_and_historical_model.py:155-251): randomSplit
80/20, train LinearRegression / RandomForestRegressor / GBTRegressor,
evaluate RMSE/MAE/R2 with RegressionEvaluator, pick the lowest-RMSE
model — plus the old-vs-new deploy gate (reference: :219-236,
stream_eda.ipynb cell 44): a challenger replaces the champion only if
it scores better on the evaluation set.

Feature preparation re-parses the ``input_data`` JSON the predictor
wrote (get_json_object — reference: :276-280), windows to 10-minute
averages, assembles with VectorAssembler, and drops null/NaN rows in a
single filter (reference looped a count per column, :316-319,
:337-351).
"""

from __future__ import annotations

import math

from dataclasses import dataclass

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.feature import VectorAssembler
from pyspark.ml.regression import GBTRegressor, LinearRegression, RandomForestRegressor
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .persistence import ModelStore

# Hyper-parameters mirror the reference (:162-186).
DEFAULT_MODEL_PARAMS: dict[str, dict] = {
    "LinearRegression": dict(maxIter=50, regParam=0.01, elasticNetParam=0.5),
    "RandomForestRegressor": dict(numTrees=100, maxDepth=10, seed=42),
    "GBTRegressor": dict(maxIter=100, maxDepth=5),
}

_ESTIMATORS = {
    "LinearRegression": LinearRegression,
    "RandomForestRegressor": RandomForestRegressor,
    "GBTRegressor": GBTRegressor,
}


def assemble_features(
    df: DataFrame, feature_cols: list[str], label_col: str = "label"
) -> DataFrame:
    """D3: VectorAssembler + one-pass null/NaN cleanup."""
    assembled = VectorAssembler(
        inputCols=feature_cols, outputCol="features", handleInvalid="skip"
    ).transform(df)
    return assembled.filter(
        F.col(label_col).isNotNull() & ~F.isnan(label_col)
    ).withColumnRenamed(label_col, "label")


def historical_features_from_predictions(
    predictions: DataFrame,
    feature_cols: list[str],
    window: str = "10 minutes",
) -> DataFrame:
    """Rebuild training features from the predictions table: parse each
    feature out of the ``input_data`` JSON string (F3), window to
    10-minute averages, assemble (reference: :276-307). The label comes
    from the backfilled ``label`` column."""
    parsed = predictions.select(
        "symbol",
        "event_time",
        F.col("label").cast("double").alias("label"),
        *[
            F.get_json_object("input_data", f"$.{f}").cast("double").alias(f)
            for f in feature_cols
        ],
    )
    windowed = (
        parsed.groupBy(F.window("event_time", window), "symbol")
        .agg(
            *[F.avg(f).alias(f"avg_{f}") for f in feature_cols],
            F.avg("label").alias("label"),
        )
        .drop("window")
    )
    return assemble_features(windowed, [f"avg_{f}" for f in feature_cols])


@dataclass
class TournamentResult:
    best_model: object
    best_type: str
    metrics: dict[str, dict[str, float]]  # model_type -> {rmse, mae, r2}


def train_tournament(
    features: DataFrame,
    test_size: float = 0.2,
    seed: int = 42,
    model_params: dict[str, dict] | None = None,
) -> TournamentResult:
    """D5/D6/D7: 80/20 randomSplit, fit each estimator, evaluate
    RMSE/MAE/R2 on the held-out split, return the lowest-RMSE model."""
    params = {**DEFAULT_MODEL_PARAMS, **(model_params or {})}
    train, test = features.randomSplit([1 - test_size, test_size], seed=seed)
    train = train.cache()
    evaluator = RegressionEvaluator(labelCol="label", predictionCol="prediction")

    metrics: dict[str, dict[str, float]] = {}
    best_model, best_type, best_rmse = None, None, float("inf")
    for model_type, cls in _ESTIMATORS.items():
        model = cls(featuresCol="features", labelCol="label", **params[model_type]).fit(
            train
        )
        preds = model.transform(test).cache()
        scores = {
            m: evaluator.setMetricName(m).evaluate(preds) for m in ("rmse", "mae", "r2")
        }
        preds.unpersist()
        metrics[model_type] = scores
        # NaN rmse (empty/degenerate test split) never wins a float
        # comparison, so without this guard every candidate would lose
        # and the caller would get TournamentResult(None, ...)
        if not math.isnan(scores["rmse"]) and scores["rmse"] < best_rmse:
            best_model, best_type, best_rmse = model, model_type, scores["rmse"]
    train.unpersist()
    if best_model is None:
        raise ValueError(
            "train_tournament: every candidate scored NaN RMSE — the "
            "test split is empty or degenerate; widen the input window"
        )
    return TournamentResult(best_model, best_type, metrics)


@dataclass
class DeployDecision:
    deployed: bool
    champion_rmse: float | None
    challenger_rmse: float


def deploy_gate(
    store: ModelStore,
    challenger,
    challenger_type: str,
    eval_df: DataFrame,
) -> DeployDecision:
    """D6: the old-vs-new gate — the challenger is persisted (and the
    pointer moved) only when it beats the current champion's RMSE on
    ``eval_df``; with no champion it deploys unconditionally.

    An unmeasurable challenger (NaN RMSE — empty eval frame, all-null
    predictions) NEVER displaces a working champion: NaN loses every
    float comparison, so without the explicit check ``champion <= NaN``
    would be False and the untested model would take the pointer."""
    evaluator = RegressionEvaluator(
        labelCol="label", predictionCol="prediction", metricName="rmse"
    )
    challenger_rmse = evaluator.evaluate(challenger.transform(eval_df))
    champion = store.current()
    champion_rmse = (
        evaluator.evaluate(champion.transform(eval_df)) if champion is not None else None
    )
    if champion is not None and math.isnan(challenger_rmse):
        return DeployDecision(False, champion_rmse, challenger_rmse)
    if champion_rmse is not None and champion_rmse <= challenger_rmse:
        return DeployDecision(False, champion_rmse, challenger_rmse)
    store.save(challenger, challenger_type)
    return DeployDecision(True, champion_rmse, challenger_rmse)
