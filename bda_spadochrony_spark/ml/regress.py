"""Regression training / inference / evaluation (SURVEY §2.10 M4-M8).

The reference trains ``SparkXGBRegressor(tree_method='hist', max_depth=3,
n_estimators=15/20, min_child_weight=70)`` (``pyspark/ML_stock.py:204-216``,
``ML_tomtom.py:221-233``) with dynamic allocation disabled for barrier mode
(``spark.txt:15-17``). xgboost may be absent in a given environment, so the
estimator is resolved behind one interface: ``SparkXGBRegressor`` when
importable, else ``pyspark.ml.regression.GBTRegressor`` with equivalent
depth/rounds — same API (fit/transform/save/load), same pipeline shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def make_regressor(label_col: str, features_col: str = "features",
                   max_depth: int = 3, n_estimators: int = 20,
                   min_child_weight: float = 70.0, seed: int = 42):
    """M5 estimator factory: XGBoost-on-Spark when available (reference
    params, ``pyspark/ML_stock.py:204-213``), GBTRegressor fallback with the
    equivalent knobs (maxDepth, maxIter, minInstancesPerNode)."""
    try:
        from xgboost.spark import SparkXGBRegressor  # type: ignore
        return SparkXGBRegressor(
            features_col=features_col, label_col=label_col,
            tree_method="hist", max_depth=max_depth, n_estimators=n_estimators,
            min_child_weight=min_child_weight, random_state=seed)
    except ImportError:
        from pyspark.ml.regression import GBTRegressor
        return GBTRegressor(featuresCol=features_col, labelCol=label_col,
                            maxDepth=max_depth, maxIter=n_estimators,
                            minInstancesPerNode=max(1, int(min_child_weight)),
                            seed=seed)


def train_regressor(df: DataFrame, label_col: str,
                    features_col: str = "features",
                    weights: tuple[float, float] = (0.7, 0.3), seed: int = 42,
                    **estimator_kwargs):
    """M4+M5+M6: seeded train/test split (reference 70/30,
    ``pyspark/ML_stock.py:190``), fit, and predictions on both splits.
    Returns (model, train_pred, test_pred)."""
    train, test = df.randomSplit(list(weights), seed=seed)
    est = make_regressor(label_col, features_col, seed=seed, **estimator_kwargs)
    model = est.fit(train)
    return model, model.transform(train), model.transform(test)


def linear_fit(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Closed-form simple linear regression (normal equations) as pure
    aggregates — the fully-oracled twin of the GBT/XGBoost leg (whose
    engine-seeded split and tree internals are inherently rows-only).

    slope = Σ(x−x̄)(y−ȳ) / Σ(x−x̄)², intercept = ȳ − slope·x̄, plus MAE of
    the fitted line — the CENTERED form, not the raw-moment
    n·Σxy − Σx·Σy quotient, whose catastrophic cancellation would make a
    cross-engine value oracle float-fragile. Three aggregate passes, each
    map-side combinable; the one-row fit frame broadcasts back for the
    residual pass — no window, no collect, scale-free at any row count.
    Rows with a NULL in either column are excluded (SQL regr_* domain).
    """
    xy = df.select(F.col(x_col).cast("double").alias("x"),
                   F.col(y_col).cast("double").alias("y")) \
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
    means = xy.agg(F.avg("x").alias("mx"), F.avg("y").alias("my"),
                   F.count(F.lit(1)).alias("n"))
    centered = xy.join(F.broadcast(means))
    fit = (centered.groupBy("mx", "my", "n")
           .agg(F.sum((F.col("x") - F.col("mx")) *
                      (F.col("y") - F.col("my"))).alias("sxy"),
                F.sum((F.col("x") - F.col("mx")) *
                      (F.col("x") - F.col("mx"))).alias("sxx"))
           .select("mx", "my", "n",
                   (F.col("sxy") / F.col("sxx")).alias("slope")))
    fit = fit.select("n", "slope",
                     (F.col("my") - F.col("slope") * F.col("mx"))
                     .alias("intercept"))
    resid = (xy.join(F.broadcast(fit))
             .groupBy("n", "slope", "intercept")
             .agg(F.avg(F.abs(F.col("y") - (F.col("slope") * F.col("x") +
                                            F.col("intercept")))).alias("mae")))
    return resid.select("n", "slope", "intercept", "mae")


def evaluate_mae(pred: DataFrame, label_col: str,
                 prediction_col: str = "prediction") -> float:
    """M7: MAE via RegressionEvaluator (reference ``pyspark/ML_stock.py:223-236``)."""
    from pyspark.ml.evaluation import RegressionEvaluator
    return RegressionEvaluator(labelCol=label_col, predictionCol=prediction_col,
                               metricName="mae").evaluate(pred)


def save_model(model, path: str) -> None:
    """M8: overwrite-save (reference ``pyspark/ML_stock.py:241``)."""
    model.write().overwrite().save(path)


def load_model(path: str, xgboost_first: bool = True):
    """M8: load a persisted model (reference ``stream_combined.py:112-113``)."""
    if xgboost_first:
        try:
            from xgboost.spark import SparkXGBRegressorModel  # type: ignore
            return SparkXGBRegressorModel.load(path)
        except ImportError:
            pass
    from pyspark.ml.regression import GBTRegressionModel
    return GBTRegressionModel.load(path)
