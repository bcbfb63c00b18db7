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
