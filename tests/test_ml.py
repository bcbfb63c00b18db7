"""ML surface tests (SURVEY §2.10 M1-M8): feature pipeline, train/eval,
persistence, streaming inference (T6)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from bda_spadochrony_spark.ml.features import build_features, assemble_vector
from bda_spadochrony_spark.ml.regress import (train_regressor, evaluate_mae,
                                              save_model, load_model)
from bda_spadochrony_spark.operators.windows import range_frame_agg
from bda_spadochrony_spark.sources.readers import scan


@pytest.fixture(scope="module")
def feature_frame(spark):
    """ML_stock-shaped pipeline on events: calendar + one-hot features,
    forward-window target (next-hour value sum), assembled vector."""
    ev = scan(spark, "/root/testdata/sf0.001/events.parquet")
    ev = ev.withColumn("ts_unix", F.unix_timestamp("ts"))
    ev = range_frame_agg(ev, "ts_unix", (0, 3600),
                         [(F.sum("value"), "label")])
    feats = build_features(ev, "ts", "event_type",
                           ["click", "view", "purchase"], prefix="et")
    cols = ["hour", "dayofweek", "month", "et_click", "et_view",
            "et_purchase", "et_other", "value"]
    return assemble_vector(feats.na.drop("any", subset=cols + ["label"]),
                           cols).cache()


def test_feature_vector_shape(feature_frame):
    row = feature_frame.first()
    assert row["features"].size == 8
    assert row["label"] is not None


def test_train_eval_mae(feature_frame):
    model, train_pred, test_pred = train_regressor(
        feature_frame, "label", n_estimators=5)
    mae_train = evaluate_mae(train_pred, "label")
    mae_test = evaluate_mae(test_pred, "label")
    assert mae_train > 0 and mae_test > 0
    # sanity: model beats predicting zero (labels are ~60-row sums of ~20s)
    mean_label = feature_frame.agg(F.avg("label")).first()[0]
    assert mae_test < mean_label


def test_model_persistence_roundtrip(feature_frame, spark):
    model, _, test_pred = train_regressor(feature_frame, "label", n_estimators=3)
    d = tempfile.mkdtemp(prefix="bda_model_")
    try:
        save_model(model, d)
        loaded = load_model(d)
        a = model.transform(feature_frame).select("prediction").limit(5).collect()
        b = loaded.transform(feature_frame).select("prediction").limit(5).collect()
        assert [r["prediction"] for r in a] == [r["prediction"] for r in b]
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_streaming_inference(feature_frame, spark):
    """T6 — a fitted model transforms a STREAMING DataFrame (reference
    applies XGBoost on the stream pre-join, stream_combined.py:126-128)."""
    import os
    from pyspark.sql.types import (DoubleType, IntegerType, LongType,
                                   StringType, StructField, StructType,
                                   TimestampType)
    from bda_spadochrony_spark.streaming.sources import file_stream
    from bda_spadochrony_spark.streaming.runner import run_available_now

    model, _, _ = train_regressor(feature_frame, "label", n_estimators=3)
    d = tempfile.mkdtemp(prefix="bda_stream_ml_")
    try:
        shutil.copy("/root/testdata/sf0.001/events.parquet",
                    os.path.join(d, "part-0.parquet"))
        schema = StructType([
            StructField("event_id", LongType()), StructField("ts", TimestampType()),
            StructField("user_id", LongType()), StructField("event_type", StringType()),
            StructField("value", DoubleType()), StructField("props", StringType()),
        ])
        stream = file_stream(spark, d, schema)
        feats = build_features(stream, "ts", "event_type",
                               ["click", "view", "purchase"], prefix="et")
        vec = assemble_vector(feats, ["hour", "dayofweek", "month", "et_click",
                                      "et_view", "et_purchase", "et_other", "value"])
        scored = model.transform(vec).select("event_id", "prediction")
        out = run_available_now(spark, scored)
        rows = out.collect()
        assert len(rows) > 0 and all(r["prediction"] is not None for r in rows)
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_linear_fit_matches_sql_regr_functions(spark):
    """linear_fit's centered normal-equations output must agree with the
    SQL-standard regr_slope/regr_intercept (DuckDB) on real data — the
    equivalence that justifies oracling the ML family's closed-form twin."""
    import duckdb
    from bda_spadochrony_spark.ml.regress import linear_fit
    from bda_spadochrony_spark.sources.readers import scan
    sf = "/root/testdata/sf0.001"
    li = scan(spark, f"{sf}/lineitem.parquet")
    row = linear_fit(li, "l_quantity", "l_extendedprice").first()
    want = duckdb.sql(
        "SELECT regr_slope(l_extendedprice, l_quantity) AS slope,"
        "       regr_intercept(l_extendedprice, l_quantity) AS intercept,"
        "       regr_count(l_extendedprice, l_quantity) AS n "
        f"FROM '{sf}/lineitem.parquet'").fetchone()
    assert row["n"] == want[2]
    assert abs(row["slope"] - want[0]) < 1e-6 * max(1.0, abs(want[0]))
    assert abs(row["intercept"] - want[1]) < 1e-6 * max(1.0, abs(want[1]))
    # MAE of the fitted line is positive and below the label's mean |y|
    assert 0 < row["mae"] < 1e6


def test_linear_fit_exact_on_known_line(spark):
    """On exactly-linear data the fit recovers slope/intercept and MAE 0;
    NULL rows in either column are excluded (regr_* domain)."""
    from bda_spadochrony_spark.ml.regress import linear_fit
    rows = [(float(x), 3.5 * x - 2.0) for x in range(50)]
    rows += [(None, 99.0), (1.0, None)]
    df = spark.createDataFrame(rows, ["x", "y"])
    r = linear_fit(df, "x", "y").first()
    assert r["n"] == 50
    assert abs(r["slope"] - 3.5) < 1e-9
    assert abs(r["intercept"] + 2.0) < 1e-9
    assert r["mae"] < 1e-9


def test_centroid_classify_recovers_separated_clusters(spark):
    import numpy as np
    from bda_spadochrony_spark.ml.centroids import (centroid_classify,
                                                    classification_report,
                                                    label_centroids)
    rng = np.random.RandomState(5)
    rows = []
    for lbl, center in [(0, [10, 0, 0]), (1, [0, 10, 0]), (2, [0, 0, 10])]:
        for i in range(30):
            v = (np.array(center) + rng.randn(3) * 0.5).tolist()
            rows.append((lbl * 100 + i, v, lbl))
    df = spark.createDataFrame(
        rows, "vec_id: long, embedding: array<double>, label: int")
    cents = label_centroids(df, "embedding", "label")
    assert cents.count() == 9   # 3 labels x 3 dims
    pred = centroid_classify(df, "vec_id", "embedding", cents)
    got = {r["vec_id"]: r["pred_label"] for r in pred.collect()}
    assert all(got[i] == i // 100 for i in got) and len(got) == 90
    rep = {(r["label"], r["pred_label"]): r["n"]
           for r in classification_report(pred, df, "vec_id").collect()}
    assert rep == {(0, 0): 30, (1, 1): 30, (2, 2): 30}


def test_centroid_classify_tie_breaks_to_smallest_label(spark):
    from bda_spadochrony_spark.ml.centroids import centroid_classify
    df = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id: long, embedding: array<double>")
    cents = spark.createDataFrame(
        [(7, 1, 3.0), (7, 2, 4.0), (3, 1, -3.0), (3, 2, -4.0)],
        "label: int, pos: int, mu: double")   # equidistant centroids
    got = centroid_classify(df, "vec_id", "embedding", cents).collect()
    assert got[0]["pred_label"] == 3 and abs(got[0]["dist"] - 25.0) < 1e-6


def test_kmeans_lloyd_step_moves_centers_toward_clusters(spark):
    import numpy as np
    from bda_spadochrony_spark.ml.centroids import kmeans_lloyd_step
    rng = np.random.RandomState(9)
    rows = []
    for lbl, center in [(0, [10.0, 0.0]), (1, [-10.0, 0.0])]:
        for i in range(25):
            rows.append((lbl * 100 + i,
                         (np.array(center) + rng.randn(2)).tolist()))
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    # bad seeds: both on the x axis but offset — step should land each on
    # its cluster's true mean
    seeds = spark.createDataFrame(
        [(0, 1, 5.0), (0, 2, 0.0), (1, 1, -5.0), (1, 2, 0.0)],
        "label: int, pos: int, mu: double")
    new = {(r["label"], r["pos"]): r["mu"]
           for r in kmeans_lloyd_step(df, "vec_id", "embedding",
                                      seeds).collect()}
    a = np.array([r[1] for r in rows[:25]])
    b = np.array([r[1] for r in rows[25:]])
    assert abs(new[(0, 1)] - a[:, 0].mean()) < 1e-9
    assert abs(new[(0, 2)] - a[:, 1].mean()) < 1e-9
    assert abs(new[(1, 1)] - b[:, 0].mean()) < 1e-9
    assert abs(new[(1, 2)] - b[:, 1].mean()) < 1e-9


def test_kmeans_lloyd_step_drops_empty_clusters(spark):
    from bda_spadochrony_spark.ml.centroids import kmeans_lloyd_step
    df = spark.createDataFrame(
        [(1, [0.0]), (2, [1.0])], "vec_id: long, embedding: array<double>")
    seeds = spark.createDataFrame(
        [(0, 1, 0.4), (1, 1, 99.0)], "label: int, pos: int, mu: double")
    got = {r["label"]: r["mu"]
           for r in kmeans_lloyd_step(df, "vec_id", "embedding",
                                      seeds).collect()}
    assert got == {0: 0.5}   # far center captured nothing and dropped out
