"""Nearest-centroid classification over embedding columns — the simplest
distributed classifier a labeled embedding table supports, and the building
block IVF quantization, per-class prototypes, and drift monitors share.

Scale shape: the FIT is one posexplode into a ``|labels| × d`` aggregate
(dimension-table-sized at any corpus size — same discipline as
``ml/stats.covariance_matrix``); the ASSIGNMENT is a broadcast join of that
tiny centroid table against the exploded vectors, one ``(id, label)``-keyed
partial-sum shuffle, and a struct-min argmin. No driver collect anywhere,
no pairwise row×row work, fully SQL-expressible — so unlike KMeans/GBT the
whole path carries a DuckDB value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bda_spadochrony_spark.functions.numeric import stable_round


def label_centroids(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Per-label mean vector in row form ``(label, pos, mu)`` (1-based
    ``pos``): one posexplode + one map-side-combined shuffle over
    ``|labels| × d`` keys. The result is dimension-table-sized and
    broadcasts."""
    ex = (df.where(F.col(vec_col).isNotNull() & F.col(label_col).isNotNull())
          .select(F.col(label_col),
                  F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("pos0", "x")))
    return (ex.groupBy(label_col, (F.col("pos0") + 1).alias("pos"))
            .agg(F.avg("x").alias("mu")))


def centroid_classify(df: DataFrame, id_col: str, vec_col: str,
                      centroids: DataFrame, label_col: str = "label",
                      round_digits: int = 6) -> DataFrame:
    """Assign each vector its nearest centroid by squared Euclidean
    distance → ``(id, pred_label, dist)``. Ties break to the smallest
    label; distances are stable-rounded before the argmin so the
    accumulation-order difference between engines cannot flip a
    near-tie (same discipline as every float oracle in the repo).

    Plan: exploded vectors ⋈ broadcast centroid rows on ``pos`` +
    ``(id, label)`` partial-sum shuffle + per-id struct-min. Row width
    through the shuffle is three scalars; nothing driver-side.
    """
    ex = (df.where(F.col(vec_col).isNotNull())
          .select(F.col(id_col),
                  F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("pos0", "x"))
          .select(id_col, (F.col("pos0") + 1).alias("pos"), "x"))
    dists = (ex.join(F.broadcast(centroids), "pos")
             .groupBy(id_col, label_col)
             .agg(F.sum((F.col("x") - F.col("mu")) ** 2).alias("__d")))
    d = stable_round(F.col("__d"), round_digits)
    best = (dists.groupBy(id_col)
            .agg(F.min(F.struct(d.alias("dist"),
                                F.col(label_col).alias("pred_label")))
                 .alias("__b")))
    return best.select(id_col,
                       F.col("__b.pred_label").alias("pred_label"),
                       F.col("__b.dist").alias("dist"))


def classification_report(pred: DataFrame, truth: DataFrame, id_col: str,
                          label_col: str = "label",
                          pred_col: str = "pred_label") -> DataFrame:
    """Confusion-matrix counts ``(label, pred_label, n)`` from a
    prediction frame and a truth frame — one join keyed on the id, one
    count shuffle over ``|labels|²`` keys. Accuracy falls out as
    ``sum(n where label = pred_label) / sum(n)``."""
    j = pred.join(truth.select(F.col(id_col), F.col(label_col)), id_col)
    return (j.groupBy(label_col, pred_col)
            .agg(F.count(F.lit(1)).alias("n")))
