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
from bda_spadochrony_spark.operators.similarity import finite_vectors


def label_centroids(df: DataFrame, vec_col: str, label_col: str) -> DataFrame:
    """Per-label mean vector in row form ``(label, pos, mu)`` (1-based
    ``pos``): one posexplode + one map-side-combined shuffle over
    ``|labels| × d`` keys. The result is dimension-table-sized and
    broadcasts.

    Moment guard (r7 edge program): centroids are coordinate MEANS, so
    one NaN/Inf-element vector destroys its whole label's centroid (the
    mean goes NaN) while the job still 'succeeds' — the same silent
    poisoning ``finite_vectors`` exists to stop on covariance paths.
    Junk vectors are dropped at entry."""
    ex = (finite_vectors(df, vec_col)
          .where(F.col(vec_col).isNotNull() & F.col(label_col).isNotNull())
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

    Moment guard (r7): a NaN-element vector gets NaN distance to EVERY
    centroid — the struct-min then assigns it by the tie-break label
    alone (and downstream ``kmeans_lloyd_step`` would average the NaN
    into that cluster's center). Junk vectors are unclassifiable;
    ``finite_vectors`` drops them at entry.
    """
    ex = (finite_vectors(df, vec_col)
          .where(F.col(vec_col).isNotNull())
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


def kmeans_lloyd_step(df: DataFrame, id_col: str, vec_col: str,
                      centers: DataFrame,
                      round_digits: int | None = None) -> DataFrame:
    """ONE Lloyd iteration of K-Means, fully distributed and fully
    SQL-checkable: assign every vector to its nearest center
    (``centroid_classify`` — broadcast join + argmin) and recompute each
    center as the mean of its assigned vectors (``label_centroids`` —
    |centers|·d aggregate). The training loop is driver logic calling
    this step to convergence; each step's cluster-sized results make the
    iteration itself value-verifiable — the part of iterative ML an
    engine owns (MLlib's KMeans runs exactly this dataflow per
    iteration). A center that captures no vectors drops out of the
    result (standard empty-cluster behavior; re-seed in the loop if
    undesired). ``centers`` comes in row form ``(label, pos, mu)``.
    """
    assign = centroid_classify(df, id_col, vec_col, centers)
    # private assignment column: the input frame may itself carry a
    # column named like the centers' label (e.g. a supervised label)
    labeled = (df.select(F.col(id_col), F.col(vec_col))
               .join(assign.select(F.col(id_col),
                                   F.col("pred_label").alias("__cluster")),
                     id_col))
    out = (label_centroids(labeled, vec_col, "__cluster")
           .withColumnRenamed("__cluster", "label"))
    if round_digits is not None:
        out = out.select("label", "pos",
                         (stable_round(F.col("mu"), round_digits)
                          + F.lit(0.0)).alias("mu"))
    return out


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
