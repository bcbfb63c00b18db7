"""Distributed second-moment statistics over embedding columns: the
single-pass covariance matrix that feeds PCA / whitening / Mahalanobis
pipelines at corpus scale.

The 100 TB shape: covariance of an ``array<float>`` column is a pure
flat-map (two chained ``posexplode``s — no self-join, no driver collect)
followed by ONE bounded shuffle whose key space is ``d*(d+1)/2`` dimension
pairs. Map-side partial aggregation means the shuffle moves
``partitions * d^2/2`` partial sums regardless of row count; the reduce
side finishes ``cov = (S_xy - S_x*S_y/n) / (n-1)``. The d x d result is
dimension-table-sized by construction — small enough to collect for an
eigensolve (PCA) without violating the no-driver-materialization rule for
DATA-sized frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from bda_spadochrony_spark.functions.numeric import stable_round


def covariance_matrix(df: DataFrame, vec_col: str,
                      round_digits: int | None = 4) -> DataFrame:
    """Upper-triangle SAMPLE covariance of an ``array<numeric>`` column:
    one row per dimension pair ``(i, j)`` with ``i <= j`` (1-based), in a
    single pass (see module docstring for the plan shape).

    Rows with a NULL vector are skipped; vectors are assumed
    rectangular (constant length — enforce upstream with
    ``conform_schema``-style checks if the source is untrusted).
    """
    v = F.col("__v")
    ex = (df.where(F.col(vec_col).isNotNull())
          .select(F.col(vec_col).cast("array<double>").alias("__v"))
          .select(F.posexplode(v).alias("i0", "xi"), v))
    # j >= i without a join: slice the tail of the vector at each i
    pairs = ex.select(
        "i0", "xi",
        F.posexplode(F.slice(v, F.col("i0") + 1,
                             F.size(v) - F.col("i0"))).alias("dj", "xj"))
    agg = (pairs.groupBy((F.col("i0") + 1).alias("i"),
                         (F.col("i0") + 1 + F.col("dj")).alias("j"))
           .agg(F.count(F.lit(1)).alias("__n"),
                F.sum("xi").alias("__sx"),
                F.sum("xj").alias("__sy"),
                F.sum(F.col("xi") * F.col("xj")).alias("__sxy")))
    cov = ((F.col("__sxy") - F.col("__sx") * F.col("__sy") / F.col("__n"))
           / (F.col("__n") - 1))
    if round_digits is not None:
        # + 0.0 after rounding: IEEE -0.0 + 0.0 = +0.0, so near-zero cells
        # (everywhere in an off-diagonal) can't split into -0.0 vs 0.0
        # across engines (Spark's BigDecimal round never emits -0.0;
        # C-round engines do — the strings sort differently)
        cov = stable_round(cov, round_digits) + F.lit(0.0)
    return agg.select("i", "j", cov.alias("cov"))
