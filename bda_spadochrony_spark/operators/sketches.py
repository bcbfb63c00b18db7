"""Mergeable distinct-count sketches (Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg``/``hll_union_agg``).

The 100 TB pattern this enables: store one small sketch per partition
(day, source, shard) instead of raw keys, then answer "distinct over any
partition subset" by UNIONING sketches — no rescan of the data, and the
union is LOSSLESS with respect to the sketch (merging per-partition
sketches yields byte-equivalent state to sketching the whole dataset at
the same lg_k). ``approx_count_distinct`` cannot do this: its sketch is
not exposed, so every new partition subset costs a full rescan.

Accuracy: DataSketches HLL is EXACT while the sketch remains in its
coupon (sparse) regime — bounded by BOTH the set-promotion threshold
(~``0.75 * 2^(lg_k-2)``) and the fixed 2^26 coupon space's collision
bound (~2500 distinct keys; see ``exact_regime_max``) — and
~±1.6%/sqrt(2^lg_k) beyond it. lg_k=14 keeps the testdata cardinalities
(≤1500 distinct users at sf0.1) in the exact regime, which is what lets
the contract query carry a value oracle; ``assert_coupon_regime`` makes
the oracled query fail loudly rather than silently drift if a larger sf
ever exceeds the regime. Production use at larger cardinality is
approximate by design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def coupon_capacity(lg_k: int) -> int:
    """Distinct-key count up to which a DataSketches HLL at ``lg_k`` stays
    in its coupon (list/set) regime, i.e. is EXACT: ~0.75 * 2^(lg_k-2)."""
    return int(0.75 * (1 << (lg_k - 2)))


def exact_regime_max(lg_k: int, safety: float = 0.75) -> int:
    """Distinct-count ceiling below which the estimate is exact in
    practice: the set-promotion bound scaled by ``safety``, CAPPED by the
    coupon-collision bound. A coupon is a 32-bit (26-bit slot + 6-bit
    value) hash fragment, so the coupon space is 2^26 REGARDLESS of lg_k
    — raising lg_k does not extend exactness (measured: lg_k=21 over 10^5
    distinct keys estimates 100009, not 100000). Below ~2500 coupons the
    expected collision count is < 5e-2 and the estimator returns the
    exact count."""
    return min(int(coupon_capacity(lg_k) * safety), 2500)


def assert_coupon_regime(estimate: Column, lg_k: int,
                         safety: float = 0.75) -> Column:
    """Wrap an HLL estimate column so a query FAILS LOUDLY instead of
    silently drifting from an exact-count oracle when the sketch leaves
    its exact regime: the estimate (always within ~2% of truth) must sit
    below ``exact_regime_max``."""
    thr = exact_regime_max(lg_k, safety)
    return F.when(estimate < F.lit(thr), estimate).otherwise(
        F.raise_error(F.concat(
            F.lit("HLL estimate "), estimate.cast("string"),
            F.lit(f" is not safely inside the exact regime of lg_k={lg_k} "
                  f"(ceiling {thr}); the estimate is approximate here — "
                  f"drop the exact-count oracle"))))


def partition_distinct_sketches(df: DataFrame, part_cols: list[str],
                                key_col: str, lg_k: int = 14) -> DataFrame:
    """One HLL sketch (+ row count) per partition-column group — the
    store-this-per-day form. Map-side partial aggregation applies; the
    shuffle carries one small sketch per (mapper, group)."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(key_col, lg_k).alias("hll_sketch"),
        F.count(F.lit(1)).alias("n_rows"))


def merged_distinct_estimate(sketches: DataFrame,
                             group_cols: list[str] | None = None,
                             sketch_col: str = "hll_sketch") -> DataFrame:
    """Union sketches (optionally per group) and estimate the distinct
    count — the no-rescan rollup over any partition subset."""
    est = F.hll_sketch_estimate(F.hll_union_agg(sketch_col)) \
        .alias("distinct_estimate")
    if group_cols:
        return sketches.groupBy(*group_cols).agg(est)
    return sketches.agg(est)
