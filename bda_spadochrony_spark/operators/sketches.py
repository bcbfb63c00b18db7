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
coupon (sparse) regime — up to roughly ``0.75 * 2^(lg_k-2)`` distinct
keys — and ~±1.6%/sqrt(2^lg_k) beyond it. lg_k=14 keeps the testdata
cardinalities (≤1500 distinct users at sf0.1) in the exact regime, which
is what lets the contract query carry a value oracle; production use at
larger cardinality is approximate by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


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
