"""True as-of join — the temporal-nearest-match operator Spark lacks
natively (the reference approximates it by minute-truncation equi join,
``pyspark/ML_stock.py:125,175``; ``operators.joins.as_of_align`` keeps that
form). This is the real thing: for every left row, the latest right row
with ``right_ts <= left_ts`` (backward; optional tolerance), per key.

Implementation: cogrouped ``applyInPandas`` — both sides shuffle once on
the key, each key's pair of Arrow batches meets in one Python worker, and
``pandas.merge_asof`` (a sorted merge, O(n+m) per key) does the match.
This is the (b)-tier of the custom-operator ladder: not expressible as a
DataFrame composition with these exact semantics, but perfectly shaped for
cogroup — state never crosses keys, and key cardinality distributes.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def asof_join(left: DataFrame, right: DataFrame,
              left_ts: str, right_ts: str, by: list[str],
              tolerance_seconds: float | None = None,
              direction: str = "backward") -> DataFrame:
    """As-of join: left rows enriched with the temporally nearest right row
    per ``by`` key (backward = latest right_ts <= left_ts, the market-data
    convention). Left rows with no match keep nulls. Output schema =
    left columns + right columns (minus the join keys and with ``right_ts``
    kept for inspection)."""
    right_cols = [c for c in right.columns if c not in by]
    overlap = set(left.columns) & set(right_cols)
    if overlap:
        raise ValueError(
            f"asof_join: columns {sorted(overlap)} exist on both sides — "
            f"rename the right side first (e.g. right_ts) so the output "
            f"schema has no duplicate fields")
    out_fields = list(left.schema.fields) + \
        [f for f in right.schema.fields if f.name in right_cols]
    out_schema = StructType(out_fields)
    tol = pd.Timedelta(seconds=tolerance_seconds) if tolerance_seconds is not None else None

    def merge(l: pd.DataFrame, r: pd.DataFrame) -> pd.DataFrame:
        if l.empty:
            return pd.DataFrame(columns=[f.name for f in out_fields])
        l = l.sort_values(left_ts, kind="mergesort")
        if r.empty:
            for c in right_cols:
                l[c] = None
            return l[[f.name for f in out_fields]]
        r = r.sort_values(right_ts, kind="mergesort")
        merged = pd.merge_asof(l, r[right_cols + ([right_ts] if right_ts not in right_cols else [])],
                               left_on=left_ts, right_on=right_ts,
                               direction=direction, tolerance=tol)
        return merged[[f.name for f in out_fields]]

    return (left.groupBy(*by).cogroup(right.groupBy(*by))
            .applyInPandas(lambda key, l, r: merge(l, r), schema=out_schema))
