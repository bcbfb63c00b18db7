"""Encoding helpers (SURVEY §2.2 P10-P12, §2.10 M1).

The reference one-hot encodes with literal ``when/otherwise`` columns — seven
fixed categories plus an "other" flag (``pyspark/ML_stock.py:95-120``,
``ML_tomtom.py:101-126``, ``stream_combined.py:75-105``) — rather than
``StringIndexer``+``OneHotEncoder``, which would change column names and
require a fitted vocabulary. The engine keeps the literal form: it is pure
codegen (no fitted state, streaming-safe) and its column names are stable.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def one_hot(df: DataFrame, col: str, categories: list[str],
            prefix: str | None = None, other_col: str | None = None) -> DataFrame:
    """Literal one-hot: one 0/1 column per category plus an 'other' flag
    that is 1 iff no category matched (M1/P10/P11; reference
    ``pyspark/ML_stock.py:95-120``)."""
    prefix = prefix if prefix is not None else col
    flag_cols = []
    for cat in categories:
        name = f"{prefix}_{cat}"
        df = df.withColumn(name, F.when(F.col(col) == cat, 1).otherwise(0))
        flag_cols.append(name)
    if other_col is not None:
        df = df.withColumn(other_col,
                           F.when(horizontal_sum([F.col(c) for c in flag_cols]) == 0, 1).otherwise(0))
    return df


def horizontal_sum(cols: list[Column]) -> Column:
    """Row-wise sum of columns (P11; reference ``reduce(add, [F.col(x) ...])``
    at ``pyspark/ML_stock.py:116``)."""
    return reduce(add, cols)


def null_fallback(*cols: str) -> Column:
    """First-non-null fallback (P12; reference ``coalesce(datetime,
    publish_timestamp)`` intent at ``pyspark/stream_stock.py:65``)."""
    return F.coalesce(*[F.col(c) for c in cols])
