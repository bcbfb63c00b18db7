"""ML feature pipeline (SURVEY §2.10 M1-M3).

The reference's feature construction is deterministic DataFrame code — literal
one-hot flags for seven weather categories plus 'other'
(``pyspark/ML_stock.py:95-120``), calendar features (``ML_stock.py:87-90``),
and a ``VectorAssembler`` packing every non-label column
(``ML_stock.py:195-201``). The engine keeps it UDF-free and composable so the
same feature frame feeds batch training and streaming inference (the
reference applies identical code on the stream at
``stream_combined.py:75-122``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from bda_spadochrony_spark.functions.encode import one_hot, horizontal_sum
from bda_spadochrony_spark.functions.temporal import calendar_features


def build_features(df: DataFrame, ts_col: str, categorical_col: str,
                   categories: list[str], prefix: str | None = None) -> DataFrame:
    """M1+M2: literal one-hot (+ other flag) and calendar features in one
    pass. Streaming-safe (no fitted state)."""
    prefix = prefix if prefix is not None else categorical_col
    df = calendar_features(df, ts_col)
    return one_hot(df, categorical_col, categories, prefix=prefix,
                   other_col=f"{prefix}_other")


def assemble_vector(df: DataFrame, input_cols: list[str],
                    output_col: str = "features") -> DataFrame:
    """M3: ``VectorAssembler`` (reference ``pyspark/ML_stock.py:195-201``)."""
    from pyspark.ml.feature import VectorAssembler
    assembler = VectorAssembler(inputCols=input_cols, outputCol=output_col)
    return assembler.transform(df)
