"""Multi-dimensional data layout: Z-order (Morton) clustering for
data-skipping on MORE THAN ONE predicate column.

A lake sorted on one column prunes scans on that column only. Interleaving
the bits of two columns into a Morton code and range-partitioning on it
keeps rows that are close in BOTH dimensions in the SAME files, so parquet
min/max stats prune selective predicates on either column — the layout
trick behind Delta/Iceberg ``ZORDER BY`` clustering, here as a plain
DataFrame operator. The key is pure shift/mask arithmetic (codegen'd,
engine-portable — the SQL oracle states the identical expression).
"""

from __future__ import annotations

import functools

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def morton_key(col_a: str | Column, col_b: str | Column,
               bits: int = 16) -> Column:
    """2-D Morton (Z-order) code: interleave the low ``bits`` bits of two
    non-negative integer columns — ``a``'s bit i lands at position 2i,
    ``b``'s at 2i+1. Pure shifts and masks; 2·bits codegen terms."""
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long")
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)),
                                 2 * i))
        terms.append(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)),
                                 2 * i + 1))
    # Column.__or__ is BOOLEAN or in PySpark — bitwiseOR is the integer one
    return functools.reduce(lambda x, y: x.bitwiseOR(y),
                            terms).alias("morton")


def morton_key_sql(col_a: str, col_b: str, bits: int = 16) -> str:
    """The DuckDB-portable twin of ``morton_key`` for oracle strings."""
    terms = []
    for i in range(bits):
        terms.append(f"((({col_a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({col_b} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_layout(df: DataFrame, col_a: str, col_b: str, bits: int = 16,
                  num_partitions: int | None = None,
                  key_col: str = "zkey") -> DataFrame:
    """Cluster the frame by the 2-D Morton code of ``(col_a, col_b)``:
    range partition + local sort on the code, so each output file covers a
    small bounding BOX in both dimensions (a lexicographic sort would give
    thin full-height stripes: perfect pruning on one column, none on the
    other). Write the result and parquet min/max stats prune selective
    predicates on EITHER column. Same no-single-partition-sort shape as
    ``shuffle_corpus``."""
    d = df.withColumn(key_col, morton_key(col_a, col_b, bits))
    parts = (num_partitions
             or d.sparkSession.sparkContext.defaultParallelism)
    return (d.repartitionByRange(parts, F.col(key_col))
            .sortWithinPartitions(key_col))
