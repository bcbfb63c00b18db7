"""Batch sources: parquet-lake scans with schema conformance (SURVEY §2.1 S1-S4).

The reference hand-rolls a reader that globs a directory through the Hadoop
FileSystem JVM gateway, reads each file separately, casts column-by-column and
unions the pieces (reference ``pyspark/batch_stock.py:18-36``, duplicated 8×).
That produces N scan nodes + N−1 unions and defeats scan coalescing.

The engine's scan is a single multi-file read: Spark's InMemoryFileIndex does
the listing, the declared schema is applied at the scan (so parquet column
projection + filter pushdown still work), and schema drift across files is
absorbed by the reader instead of per-file unions. At 100 TB this is the
difference between one FileSourceScan with partition pruning and a
thousand-way union.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


# Footer-probe memo: (resolved probe file, mtime_ns, size) -> NANOS columns.
# Re-probing the same static parquet footer on every scan() of every query
# was measurable driver overhead (~0.1-0.3 s/query with py4j warm); the
# mtime/size key keeps the cache correct when tests rewrite a temp path.
_NANOS_CACHE: dict[tuple[str, int, int], list[str]] = {}


def _nanos_timestamp_cols(path: str) -> list[str]:
    """Columns stored as parquet TIMESTAMP(NANOS), which Spark 4 refuses to
    read as TimestampType (PARQUET_TYPE_ILLEGAL). Detected driver-side from
    one footer via pyarrow — cheap (no data read) and list-stable across
    files written by one producer. Memoized on the probe file's identity."""
    try:
        import pyarrow.parquet as pq
    except ImportError:
        return []
    probe = path
    if os.path.isdir(path):
        inner = sorted(glob.glob(os.path.join(path, "*.parquet")) +
                       glob.glob(os.path.join(path, "*", "*.parquet")))
        if not inner:
            return []
        probe = inner[0]
    elif any(ch in path for ch in "*?["):
        inner = sorted(glob.glob(path))
        if not inner:
            return []
        probe = inner[0]
    try:
        st = os.stat(probe)
        key = (probe, st.st_mtime_ns, st.st_size)
    except OSError:
        return []
    cached = _NANOS_CACHE.get(key)
    if cached is not None:
        return cached
    try:
        schema = pq.ParquetFile(probe).schema  # parquet (physical) schema
    except Exception:
        return []
    # Only INT64/TIMESTAMP(NANOS) needs the workaround. INT96 timestamps
    # (Spark's own legacy output) also surface as ns in the ARROW schema but
    # read fine as TimestampType — hence the physical-schema check.
    out = []
    for i in range(len(schema)):
        col = schema.column(i)
        if ("." in col.path):  # nested — leave alone
            continue
        if col.physical_type == "INT64" and "nanoseconds" in str(col.logical_type):
            out.append(col.name)
    _NANOS_CACHE[key] = out
    return out


def scan(spark: SparkSession, path: str, schema: StructType | None = None,
         fmt: str = "parquet", drop: list[str] | None = None,
         options: dict[str, str] | None = None) -> DataFrame:
    """Single-scan replacement for the reference's glob-and-union reader
    (``pyspark/batch_stock.py:18-36``).

    With ``schema`` the scan reads exactly the declared columns/types —
    parquet readers cast compatible physical types at scan time and
    null-fill files that miss a column, which subsumes the reference's
    ``unionByName(allowMissingColumns=True)`` drift handling
    (``pyspark/batch_stock.py:35``). ``drop`` removes known junk columns
    (reference drops ``UNNAMED_FIELD``/``wind_deg``/``timeValidity`` —
    ``pyspark/ML_stock.py:80``, ``merge_openweather.py:78``,
    ``ML_tomtom.py:156``) — with a declared schema they are simply never
    read, which is the pushed-down version of ``drop``. ``options`` passes
    format options through (e.g. ``{"header": "true"}`` for CSV).
    """
    # NANOS-precision parquet timestamps: Spark 4 reads them only as epoch
    # longs (``nanosAsLong``); the engine converts back to TimestampType at
    # microsecond precision (``ns div 1000`` — same truncation DuckDB and
    # pyarrow apply), so downstream operators always see real timestamps.
    nanos_cols = _nanos_timestamp_cols(path) if fmt == "parquet" else []
    if nanos_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read.format(fmt)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    if schema is not None:
        if nanos_cols:
            schema = StructType([
                StructField(f.name, LongType(), f.nullable) if f.name in nanos_cols else f
                for f in schema.fields])
        reader = reader.schema(schema)
    df = reader.load(path)
    for c in nanos_cols:
        if c in df.columns:
            df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    if drop:
        df = df.drop(*[c for c in drop if c in df.columns])
    return df


def conform(df: DataFrame, schema: StructType, keep_extra: bool = False) -> DataFrame:
    """Cast/align a drifted DataFrame to a declared schema in ONE projection.

    Engine version of the reference's ``cast_columns_to_schema``
    (``pyspark/batch_stock.py:11-16``, 8 copies) which chains a
    ``withColumn`` per field — each ``withColumn`` adds a Project node;
    one ``select`` keeps the plan flat and lets whole-stage codegen fuse
    every cast. Missing columns are added as typed nulls (the
    ``allowMissingColumns`` semantics of S4).
    """
    cols = []
    for field in schema.fields:
        if field.name in df.columns:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    if keep_extra:
        declared = {f.name for f in schema.fields}
        cols.extend(F.col(c) for c in df.columns if c not in declared)
    return df.select(*cols)


def union_by_name(*dfs: DataFrame) -> DataFrame:
    """Schema-drift union (SURVEY §2.1 S4; reference
    ``pyspark/batch_stock.py:35``): union N frames by column name,
    null-filling columns absent on either side."""
    if not dfs:
        raise ValueError("union_by_name needs at least one DataFrame")
    out = dfs[0]
    for df in dfs[1:]:
        out = out.unionByName(df, allowMissingColumns=True)
    return out


def parse_json_payload(df: DataFrame, payload_col: str, schema: StructType,
                       keep: list[str] | None = None) -> DataFrame:
    """JSON payload parse (SURVEY §2.1 S9; reference
    ``pyspark/stream_combined.py:49-69``).

    Parses against an all-string struct, then casts each field to the
    declared type in the same projection. The string detour is load-bearing:
    feed payloads quote their numerics (``{"temp": "12.5"}``) and Spark's
    ``from_json`` nulls a quoted number parsed directly into a numeric
    field — the reference's all-string-then-cast dance exists for this
    exact reason; the engine keeps the semantics but fuses it into one
    select. Works identically on batch and streaming DataFrames.
    """
    from pyspark.sql.types import StringType
    str_schema = StructType([StructField(f.name, StringType(), True)
                             for f in schema.fields])
    parsed = df.withColumn(
        "__data", F.from_json(F.col(payload_col).cast("string"), str_schema))
    out_cols = [F.col("__data." + f.name).cast(f.dataType).alias(f.name)
                for f in schema.fields]
    out_cols += [F.col(c) for c in (keep or [])]
    return parsed.select(*out_cols)
