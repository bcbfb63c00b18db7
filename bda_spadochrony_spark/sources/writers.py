"""Batch sinks: partitioned parquet writes, compaction, serving-table KV sink
(SURVEY §2.1 S5-S7, S13).

The reference's serving sink collects the whole aggregate to the driver and
loops Python rows into Bigtable ``mutate_rows`` batches of 5,000
(``pyspark/batch_stock.py:94-132``). At scale that's a driver OOM; the engine
writes serving rows executor-side (``foreachPartition``) or — default, and
testable — as a keyed parquet "serving table" whose row key matches the
reference's ``"{date}_{hour}"`` composite key (``pyspark/batch_stock.py:120``).
"""

from __future__ import annotations

from typing import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite",
                  partition_by: list[str] | None = None,
                  target_files: int | None = None) -> None:
    """Parquet write (S5, reference ``pyspark/merge_stock.py:85``), with the
    two scale affordances the reference lacks: ``partitionBy`` (date-partitioned
    layout → dynamic partition pruning downstream) and ``target_files``
    (coalesce to bound small-file count — the whole point of compaction)."""
    if target_files is not None:
        df = df.coalesce(target_files)
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def serving_key(*cols, fmt: str | None = None):
    """Composite serving-store row key built in-engine instead of the
    reference's driver-side ``str(row['date']) + "_" + str(row['hour'])``
    (``pyspark/batch_stock.py:120``). ``fmt`` formats a single timestamp
    column, matching the streaming key ``"%Y-%m-%d_%H-%M"``
    (``pyspark/stream_combined.py:233``)."""
    if fmt is not None:
        if len(cols) != 1:
            raise ValueError("fmt applies to exactly one timestamp column")
        return F.date_format(F.col(cols[0]) if isinstance(cols[0], str) else cols[0], fmt)
    return F.concat_ws("_", *[F.col(c).cast("string") if isinstance(c, str) else c.cast("string")
                              for c in cols])


def write_serving_table(df: DataFrame, path: str, key, mode: str = "overwrite") -> None:
    """Default KV sink (S13): all non-key cells stringified (matching the
    reference's ``str(row[...])`` Bigtable cells, ``pyspark/batch_stock.py:124-126``)
    under a ``row_key`` column, written as parquet. Distributed end-to-end —
    no driver collect."""
    cells = [F.col(c).cast("string").alias(c) for c in df.columns]
    df.select(key.alias("row_key"), *cells).write.mode(mode).parquet(path)


def foreach_partition_sink(df: DataFrame, writer: Callable[[Iterable], None]) -> None:
    """Executor-parallel custom sink: ``writer(rows)`` runs once per
    partition (e.g. a real Bigtable/HBase client doing chunked mutations —
    the reference's 5,000-row chunking, ``pyspark/batch_stock.py:105``,
    belongs inside ``writer``). Constant driver memory at any scale."""
    df.foreachPartition(writer)


def compact(spark: SparkSession, live_path: str, historical_path: str,
            schema=None, target_files: int = 1,
            partition_by: list[str] | None = None,
            purge_live: bool = False) -> int:
    """Live→historical compaction job (SURVEY §3.2; reference
    ``pyspark/merge_stock.py:76-93``): read the live zone's micro-files,
    rewrite as ``target_files`` compacted parquet files, optionally purge
    the live zone.

    Unlike the reference (write then delete, non-atomic, and the current
    date computed via a 1-row DataFrame job — ``merge_stock.py:81-84``),
    the engine lists the live files FIRST and deletes exactly that
    manifest, so files landing mid-compaction survive to the next run.
    Returns the number of files compacted.
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    src = jvm.org.apache.hadoop.fs.Path(live_path)
    fs = src.getFileSystem(conf)
    if not fs.exists(src):
        return 0
    manifest = [f.getPath() for f in fs.globStatus(jvm.org.apache.hadoop.fs.Path(live_path + "/*.parquet"))]
    if not manifest:
        return 0
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(*[p.toString() for p in manifest])
    write_parquet(df, historical_path, mode="append",
                  partition_by=partition_by, target_files=target_files)
    if purge_live:
        for p in manifest:
            fs.delete(p, True)
    return len(manifest)


def upsert_parquet(spark: SparkSession, target_path: str, updates: DataFrame,
                   keys: list[str]) -> None:
    """Keyed upsert into a parquet table without a lakehouse format:
    existing rows whose key appears in ``updates`` are replaced, new keys
    appended — implemented as target-anti-join(updates) ∪ updates, written
    to a staging dir and swapped in (parquet can't be read and overwritten
    in one job). At real scale this is what Delta/Iceberg MERGE does with
    transaction logs; this emulation is correct but rewrites the table —
    use a partitioned layout + partition-pruned rewrite for bounded cost.
    """
    import os
    import shutil
    import uuid

    if os.path.exists(target_path):
        target = spark.read.parquet(target_path)
        kept = target.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    staging = f"{target_path}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staging)
    # crash-safe swap: move the old table ASIDE before promoting staging, so
    # an interruption between the two renames leaves a recoverable __old copy
    # (never a window where no table exists at all); delete __old last.
    old = f"{target_path}__old_{uuid.uuid4().hex[:8]}"
    had_target = os.path.exists(target_path)
    if had_target:
        os.replace(target_path, old)
    os.replace(staging, target_path)
    if had_target:
        shutil.rmtree(old)


def upsert_parquet_partitioned(spark: SparkSession, target_path: str,
                               updates: DataFrame, keys: list[str],
                               partition_col: str) -> int:
    """Bounded-cost keyed upsert into a PARTITIONED parquet table: only the
    partitions present in ``updates`` are read, merged (anti-join ∪
    updates) and rewritten — cost scales with the touched partitions, not
    the table, which is what makes MERGE workable at 100 TB (Delta/Iceberg
    do the same with a transaction log instead of directory swaps).

    The merged rows are staged with ``partitionBy`` and each affected
    ``{partition_col}={value}`` directory is promoted with the same
    move-aside swap as ``upsert_parquet`` (old dir recoverable until the
    new one is in place). Untouched partitions are never opened. Returns
    the number of partitions rewritten.
    """
    import os
    import shutil
    import uuid

    if not os.path.exists(target_path):
        write_parquet(updates, target_path, partition_by=[partition_col])
        return updates.select(partition_col).distinct().count()

    parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
    # isin() never matches NULL — without the isNull branch an update row in
    # the NULL partition would silently DROP that partition's existing rows
    cond = F.col(partition_col).isin([p for p in parts if p is not None])
    if any(p is None for p in parts):
        cond = cond | F.col(partition_col).isNull()
    target = spark.read.parquet(target_path).where(cond)  # partition-pruned read
    kept = target.join(updates.select(*keys).distinct(), on=keys, how="left_anti")
    merged = kept.unionByName(updates, allowMissingColumns=True)

    staging = f"{target_path}__staging_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
    try:
        swapped = 0
        for entry in sorted(os.listdir(staging)):
            if not entry.startswith(f"{partition_col}="):
                continue
            src = os.path.join(staging, entry)
            dst = os.path.join(target_path, entry)
            old = f"{dst}__old_{uuid.uuid4().hex[:8]}"
            had = os.path.exists(dst)
            try:
                if had:
                    os.replace(dst, old)
                os.replace(src, dst)
            except BaseException:
                # a failed swap must not leave the partition absent with its
                # data stranded in the __old dir — roll it back before the
                # finally block deletes staging
                if had and os.path.exists(old) and not os.path.exists(dst):
                    os.replace(old, dst)
                raise
            if had:
                shutil.rmtree(old)
            swapped += 1
        return swapped
    finally:
        shutil.rmtree(staging, ignore_errors=True)
