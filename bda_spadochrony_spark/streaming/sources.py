"""Streaming sources (SURVEY §2.1 S8-S9).

The reference reads Pub/Sub Lite subscriptions yielding a binary ``data``
payload + ``publish_timestamp`` (``pyspark/stream_combined.py:46-47``,
``stream_stock.py:43-44``). The engine exposes a source FACTORY so the same
pipeline code runs against a file source (tests, backfill), the rate source
(smoke), or Kafka (production) — the post-source plan is identical, which is
the point of Structured Streaming's unbounded-DataFrame model.

At 100 TB/day the file source's directory listing becomes the bottleneck —
production deployments should front with Kafka (or a manifest-compacted
lake); the factory keeps that swap a one-liner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bda_spadochrony_spark.sources.readers import _nanos_timestamp_cols
from pyspark.sql.types import LongType, StructField


def file_stream(spark: SparkSession, path: str, schema: StructType,
                fmt: str = "parquet", max_files_per_trigger: int | None = None) -> DataFrame:
    """File-based streaming source (the test/backfill stand-in for S8).
    Handles the NANOS-timestamp quirk the same way the batch scan does.
    ``max_files_per_trigger`` bounds micro-batch size for smoke runs."""
    nanos = _nanos_timestamp_cols(path)
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        schema = StructType([
            StructField(f.name, LongType(), f.nullable) if f.name in nanos else f
            for f in schema.fields])
    reader = spark.readStream.schema(schema).format(fmt)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    df = reader.load(path)
    for c in nanos:
        df = df.withColumn(c, F.expr(f"timestamp_micros({c} div 1000)"))
    return df


def rate_stream(spark: SparkSession, rows_per_second: int = 100) -> DataFrame:
    """Rate source — deterministic smoke stream (``timestamp``, ``value``)."""
    return (spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_second).load())


def kafka_stream(spark: SparkSession, bootstrap_servers: str, topic: str) -> DataFrame:
    """Kafka source — the production S8 path (binary ``value`` payload +
    ``timestamp``, mirroring the reference's Pub/Sub Lite shape). Requires
    the spark-sql-kafka package on the cluster; not used in local tests."""
    return (spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", bootstrap_servers)
            .option("subscribe", topic).load()
            .select(F.col("value").alias("data"),
                    F.col("timestamp").alias("publish_timestamp")))
