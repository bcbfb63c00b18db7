"""Fused streaming pipeline — ``stream_combined.py`` parity (SURVEY §3.3).

Two JSON streams → typed parse → feature branch + model inference on one →
watermarked full-outer interval join → serving sink via foreachBatch.
Every stage is the engine's named operator; the whole graph is assembled
here so tests (and production) run the identical plan with different
sources/sinks.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from bda_spadochrony_spark.sources.readers import parse_json_payload
from bda_spadochrony_spark.streaming.ops import stream_interval_join
from bda_spadochrony_spark.ml.features import build_features, assemble_vector


def parse_stream(raw: DataFrame, payload_col: str, schema: StructType,
                 ts_col: str) -> DataFrame:
    """S9: typed from_json parse (one select; the reference's all-string
    schema + per-column cast collapses into this)."""
    return parse_json_payload(raw, payload_col, schema,
                              keep=[c for c in raw.columns if c != payload_col]) \
        .filter(F.col(ts_col).isNotNull())


def fused_stream_join(left: DataFrame, right: DataFrame,
                      left_ts: str, right_ts: str,
                      model=None, feature_cols: list[str] | None = None,
                      categorical: tuple[str, list[str]] | None = None,
                      tolerance_seconds: float = 30.0,
                      watermark: str = "1 minutes",
                      how: str = "fullOuter") -> DataFrame:
    """The fused graph: optional feature/inference branch on ``left``
    (one-hot + calendar + vector + model.transform — T6,
    ``stream_combined.py:75-128``), then the watermarked full-outer
    interval join (J6/T3, ``stream_combined.py:190-198``)."""
    if categorical is not None:
        col, cats = categorical
        left = build_features(left, left_ts, col, cats, prefix=col)
    if model is not None and feature_cols:
        left = assemble_vector(left, feature_cols)
        left = model.transform(left).withColumnRenamed("prediction", "left_prediction") \
                    .drop("features")
    return stream_interval_join(left, right, left_ts, right_ts,
                                tolerance_seconds, how=how,
                                watermark=watermark)


def serving_batch_writer(path: str, key_fn: Callable[[DataFrame], DataFrame] | None = None):
    """foreachBatch callback factory: distributed write of each micro-batch
    to a parquet serving table (replaces the reference's driver-side
    Bigtable loop, ``stream_combined.py:227-247``).

    Writes land under ``batch_id=N`` partition directories with OVERWRITE
    per batch: foreachBatch gives at-least-once delivery (a failed epoch
    is replayed with the SAME batch_id), so a plain append would duplicate
    replayed batches — overwriting the batch's own directory makes the
    sink idempotent (effectively exactly-once). Readers scan ``path``
    normally; ``batch_id`` arrives as a partition column."""
    def write(batch_df: DataFrame, batch_id: int) -> None:
        out = key_fn(batch_df) if key_fn else batch_df
        out.write.mode("overwrite").parquet(f"{path}/batch_id={batch_id}")
    return write
