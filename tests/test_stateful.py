"""Custom stateful streaming operator: sessionization with
applyInPandasWithState (event-time gap timeout)."""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

from pyspark.sql.types import (DoubleType, LongType, StructField, StructType,
                               TimestampType)

from bda_spadochrony_spark.streaming.sources import file_stream
from bda_spadochrony_spark.streaming.stateful import sessionize
from bda_spadochrony_spark.streaming.runner import run_available_now

SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
])


def test_sessionize_closes_on_gap(spark):
    d = tempfile.mkdtemp(prefix="bda_sess_")
    try:
        t0 = datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            # user 1: two sessions separated by a 2h gap
            (1, t0, 1.0),
            (1, t0 + timedelta(minutes=5), 2.0),
            (1, t0 + timedelta(minutes=10), 3.0),
            (1, t0 + timedelta(hours=2, minutes=10), 4.0),
            # user 2: one session
            (2, t0 + timedelta(minutes=1), 10.0),
            (2, t0 + timedelta(minutes=20), 20.0),
            # watermark pusher far in the future (its own open session)
            (99, t0 + timedelta(days=2), 0.0),
        ]
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(d)
        stream = file_stream(spark, d, SCHEMA)
        sessions = sessionize(stream, gap_seconds=1800, watermark="1 minutes")
        out = run_available_now(spark, sessions, timeout_s=180)
        got = {(r["user_id"], r["n_events"], r["sum_value"]) for r in out.collect()}
        # closed sessions: user1 session#1 (3 events, 6.0), user1 session#2
        # (1 event, 4.0 — closed because watermark advanced 2 days), user2
        # (2 events, 30.0). user 99's session stays open (at the watermark).
        assert (1, 3, 6.0) in got
        assert (2, 2, 30.0) in got
        assert (1, 1, 4.0) in got
        assert all(u != 99 for (u, _, _) in got)
    finally:
        shutil.rmtree(d, ignore_errors=True)
