"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2.7 absent-ops row — the reference has no custom state; the engine
adds the canonical one a training-data/clickstream pipeline needs).

``sessionize``: per-key event sessions closed by an inactivity gap. This is
genuinely inexpressible as built-in DataFrame ops when you need one output
row per *closed* session with arbitrary per-session aggregates emitted
incrementally — the GroupState timeout machinery is the point.

Scale notes: state is one small tuple per active key; the state store is
partitioned by the grouping key, so key cardinality distributes. Timeouts
are event-time based (watermark-driven), so late data within the watermark
still extends the right session.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType, TimestampType)

SESSION_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("session_start", TimestampType()),
    StructField("session_end", TimestampType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])

_STATE_SCHEMA = StructType([
    StructField("start_ts", LongType()),    # epoch micros
    StructField("last_ts", LongType()),
    StructField("n_events", LongType()),
    StructField("sum_value", DoubleType()),
])


def sessionize(events: DataFrame, ts_col: str = "ts", key_col: str = "user_id",
               value_col: str = "value", gap_seconds: int = 1800,
               watermark: str = "10 minutes") -> DataFrame:
    """Event sessions per key: a session closes once ``gap_seconds`` pass
    with no event (event-time, watermark-driven). Emits one row per CLOSED
    session; the open session stays in the state store.

    Batches arrive per key via Arrow; state is (start, last, count, sum).

    Boundary convention matches the built-in ``F.session_window`` twin
    (``operators.windows.session_window_agg``): session windows are
    end-exclusive, so an event arriving EXACTLY ``gap_seconds`` after the
    previous one starts a NEW session (merge only while t − last < gap).
    """
    gap_us = gap_seconds * 1_000_000

    def fn(key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterable[pd.DataFrame]:
        closed: list[tuple] = []
        if state.hasTimedOut:
            if state.exists:
                start, last, n, s = state.get
                closed.append((key[0], start, last, n, s))
                state.remove()
        else:
            # concat ONLY the needed, concretely-typed columns and drop
            # empty chunks first: pandas deprecates concatenation with
            # empty or all-NA entries (object-dtype all-NULL columns like
            # props would trip a FutureWarning per chunk), and
            # pd.concat([]) on an all-empty invocation would raise.
            # NOTE: pyspark's applyInPandasWithState serializer performs
            # its own batch concat upstream of this function
            # (serializers.py), which still emits the deprecation warning
            # on empty groups — harmless, upstream, and outside our code.
            chunks = [p[[ts_col, value_col]] for p in pdfs if len(p)]
            if not chunks:
                return iter([])
            rows = pd.concat(chunks).sort_values(ts_col)
            ts_us = (rows[ts_col].astype("int64") // 1000).to_numpy()
            vals = rows[value_col].to_numpy()
            if state.exists:
                start, last, n, s = state.get
            else:
                start, last, n, s = None, None, 0, 0.0
            for t, v in zip(ts_us, vals):
                # >= : end-exclusive, aligned with F.session_window
                if last is not None and t - last >= gap_us:
                    closed.append((key[0], start, last, n, s))
                    start, last, n, s = None, None, 0, 0.0
                if start is None:
                    start, last, n, s = t, t, 1, float(v)
                else:
                    last, n, s = max(last, t), n + 1, s + float(v)
            state.update((int(start), int(last), int(n), float(s)))
            # close the session once the event-time watermark passes last+gap
            # (plain int — numpy scalars break the JSON state serializer)
            state.setTimeoutTimestamp(int(last + gap_us) // 1000)
        if not closed:
            return iter([])
        out = pd.DataFrame(closed, columns=["user_id", "s", "e", "n_events", "sum_value"])
        out["session_start"] = pd.to_datetime(out.pop("s"), unit="us")
        out["session_end"] = pd.to_datetime(out.pop("e"), unit="us")
        return iter([out[["user_id", "session_start", "session_end",
                          "n_events", "sum_value"]]])

    return (events.withWatermark(ts_col, watermark)
            .groupBy(key_col)
            .applyInPandasWithState(
                fn, outputStructType=SESSION_SCHEMA,
                stateStructType=_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
