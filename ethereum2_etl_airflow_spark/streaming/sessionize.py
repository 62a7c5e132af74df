"""Custom stateful streaming operator: gap-based sessionization
(``applyInPandasWithState``) — the pattern the reference's cron pipeline
cannot express at all, and the canonical example of a stateful op Spark's
built-in windows don't cover (session windows keyed per user with
arbitrary custom state).

Per user: events within ``gap`` seconds of each other belong to one
session; a session closes when the watermark passes its last event + gap.
Emits one row per closed session: (user_id, session_start, session_end,
n_events, value_millis).

Scale notes: state is one open session per user (bounded by user
cardinality, not history); the watermark bounds how long state lives;
``applyInPandasWithState`` shuffles by user_id once and streams Arrow
batches through Python per group — the supported custom-state escape
hatch (GroupState timeouts drive session closing).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

__all__ = ["sessionize_stream", "sessionize_batch", "SESSION_SCHEMA"]

SESSION_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("session_start", T.TimestampType()),
    T.StructField("session_end", T.TimestampType()),
    T.StructField("n_events", T.LongType()),
    T.StructField("value_millis", T.LongType()),
])

_STATE_SCHEMA = "start timestamp, last timestamp, n long, millis long"


def _session_fn(gap_s: int):
    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n, millis = state.get
            state.remove()
            yield pd.DataFrame([{"user_id": user_id, "session_start": start,
                                 "session_end": last, "n_events": n,
                                 "value_millis": millis}])
            return
        rows = pd.concat(list(pdfs)).sort_values("ts")
        out = []
        if state.exists:
            start, last, n, millis = state.get
        else:
            start = last = None
            n = millis = 0
        for ts, millis_v in zip(rows["ts"], rows["millis"]):
            ts = ts.to_pydatetime()
            if last is not None and (ts - last).total_seconds() > gap_s:
                out.append({"user_id": user_id, "session_start": start,
                            "session_end": last, "n_events": n,
                            "value_millis": millis})
                start, n, millis = ts, 0, 0
            if start is None:
                start = ts
            last = ts
            n += 1
            millis += int(millis_v)
        state.update((start, last, n, millis))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + gap_s * 1000)
        if out:
            yield pd.DataFrame(out)

    return fn


def sessionize_stream(events: DataFrame, gap_s: int = 1800,
                      watermark: str = "2 hours") -> DataFrame:
    """Streaming sessionization over (user_id, ts, value) events."""
    prepared = (events
                .withColumn("millis", F.floor(F.col("value") * 1000).cast("long"))
                .withWatermark("ts", watermark)
                .groupBy("user_id"))
    return prepared.applyInPandasWithState(
        _session_fn(gap_s), outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA, outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout)


def sessionize_batch(events: DataFrame, gap_s: int = 1800) -> DataFrame:
    """Batch reference semantics for the streaming operator: a session
    starts where the gap to the previous event exceeds ``gap_s``; pure
    window functions (lag → cumulative session id → groupBy)."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    marked = (events
              .withColumn("millis", F.floor(F.col("value") * 1000).cast("long"))
              .withColumn("prev_ts", F.lag("ts").over(w))
              .withColumn(
                  "new_session",
                  (F.col("prev_ts").isNull()
                   | (F.unix_timestamp("ts") - F.unix_timestamp("prev_ts")
                      > gap_s)).cast("long")))
    sess = marked.withColumn(
        "session_id", F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    return (sess.groupBy("user_id", "session_id")
            .agg(F.min("ts").alias("session_start"),
                 F.max("ts").alias("session_end"),
                 F.count("*").alias("n_events"),
                 F.sum("millis").alias("value_millis"))
            .drop("session_id"))
