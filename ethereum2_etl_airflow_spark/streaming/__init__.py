"""Structured Streaming: the always-on analog of the hourly cron DAGs."""

from __future__ import annotations

import contextlib
import threading

from pyspark.sql import SparkSession

__all__ = ["bounded_state"]

#: stateful-operator partition count for bounded check/demo streams
STATE_PARTITIONS = 8

#: reentrancy guard for :func:`bounded_state` — holder count + the conf
#: value saved by the OUTERMOST holder (the session conf is global, so
#: two overlapping stream runs with naive save/restore could race and
#: leave the session permanently pinned)
_pin_lock = threading.Lock()
_pin_depth = 0
_pin_saved: str | None = None


@contextlib.contextmanager
def bounded_state(spark: SparkSession, n: int = STATE_PARTITIONS):
    """Pin ``spark.sql.shuffle.partitions`` — which a streaming query
    captures into its checkpoint at START as the stateful-operator
    partition count — for the duration of a bounded stream run.

    Why: every stateful stage costs one state-store instance per
    partition per micro-batch (open/commit/fsync each), so a
    session-default 2×cores (64 on the test box) pays 64 store
    lifecycles per stage for demo/check streams whose whole input is a
    few thousand rows — measured at sf0.1 this was most of the
    stream-check wall.  A REAL deployment sizes this to the live key
    cardinality and never restarts with a different value (the
    checkpoint pins it); these availableNow check runs use a fresh
    checkpoint every time, so a small fixed count is always valid.

    The conf is session-global: a batch query planned concurrently in
    another thread of the same session would also see the temporary
    value.  That affects only partition counts, never results (every
    operator here is layout-invariant by design).

    Reentrancy: overlapping holders (bench's concurrent pass runs
    several stream checks at once) are reference-counted — only the
    OUTERMOST enter saves the previous value and only the LAST exit
    restores it, so an interleaved exit can never "restore" another
    holder's pinned value into the session permanently.  All holders
    share one pin value per nesting episode: a nested call asking for
    a DIFFERENT ``n`` keeps the outermost pin (partition count is a
    performance knob, never a correctness one, for every operator
    behind this guard).
    """
    global _pin_depth, _pin_saved
    with _pin_lock:
        if _pin_depth == 0:
            _pin_saved = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
        _pin_depth += 1
    try:
        yield
    finally:
        with _pin_lock:
            _pin_depth -= 1
            if _pin_depth == 0 and _pin_saved is not None:
                spark.conf.set("spark.sql.shuffle.partitions", _pin_saved)
                _pin_saved = None
