"""Beacon-chain time arithmetic (SURVEY.md §2.5 T1-T4).

The beacon clock is linear: one slot every 12 seconds from genesis, 32
slots per epoch.  The reference delegates date→slot/epoch mapping to the
``ethereum2etl`` CLI services (`build_export_dag.py:76-102` imports at
:12-13; hourly `build_hourly_export_dag.py:235-254`), but the call surface
fixes the semantics, which are pure integer math — so here they are plain
column expressions (JVM-side, whole-stage codegen, no UDF) plus Python
helpers for driver-side range resolution.

Mainnet genesis: 2020-12-01 12:00:23 UTC = 1606824023 epoch-seconds.

Also: comparison helper for the reference's uint64 sentinel epoch strings
(`beacon_validators.json:42-61`): 2^64-1 means "never", overflowing int64,
so those columns are STRING and compared as DECIMAL(20,0) (SURVEY §7.4.2).
"""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from pyspark.sql import Column, functions as F

__all__ = [
    "GENESIS_UNIX", "SECONDS_PER_SLOT", "SLOTS_PER_EPOCH", "FAR_FUTURE_EPOCH",
    "slot_for_timestamp", "epoch_for_slot", "epoch_for_timestamp",
    "timestamp_for_slot", "block_range_for_date", "epoch_range_for_date",
    "block_range_for_hour", "epoch_range_for_hour", "hour_window",
    "epoch_str_as_decimal",
]

GENESIS_UNIX = 1606824023  # mainnet beacon genesis, UTC epoch-seconds
SECONDS_PER_SLOT = 12
SLOTS_PER_EPOCH = 32
FAR_FUTURE_EPOCH = 2**64 - 1  # "never" sentinel (uint64 max)


# ---- column expressions (used inside queries; codegen-friendly) ----------

def slot_for_timestamp(ts: Column, genesis_unix: int = GENESIS_UNIX) -> Column:
    """timestamp column → slot number (floor of elapsed/12s).

    FLOOR, not cast-truncation: pre-genesis timestamps have negative
    elapsed time and must map to the preceding slot (-0.5 → -1, not 0),
    matching the driver-side ``_slot_at`` helper and the oracle SQL."""
    return F.floor((F.unix_timestamp(ts) - F.lit(genesis_unix))
                   / SECONDS_PER_SLOT).cast("long")


def epoch_for_slot(slot: Column) -> Column:
    """slot → epoch (32 slots per epoch); FLOOR so negative slots map to
    the preceding epoch (same rationale as :func:`slot_for_timestamp`)."""
    return F.floor(slot / SLOTS_PER_EPOCH).cast("long")


def epoch_for_timestamp(ts: Column, genesis_unix: int = GENESIS_UNIX) -> Column:
    return epoch_for_slot(slot_for_timestamp(ts, genesis_unix))


def timestamp_for_slot(slot: Column, genesis_unix: int = GENESIS_UNIX) -> Column:
    return F.timestamp_seconds(F.lit(genesis_unix) + slot * SECONDS_PER_SLOT)


def epoch_str_as_decimal(col: Column) -> Column:
    """uint64-sentinel epoch string → DECIMAL(20,0) for safe comparisons
    (never LongType: 18446744073709551615 overflows int64)."""
    return col.cast("decimal(20,0)")


# ---- python-side range services (driver-side, analog of the CLI calls) ---

def _slot_at(dt: datetime, genesis_unix: int) -> int:
    """Last slot whose start time is <= dt (floor)."""
    return int((dt.timestamp() - genesis_unix) // SECONDS_PER_SLOT)


def _slot_from(dt: datetime, genesis_unix: int) -> int:
    """First slot whose start time is >= dt (ceil)."""
    import math

    return math.ceil((dt.timestamp() - genesis_unix) / SECONDS_PER_SLOT)


def block_range_for_date(date: datetime, genesis_unix: int = GENESIS_UNIX) -> tuple[int, int]:
    """T1 (`build_export_dag.py:76-88`): calendar date → inclusive range of
    slots whose timestamps fall within the date (genesis is not midnight-
    aligned, so start is the first slot at/after 00:00, end the last slot
    at/before 23:59:59.999999)."""
    d0 = datetime(date.year, date.month, date.day, tzinfo=timezone.utc)
    d1 = d0 + timedelta(days=1)
    start = max(_slot_from(d0, genesis_unix), 0)
    end = _slot_at(d1 - timedelta(microseconds=1), genesis_unix)
    return start, end


def epoch_range_for_date(date: datetime, genesis_unix: int = GENESIS_UNIX) -> tuple[int, int]:
    """T2 (`build_export_dag.py:90-102`): date → inclusive epoch range."""
    s0, s1 = block_range_for_date(date, genesis_unix)
    return s0 // SLOTS_PER_EPOCH, s1 // SLOTS_PER_EPOCH


def hour_window(dt: datetime) -> tuple[datetime, datetime]:
    """F6 (`build_hourly_export_dag.py:241-243,252-254`): the reference's
    ``[HH:00:00, HH:59:59.999999]`` UTC hour window."""
    start = dt.replace(minute=0, second=0, microsecond=0, tzinfo=timezone.utc)
    return start, start + timedelta(hours=1) - timedelta(microseconds=1)


def block_range_for_hour(dt: datetime, genesis_unix: int = GENESIS_UNIX) -> tuple[int, int]:
    """T3 (`build_hourly_export_dag.py:235-243`): hour window → slot range."""
    lo, hi = hour_window(dt)
    return max(_slot_from(lo, genesis_unix), 0), _slot_at(hi, genesis_unix)


def epoch_range_for_hour(dt: datetime, genesis_unix: int = GENESIS_UNIX) -> tuple[int, int]:
    """T4 (`build_hourly_export_dag.py:246-254`)."""
    s0, s1 = block_range_for_hour(dt, genesis_unix)
    return s0 // SLOTS_PER_EPOCH, s1 // SLOTS_PER_EPOCH
