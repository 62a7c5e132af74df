"""Synthetic beacon-chain fixtures (FIXTURES.md §A).

Deterministic generators for the three beacon tables with the invariants
the verify stage asserts (SURVEY §5): dense 0-based slots (gapless, with
``skipped=true`` placeholder rows), ``block_timestamp = genesis + 12s *
slot``, ``epoch = slot // 32``.  Negative variants seed gaps so the verify
checks must fail.  Also emits the NDJSON staging layout
(``export/{table}/block_date=YYYY-MM-DD/{table}.json``,
`build_export_dag.py:61-64`) including rows with an unknown extra key to
exercise ``ignore_unknown_values`` (`build_load_dag.py:83`).

Used by tests and by the load/verify demo path — NOT by the driver's
oracle checks (those run on the driver's own testdata).
"""

from __future__ import annotations

import json
import os
from datetime import datetime, timezone
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from ..functions.chaintime import (
    FAR_FUTURE_EPOCH, GENESIS_UNIX, SECONDS_PER_SLOT, SLOTS_PER_EPOCH,
)
from .schemas import beacon_schema

__all__ = ["block_row", "committee_rows", "validator_row",
           "gen_beacon_blocks", "gen_beacon_committees",
           "gen_beacon_validators", "write_staging_ndjson"]


def _ts(slot: int, genesis: int, secs_per_slot: int = SECONDS_PER_SLOT) -> datetime:
    """Timestamp for a slot.  ``secs_per_slot`` lets tests compress the
    day boundary (mainnet is 12 s; the verify invariants are agnostic)."""
    return datetime.fromtimestamp(genesis + slot * secs_per_slot, tz=timezone.utc)


def _hex(prefix: str, i: int) -> str:
    return "0x" + f"{prefix}{i:x}".ljust(64, "0")[:64]


def block_row(s: int, genesis: int = GENESIS_UNIX,
              secs_per_slot: int = SECONDS_PER_SLOT) -> dict:
    """One deterministic beacon_blocks row for slot ``s`` (every 7th slot
    a ``skipped`` placeholder) — shared by the fixture generator and the
    ``beacon_api`` Python data source's stubbed fetch."""
    skipped = (s % 7 == 3)
    return {
            "block_slot": s,
            "block_epoch": s // SLOTS_PER_EPOCH,
            "block_timestamp": _ts(s, genesis, secs_per_slot),
            "proposer_index": None if skipped else (s * 37) % 1024,
            "skipped": skipped,
            "block_root": _hex("ab", s),
            "parent_root": _hex("ab", s - 1) if s else None,
            "state_root": None if skipped else _hex("57", s),
            "randao_reveal": None if skipped else _hex("9a", s),
            "graffiti": None if skipped else f"graffiti-{s}",
            "eth1_block_hash": _hex("e1", s // 32),
            "eth1_deposit_root": _hex("dd", s // 64),
            "eth1_deposit_count": s // 16,
            "signature": None if skipped else _hex("51", s),
            "attestations": [] if skipped else [{
                "aggregation_bits": "0xff", "slot": s - 1 if s else 0,
                "index": a, "beacon_block_root": _hex("ab", s - 1 if s else 0),
                "source_epoch": max(s // SLOTS_PER_EPOCH - 1, 0),
                "source_root": _hex("50", s), "target_epoch": s // SLOTS_PER_EPOCH,
                "target_root": _hex("7a", s), "signature": _hex("a5", s),
            } for a in range(2)],
            "deposits": [{"pubkey": _hex("de", s), "withdrawal_credentials": _hex("00", s),
                          "amount": 32_000_000_000, "signature": _hex("d5", s)}]
            if s % 11 == 5 else [],
            # FLOAT-hex-string quirk fields always NULL (SURVEY §7.4.3)
            "proposer_slashings": [],
            "attester_slashings": [],
            "voluntary_exits": [{"epoch": s // SLOTS_PER_EPOCH,
                                 "validator_index": (s * 13) % 1024,
                                 "signature": _hex("e0", s)}]
            if s % 29 == 17 else [],
        }


def gen_beacon_blocks(spark: SparkSession, n_slots: int,
                      genesis: int = GENESIS_UNIX,
                      gap_slots: set[int] | None = None,
                      secs_per_slot: int = SECONDS_PER_SLOT) -> DataFrame:
    """Gapless (or deliberately gapped) blocks table; every 7th slot is a
    ``skipped`` placeholder row, mirroring missed-proposal slots."""
    gap_slots = gap_slots or set()
    rows = [block_row(s, genesis, secs_per_slot)
            for s in range(n_slots) if s not in gap_slots]
    return spark.createDataFrame(rows, schema=beacon_schema("beacon_blocks"))


def committee_rows(epoch: int, genesis: int = GENESIS_UNIX,
                   committees_per_epoch: int = 4,
                   secs_per_slot: int = SECONDS_PER_SLOT) -> list[dict]:
    """One epoch's worth of committee rows — shared by the fixture
    generator and the ``beacon_api`` source's offline seam."""
    rows = []
    for slot in range(epoch * SLOTS_PER_EPOCH,
                      epoch * SLOTS_PER_EPOCH + committees_per_epoch):
        rows.append({
            "epoch": epoch,
            "epoch_timestamp": _ts(epoch * SLOTS_PER_EPOCH, genesis,
                                   secs_per_slot),
            "slot": slot,
            "index": slot % committees_per_epoch,
            "committee": [(slot * 31 + k) % 2048 for k in range(8)],
        })
    return rows


def gen_beacon_committees(spark: SparkSession, n_epochs: int,
                          genesis: int = GENESIS_UNIX,
                          committees_per_epoch: int = 4,
                          gap_epochs: set[int] | None = None,
                          secs_per_slot: int = SECONDS_PER_SLOT) -> DataFrame:
    gap_epochs = gap_epochs or set()
    rows = []
    for e in range(n_epochs):
        if e in gap_epochs:
            continue
        rows.extend(committee_rows(e, genesis, committees_per_epoch,
                                   secs_per_slot))
    return spark.createDataFrame(rows, schema=beacon_schema("beacon_committees"))


def validator_row(i: int, epoch: int, genesis: int = GENESIS_UNIX,
                  secs_per_slot: int = SECONDS_PER_SLOT) -> dict:
    """One validator-snapshot row — shared by the fixture generator and
    the ``beacon_api`` source's offline seam."""
    ts = _ts(epoch * SLOTS_PER_EPOCH, genesis, secs_per_slot)
    statuses = ["active_ongoing", "active_exiting", "pending_queued",
                "exited_unslashed", "withdrawal_possible"]
    exiting = i % 5 == 1
    return {
        "epoch": epoch,
        "timestamp": ts,
        "pubkey": _hex("b0", i),
        "validator_index": i,
        "balance": Decimal(32_000_000_000 + (i * 1_000_003) % 2_000_000_000)
        / Decimal(10**9),
        "withdrawal_credentials": _hex("01", i),
        "effective_balance": Decimal(32),
        "slashed": i % 97 == 13,
        "activation_eligibility_epoch": str(i % 3),
        "activation_epoch": str(i % 5),
        "exit_epoch": str(epoch + 10 + i % 7) if exiting else str(FAR_FUTURE_EPOCH),
        "withdrawable_epoch": str(epoch + 266) if exiting else str(FAR_FUTURE_EPOCH),
        "status": statuses[i % len(statuses)],
    }


def gen_beacon_validators(spark: SparkSession, n_validators: int, epoch: int,
                          genesis: int = GENESIS_UNIX,
                          secs_per_slot: int = SECONDS_PER_SLOT) -> DataFrame:
    """Validator-set snapshot at ``epoch`` — the hourly point-in-time shape
    (`build_hourly_export_dag.py:126-145`, start_epoch=end_epoch).  A mix
    of sentinel (2^64-1 "never") and concrete exit epochs per FIXTURES §A.
    """
    rows = [validator_row(i, epoch, genesis, secs_per_slot)
            for i in range(n_validators)]
    return spark.createDataFrame(rows, schema=beacon_schema("beacon_validators"))


def write_staging_ndjson(df: DataFrame, root: str, table: str, ts_col: str,
                         unknown_key_every: int = 50) -> list[str]:
    """Write a DataFrame as the reference's staged NDJSON layout, driver-side
    (fixtures are small); injects an ``_extra`` unknown key on every Nth row.
    Returns the partition directories written."""
    rows = [r.asDict(recursive=True) for r in df.collect()]
    by_date: dict[str, list[dict]] = {}
    for i, r in enumerate(rows):
        d = r[ts_col].strftime("%Y-%m-%d")
        if unknown_key_every and i % unknown_key_every == 7:
            r["_extra"] = 1
        by_date.setdefault(d, []).append(r)

    def default(o):
        if isinstance(o, datetime):
            return o.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(o, Decimal):
            return str(o)
        raise TypeError(type(o))

    out = []
    for d, rs in by_date.items():
        pdir = os.path.join(root, "export", table, f"block_date={d}")
        os.makedirs(pdir, exist_ok=True)
        with open(os.path.join(pdir, f"{table}.json"), "w") as fh:
            for r in rs:
                fh.write(json.dumps(r, default=default) + "\n")
        out.append(pdir)
    return out
