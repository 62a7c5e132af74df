"""Schema system: BigQuery-style JSON schema files → Spark StructType.

The reference declares every table schema as an external JSON file parsed
recursively into BigQuery ``SchemaField`` objects
(`bigquery_utils.py:36-65`; recursion at :55; defaults type=STRING,
mode=NULLABLE at :52-53,60-62).  This module is the Spark analog — the one
piece of "engine" code with no Spark primitive (SURVEY.md §7.3): a
recursive translator from the same JSON dialect to ``StructType``.

Type mapping (SURVEY.md §1.2):

- ``INTEGER``  → LongType        (BQ INTEGER is int64)
- ``FLOAT``    → DoubleType
- ``NUMERIC``  → DecimalType(38, 9)   (BigQuery NUMERIC semantics)
- ``BOOLEAN``  → BooleanType
- ``STRING``   → StringType
- ``TIMESTAMP``→ TimestampType (UTC session)
- ``DATE``     → DateType
- ``BYTES``    → BinaryType
- ``RECORD``   → StructType (recursive)
- mode ``REPEATED`` wraps any of the above in ArrayType

Imposing one of these schemas on ``spark.read.json`` reproduces BigQuery's
load semantics for free: unknown JSON keys are dropped and missing keys
become NULL (`build_load_dag.py:80-83`, ``ignore_unknown_values``).

The three beacon-chain table schemas are defined here as Spark DDL
(authored from the field inventory in SURVEY.md §1.2 / FIXTURES.md §A, not
copied from the reference's JSON files).
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any

from pyspark.sql import types as T

__all__ = [
    "bq_json_to_struct",
    "bq_json_file_to_struct",
    "struct_to_bq_json",
    "beacon_schema",
    "BEACON_TABLES",
]

_SCALAR = {
    "INTEGER": T.LongType(),
    "INT64": T.LongType(),
    "FLOAT": T.DoubleType(),
    "FLOAT64": T.DoubleType(),
    "NUMERIC": T.DecimalType(38, 9),
    "BOOLEAN": T.BooleanType(),
    "BOOL": T.BooleanType(),
    "STRING": T.StringType(),
    "TIMESTAMP": T.TimestampType(),
    "DATE": T.DateType(),
    "BYTES": T.BinaryType(),
}


def _field(spec: dict[str, Any]) -> T.StructField:
    """One field spec → StructField (defaults: STRING / NULLABLE, mirroring
    `bigquery_utils.py:52-53,60-62`)."""
    name = spec["name"]
    btype = str(spec.get("type", "STRING")).upper()
    mode = str(spec.get("mode", "NULLABLE")).upper()
    if btype == "RECORD":
        inner: T.DataType = T.StructType([_field(f) for f in spec.get("fields", [])])
    else:
        try:
            inner = _SCALAR[btype]
        except KeyError:
            raise ValueError(f"unsupported BigQuery type {btype!r} for field {name!r}") from None
    if mode == "REPEATED":
        inner = T.ArrayType(inner, containsNull=True)
    # BQ REQUIRED → non-nullable; reference schemas never use it (SURVEY §1.3)
    return T.StructField(name, inner, nullable=(mode != "REQUIRED"))


def bq_json_to_struct(fields: list[dict[str, Any]]) -> T.StructType:
    """Translate a BigQuery JSON schema (list of field dicts) to StructType.

    Analog of ``read_bigquery_schema_from_json_recursive``
    (`bigquery_utils.py:42-65`), targeting Spark instead of the BQ API.
    """
    return T.StructType([_field(f) for f in fields])


def bq_json_file_to_struct(path: str | Path) -> T.StructType:
    with open(path) as fh:
        return bq_json_to_struct(json.load(fh))


def struct_to_bq_json(st: T.StructType) -> list[dict[str, Any]]:
    """Inverse translation (round-trip support for tests and tooling)."""

    def one(f: T.StructField) -> dict[str, Any]:
        dt, mode = f.dataType, ("NULLABLE" if f.nullable else "REQUIRED")
        if isinstance(dt, T.ArrayType):
            dt, mode = dt.elementType, "REPEATED"
        if isinstance(dt, T.StructType):
            return {"name": f.name, "type": "RECORD", "mode": mode,
                    "fields": [one(x) for x in dt.fields]}
        rev = {
            T.LongType(): "INTEGER", T.DoubleType(): "FLOAT",
            T.DecimalType(38, 9): "NUMERIC", T.BooleanType(): "BOOLEAN",
            T.StringType(): "STRING", T.TimestampType(): "TIMESTAMP",
            T.DateType(): "DATE", T.BinaryType(): "BYTES",
        }
        return {"name": f.name, "type": rev[dt], "mode": mode}

    return [one(f) for f in st.fields]


# --------------------------------------------------------------------------
# Beacon-chain table schemas (Spark DDL; field inventory per SURVEY.md §1.2)
# --------------------------------------------------------------------------

# beacon_blocks: one row per slot, skipped slots present as placeholder rows
# (`beacon_blocks.json:22-26`).  The DOUBLE header_* fields inside
# proposer_slashings replicate the reference's FLOAT-for-hex-string schema
# quirk (`beacon_blocks.json:166-185,196-215`, SURVEY §7.4.3): such values
# are unparseable as floats, so they land as NULL — kept bug-for-bug.
_BEACON_BLOCKS_DDL = """
    block_slot BIGINT, block_epoch BIGINT, block_timestamp TIMESTAMP,
    proposer_index BIGINT, skipped BOOLEAN, block_root STRING,
    parent_root STRING, state_root STRING, randao_reveal STRING,
    graffiti STRING, eth1_block_hash STRING, eth1_deposit_root STRING,
    eth1_deposit_count BIGINT, signature STRING,
    attestations ARRAY<STRUCT<aggregation_bits: STRING, slot: BIGINT,
      index: BIGINT, beacon_block_root: STRING, source_epoch: BIGINT,
      source_root: STRING, target_epoch: BIGINT, target_root: STRING,
      signature: STRING>>,
    deposits ARRAY<STRUCT<pubkey: STRING, withdrawal_credentials: STRING,
      amount: BIGINT, signature: STRING>>,
    proposer_slashings ARRAY<STRUCT<header_1_slot: BIGINT,
      header_1_proposer_index: BIGINT, header_1_parent_root: DOUBLE,
      header_1_state_root: DOUBLE, header_1_body_root: DOUBLE,
      header_1_signature: DOUBLE, header_2_slot: BIGINT,
      header_2_proposer_index: BIGINT, header_2_parent_root: DOUBLE,
      header_2_state_root: DOUBLE, header_2_body_root: DOUBLE,
      header_2_signature: DOUBLE>>,
    attester_slashings ARRAY<STRUCT<
      attestation_1_attesting_indices: ARRAY<BIGINT>,
      attestation_1_slot: BIGINT, attestation_1_index: BIGINT,
      attestation_1_beacon_block_root: STRING,
      attestation_1_source_epoch: BIGINT, attestation_1_source_root: STRING,
      attestation_1_target_epoch: BIGINT, attestation_1_target_root: STRING,
      attestation_1_signature: STRING,
      attestation_2_attesting_indices: ARRAY<BIGINT>,
      attestation_2_slot: BIGINT, attestation_2_index: BIGINT,
      attestation_2_beacon_block_root: STRING,
      attestation_2_source_epoch: BIGINT, attestation_2_source_root: STRING,
      attestation_2_target_epoch: BIGINT, attestation_2_target_root: STRING,
      attestation_2_signature: STRING>>,
    voluntary_exits ARRAY<STRUCT<epoch: BIGINT, validator_index: BIGINT,
      signature: STRING>>
"""

# beacon_validators: snapshot table (`build_load_dag.py:127` only_last_date).
# balance / effective_balance are BigQuery NUMERIC → DECIMAL(38,9)
# (`beacon_validators.json:22-26,32-36`).  The four *_epoch columns stay
# STRING because the "never" sentinel 2^64-1 overflows int64
# (`beacon_validators.json:42-61`, SURVEY §7.4.2) — see
# functions.chaintime.epoch_str_as_decimal for comparisons.
_BEACON_VALIDATORS_DDL = """
    epoch BIGINT, timestamp TIMESTAMP, pubkey STRING, validator_index BIGINT,
    balance DECIMAL(38,9), withdrawal_credentials STRING,
    effective_balance DECIMAL(38,9), slashed BOOLEAN,
    activation_eligibility_epoch STRING, activation_epoch STRING,
    exit_epoch STRING, withdrawable_epoch STRING, status STRING
"""

# beacon_committees (`beacon_committees.json:1-26`): committee is an int array
_BEACON_COMMITTEES_DDL = """
    epoch BIGINT, epoch_timestamp TIMESTAMP, slot BIGINT, index BIGINT,
    committee ARRAY<BIGINT>
"""

_DDL = {
    "beacon_blocks": _BEACON_BLOCKS_DDL,
    "beacon_validators": _BEACON_VALIDATORS_DDL,
    "beacon_committees": _BEACON_COMMITTEES_DDL,
}

#: table → timestamp column used for time partitioning
#: (`build_load_dag.py:126-128`; `build_hourly_load_dag.py:138-149`)
BEACON_TABLES: dict[str, str | None] = {
    "beacon_blocks": "block_timestamp",
    "beacon_committees": "epoch_timestamp",
    "beacon_validators": "timestamp",
}


def beacon_schema(table: str) -> T.StructType:
    """StructType for one of the three beacon tables."""
    return T.StructType.fromDDL(_DDL[table])


def beacon_ddl(table: str) -> str:
    """Raw DDL string for a beacon table — for contexts with no active
    SparkContext (e.g. a Python data source's ``schema()``, which runs
    in a worker where ``fromDDL`` can't reach the JVM parser)."""
    return _DDL[table]
