"""``beacon_api`` — a Spark 4 Python Data Source for the reference's
external-API export step (SURVEY §2.1 S10: ethereum2-etl pulls blocks
from a beacon node's REST API; reference
`/root/reference/dags/ethereum2etl_airflow/build_export_dag.py` runs
that exporter as an Airflow callback *outside* any engine).

Here the exporter IS a source: ``spark.read.format("beacon_api")``
plans one input partition per slot range, so a 1000-executor cluster
fetches ranges concurrently with no driver fan-out code, and everything
downstream (schema enforcement, partitioned load, verify) is the same
plan as any other scan.  Options:

- ``start_slot`` / ``end_slot``  (end exclusive)
- ``slots_per_partition``        (default 288 — one mainnet day ≈ 7200;
  the default keeps local tests snappy)
- ``genesis`` / ``secs_per_slot``

The HTTP call is STUBBED: ``_fetch_block_row`` returns the
deterministic synthetic block the fixtures generator defines
(:func:`.fixtures.block_row`) — a real deployment replaces that one
function with the beacon-node GET (+ retry/rate-limit from
``config.export_rate_limit``); partition planning, schema, and
executor-side iteration are real and tested.

Scale notes: partitions are pure metadata (two ints), so a backfill of
10 M slots plans cheaply; per-partition fetch is sequential within a
task, parallel across tasks — exactly the reference exporter's
``export_max_workers`` knob, but expressed as Spark parallelism.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

from .schemas import beacon_ddl

__all__ = ["BeaconApiDataSource", "register_beacon_api"]


@dataclass
class SlotRange(InputPartition):
    start: int
    end: int


def _fetch_block_row(slot: int, genesis: int, secs_per_slot: int) -> dict:
    """THE seam: swap this body for the real beacon-node REST GET
    (``/eth/v2/beacon/blocks/{slot}``) in a deployment.  Deterministic
    stub so tests and the verify invariants run hermetically."""
    from .fixtures import block_row

    return block_row(slot, genesis, secs_per_slot)


class BeaconApiReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_ = schema
        self.start = int(options.get("start_slot", 0))
        self.end = int(options.get("end_slot", 0))
        self.per_part = int(options.get("slots_per_partition", 288))
        self.genesis = int(options.get("genesis", 1606824023))
        self.secs = int(options.get("secs_per_slot", 12))
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        return [SlotRange(s, min(s + self.per_part, self.end))
                for s in range(self.start, self.end, self.per_part)]

    def read(self, partition: SlotRange):
        for slot in range(partition.start, partition.end):
            row = _fetch_block_row(slot, self.genesis, self.secs)
            yield tuple(row[f] for f in self.fields)


class BeaconApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "beacon_api"

    def schema(self) -> str:
        # DDL string, not StructType: schema() executes in a Python
        # worker where fromDDL has no SparkContext to parse with
        return beacon_ddl("beacon_blocks")

    def reader(self, schema) -> BeaconApiReader:
        return BeaconApiReader(schema, self.options)


def register_beacon_api(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("beacon_api")`` resolves."""
    spark.dataSource.register(BeaconApiDataSource)
