"""``beacon_api`` — a Spark 4 Python Data Source for the reference's
external-API export step (SURVEY §2.1 S10: ethereum2-etl pulls blocks,
validators and committees from a beacon node's REST API; reference
`/root/reference/dags/ethereum2etl_airflow/build_export_dag.py:104-168`
runs those three exporters as Airflow callbacks *outside* any engine).

Here the exporter IS a source: ``spark.read.format("beacon_api")``
plans one input partition per slot/epoch range, so a 1000-executor
cluster fetches ranges concurrently with no driver fan-out code, and
everything downstream (schema enforcement, partitioned load, verify)
is the same plan as any other scan.  Options:

- ``entity``                     ``blocks`` (default) | ``validators``
  | ``committees`` — the reference's three export streams
  (`build_export_dag.py:104,129,149`); selects the schema, the
  partition granularity (slot ranges for blocks, epoch ranges for the
  other two) and the REST endpoint
- ``start_slot`` / ``end_slot``  (blocks; end exclusive)
- ``slots_per_partition``        (blocks; default 288 — one mainnet
  day ≈ 7200; the default keeps local tests snappy)
- ``start_epoch`` / ``end_epoch``  (validators/committees; end
  exclusive; the hourly snapshot shape is ``end = start + 1``,
  matching the reference's ``start_epoch=end_epoch`` call)
- ``epochs_per_partition``       (validators/committees; default 8)
- ``committees_per_epoch``       offline-stub fan-out (default 4)
- ``n_validators``               offline-stub validator-set size
  (default 64)
- ``genesis`` / ``secs_per_slot``
- ``provider_uris``              comma-separated beacon-node base URIs;
  when set, data is fetched over HTTP — blocks via
  ``GET {uri}/eth/v2/beacon/blocks/{slot}``, committees via
  ``GET {uri}/eth/v1/beacon/states/{slot}/committees?epoch={e}``,
  validators via ``GET {uri}/eth/v1/beacon/states/{slot}/validators``
  (state id = the epoch's start slot) — with the reference's
  provider-fallback semantics (O8, `build_export_dag.py:210-224`: try
  each URI in order, re-raise the last failure).  A blocks 404 becomes
  the ``skipped`` placeholder row the exporter emits for missed
  proposals; a committees/validators 404 (state pruned/unavailable)
  yields no rows for that epoch.
- ``rate_limit``                 requests/second token bucket per task
  (O15, `variables.py:20-21`); 0/absent = unthrottled
- ``timeout_s``                  per-request HTTP timeout (default 10)

Without ``provider_uris`` the fetch is the deterministic offline stub
(:func:`.fixtures.block_row` / ``committee_rows`` / ``validator_row``)
so tests and the verify invariants run hermetically; both paths share
the same partition planning, schema, and executor-side iteration.

Scale notes: partitions are pure metadata (two ints), so a backfill of
10 M slots plans cheaply; per-partition fetch is sequential within a
task, parallel across tasks — exactly the reference exporter's
``export_max_workers`` knob, but expressed as Spark parallelism.  The
rate limit is per TASK (matching the reference's one-client-per-task
model); cluster-wide QPS = rate_limit × concurrent tasks, so size
``slots_per_partition``/scheduling accordingly.  A mainnet validators
response is one large call per epoch (~1 M rows) — that is the API's
own granularity and exactly what the reference exporter pulls; epoch
ranges still parallelize a multi-epoch backfill across tasks.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timezone

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

from .schemas import beacon_ddl

__all__ = ["BeaconApiDataSource", "BeaconApiStreamReader",
           "register_beacon_api"]

SLOTS_PER_EPOCH = 32


@dataclass
class SlotRange(InputPartition):
    start: int
    end: int


@dataclass
class EpochRange(InputPartition):
    start: int
    end: int


def _fetch_block_row(slot: int, genesis: int, secs_per_slot: int) -> dict:
    """The offline seam: deterministic synthetic block (shared with the
    fixtures generator) used when no ``provider_uris`` are configured."""
    from .fixtures import block_row

    return block_row(slot, genesis, secs_per_slot)


def _http_get_json(url: str, timeout_s: float) -> dict:
    import json
    from urllib.request import urlopen

    with urlopen(url, timeout=timeout_s) as resp:
        return json.loads(resp.read().decode("utf-8"))


def _fetch_block_http(uri: str, slot: int, timeout_s: float) -> dict | None:
    """One beacon-node REST GET; ``None`` for a 404 (missed proposal —
    the exporter's ``skipped`` placeholder), raise on anything else so
    the provider fallback / Spark task retry machinery engages."""
    from urllib.error import HTTPError

    try:
        return _http_get_json(
            f"{uri.rstrip('/')}/eth/v2/beacon/blocks/{slot}", timeout_s)
    except HTTPError as ex:
        if ex.code == 404:
            return None
        raise


def _slot_ts(slot: int, genesis: int, secs_per_slot: int) -> datetime:
    return datetime.fromtimestamp(genesis + slot * secs_per_slot,
                                  tz=timezone.utc)


def _skipped_row(slot: int, genesis: int, secs_per_slot: int) -> dict:
    """Missed-proposal placeholder: slot/epoch/timestamp + skipped=true,
    scalars NULL, repeated records empty — the shape the reference's
    exporter stages for a slot with no block."""
    return {"block_slot": slot, "block_epoch": slot // SLOTS_PER_EPOCH,
            "block_timestamp": _slot_ts(slot, genesis, secs_per_slot),
            "skipped": True, "attestations": [], "deposits": [],
            "proposer_slashings": [], "attester_slashings": [],
            "voluntary_exits": []}


def _parse_block_response(payload: dict, slot: int, genesis: int,
                          secs_per_slot: int) -> dict:
    """Map a ``/eth/v2/beacon/blocks/{slot}`` response onto the
    beacon_blocks schema.  API integers arrive as strings (JSON-safe
    uint64) → cast; ``block_timestamp`` is derived from slot math like
    the reference's range services (genesis + slot·12 s); fields the
    endpoint doesn't carry (block_root — a separate headers call in a
    full deployment) stay NULL; the FLOAT-quirk slashing fields stay
    empty per SURVEY §7.4.3."""
    def _i(v):
        return None if v is None else int(v)

    data = payload.get("data") or {}
    msg = data.get("message") or {}
    body = msg.get("body") or {}
    eth1 = body.get("eth1_data") or {}
    atts = []
    for a in body.get("attestations") or []:
        d = a.get("data") or {}
        src, tgt = d.get("source") or {}, d.get("target") or {}
        atts.append({
            "aggregation_bits": a.get("aggregation_bits"),
            "slot": _i(d.get("slot")), "index": _i(d.get("index")),
            "beacon_block_root": d.get("beacon_block_root"),
            "source_epoch": _i(src.get("epoch")),
            "source_root": src.get("root"),
            "target_epoch": _i(tgt.get("epoch")),
            "target_root": tgt.get("root"),
            "signature": a.get("signature")})
    deposits = []
    for dep in body.get("deposits") or []:
        d = dep.get("data") or {}
        deposits.append({
            "pubkey": d.get("pubkey"),
            "withdrawal_credentials": d.get("withdrawal_credentials"),
            "amount": _i(d.get("amount")), "signature": d.get("signature")})
    exits = []
    for ve in body.get("voluntary_exits") or []:
        m = ve.get("message") or {}
        exits.append({"epoch": _i(m.get("epoch")),
                      "validator_index": _i(m.get("validator_index")),
                      "signature": ve.get("signature")})
    return {
        "block_slot": slot,
        "block_epoch": slot // SLOTS_PER_EPOCH,
        "block_timestamp": _slot_ts(slot, genesis, secs_per_slot),
        "proposer_index": _i(msg.get("proposer_index")),
        "skipped": False,
        "block_root": data.get("root"),
        "parent_root": msg.get("parent_root"),
        "state_root": msg.get("state_root"),
        "randao_reveal": body.get("randao_reveal"),
        "graffiti": body.get("graffiti"),
        "eth1_block_hash": eth1.get("block_hash"),
        "eth1_deposit_root": eth1.get("deposit_root"),
        "eth1_deposit_count": _i(eth1.get("deposit_count")),
        "signature": data.get("signature"),
        "attestations": atts, "deposits": deposits,
        "proposer_slashings": [], "attester_slashings": [],
        "voluntary_exits": exits,
    }


def _fetch_state_http(uri: str, path: str, timeout_s: float) -> dict | None:
    """State-scoped GET (committees/validators); ``None`` for a 404
    (state pruned or not yet available — no rows for that epoch),
    raise on anything else so provider fallback / task retry engage."""
    from urllib.error import HTTPError

    try:
        return _http_get_json(f"{uri.rstrip('/')}{path}", timeout_s)
    except HTTPError as ex:
        if ex.code == 404:
            return None
        raise


def _parse_committees_response(payload: dict, epoch: int, genesis: int,
                               secs_per_slot: int) -> list[dict]:
    """Map ``/eth/v1/beacon/states/{slot}/committees?epoch=`` onto the
    beacon_committees schema: one row per committee, validator indices
    (JSON-safe uint64 strings) cast to BIGINT, ``epoch_timestamp``
    derived from the epoch's start slot like the reference's range
    services."""
    ts = _slot_ts(epoch * SLOTS_PER_EPOCH, genesis, secs_per_slot)
    rows = []
    for c in payload.get("data") or []:
        rows.append({
            "epoch": epoch,
            "epoch_timestamp": ts,
            "slot": int(c["slot"]),
            "index": int(c["index"]),
            "committee": [int(v) for v in c.get("validators") or []],
        })
    return rows


def _parse_validators_response(payload: dict, epoch: int, genesis: int,
                               secs_per_slot: int) -> list[dict]:
    """Map ``/eth/v1/beacon/states/{slot}/validators`` onto the
    beacon_validators schema.  Balances arrive as gwei strings →
    DECIMAL(38,9) ETH (the BigQuery NUMERIC convention,
    `beacon_validators.json:22-26`); the four *_epoch fields STAY
    STRINGS because the 2^64-1 "never" sentinel overflows int64
    (SURVEY §7.4.2)."""
    from decimal import Decimal

    ts = _slot_ts(epoch * SLOTS_PER_EPOCH, genesis, secs_per_slot)
    gwei = Decimal(10) ** 9
    rows = []
    for item in payload.get("data") or []:
        v = item.get("validator") or {}
        rows.append({
            "epoch": epoch,
            "timestamp": ts,
            "pubkey": v.get("pubkey"),
            "validator_index": int(item["index"]),
            "balance": (None if item.get("balance") is None
                        else Decimal(item["balance"]) / gwei),
            "withdrawal_credentials": v.get("withdrawal_credentials"),
            "effective_balance": (None if v.get("effective_balance") is None
                                  else Decimal(v["effective_balance"]) / gwei),
            "slashed": v.get("slashed"),
            "activation_eligibility_epoch": v.get("activation_eligibility_epoch"),
            "activation_epoch": v.get("activation_epoch"),
            "exit_epoch": v.get("exit_epoch"),
            "withdrawable_epoch": v.get("withdrawable_epoch"),
            "status": item.get("status"),
        })
    return rows


class BeaconApiReader(DataSourceReader):
    def __init__(self, schema, options):
        self.schema_ = schema
        self.entity = options.get("entity", "blocks")
        if self.entity not in ("blocks", "validators", "committees"):
            raise ValueError(
                f"beacon_api: unknown entity {self.entity!r} — expected "
                "blocks | validators | committees")
        self.start = int(options.get("start_slot", 0))
        self.end = int(options.get("end_slot", 0))
        self.per_part = int(options.get("slots_per_partition", 288))
        self.start_epoch = int(options.get("start_epoch", 0))
        self.end_epoch = int(options.get("end_epoch", 0))
        self.epochs_per_part = int(options.get("epochs_per_partition", 8))
        self.committees_per_epoch = int(options.get("committees_per_epoch", 4))
        self.n_validators = int(options.get("n_validators", 64))
        self.genesis = int(options.get("genesis", 1606824023))
        self.secs = int(options.get("secs_per_slot", 12))
        self.providers = [u.strip()
                          for u in options.get("provider_uris", "").split(",")
                          if u.strip()]
        self.rate = float(options.get("rate_limit", 0) or 0)
        self.timeout_s = float(options.get("timeout_s", 10))
        self.fields = [f.name for f in schema.fields]

    def partitions(self):
        if self.entity == "blocks":
            return [SlotRange(s, min(s + self.per_part, self.end))
                    for s in range(self.start, self.end, self.per_part)]
        return [EpochRange(e, min(e + self.epochs_per_part, self.end_epoch))
                for e in range(self.start_epoch, self.end_epoch,
                               self.epochs_per_part)]

    def _limiter(self):
        from ..dags.build_dags import RateLimiter

        return RateLimiter(self.rate) if self.rate > 0 else None

    def read(self, partition):
        rows = {"blocks": self._read_blocks,
                "committees": self._read_committees,
                "validators": self._read_validators}[self.entity](partition)
        for row in rows:
            yield tuple(row.get(f) for f in self.fields)

    def _read_blocks(self, partition: SlotRange):
        if not self.providers:
            for slot in range(partition.start, partition.end):
                yield _fetch_block_row(slot, self.genesis, self.secs)
            return
        # HTTP path — imported executor-side; RateLimiter/provider_fallback
        # are the same O15/O8 implementations the DAG layer uses
        from ..dags.build_dags import provider_fallback

        limiter = self._limiter()
        for slot in range(partition.start, partition.end):
            if limiter is not None:
                limiter.acquire()
            payload = provider_fallback(
                self.providers,
                lambda uri: _fetch_block_http(uri, slot, self.timeout_s))
            yield (_skipped_row(slot, self.genesis, self.secs)
                   if payload is None
                   else _parse_block_response(payload, slot, self.genesis,
                                              self.secs))

    def _read_committees(self, partition: EpochRange):
        if not self.providers:
            from .fixtures import committee_rows

            for epoch in range(partition.start, partition.end):
                yield from committee_rows(epoch, self.genesis,
                                          self.committees_per_epoch,
                                          self.secs)
            return
        from ..dags.build_dags import provider_fallback

        limiter = self._limiter()
        for epoch in range(partition.start, partition.end):
            if limiter is not None:
                limiter.acquire()
            state = epoch * SLOTS_PER_EPOCH
            payload = provider_fallback(
                self.providers,
                lambda uri: _fetch_state_http(
                    uri, f"/eth/v1/beacon/states/{state}/committees"
                         f"?epoch={epoch}", self.timeout_s))
            if payload is not None:
                yield from _parse_committees_response(
                    payload, epoch, self.genesis, self.secs)

    def _read_validators(self, partition: EpochRange):
        if not self.providers:
            from .fixtures import validator_row

            for epoch in range(partition.start, partition.end):
                for i in range(self.n_validators):
                    yield validator_row(i, epoch, self.genesis, self.secs)
            return
        from ..dags.build_dags import provider_fallback

        limiter = self._limiter()
        for epoch in range(partition.start, partition.end):
            if limiter is not None:
                limiter.acquire()
            state = epoch * SLOTS_PER_EPOCH
            payload = provider_fallback(
                self.providers,
                lambda uri: _fetch_state_http(
                    uri, f"/eth/v1/beacon/states/{state}/validators",
                    self.timeout_s))
            if payload is not None:
                yield from _parse_validators_response(
                    payload, epoch, self.genesis, self.secs)


class BeaconApiStreamReader(SimpleDataSourceStreamReader):
    """Head-following STREAMING tail of the export (S10 as a continuous
    stream): each micro-batch reads the slots that became available since
    the last offset, up to ``max_slots_per_batch``.  Offsets are
    checkpointable dicts ``{"slot": n}``, so a restarted query resumes
    exactly where it stopped — the reference's cron-rerun semantics,
    expressed as Structured Streaming recovery.

    Simple-reader contract: reads happen on the DRIVER (the API built
    for low-rate sources — mainnet produces one block / 12 s; a backfill
    belongs on the batch reader's parallel slot-range partitions, not
    here).  In offline mode the chain head is ``end_slot``; with
    providers the head would come from ``/eth/v1/beacon/headers/head``
    via the same fallback chain.
    """

    def __init__(self, schema, options):
        self.start = int(options.get("start_slot", 0))
        self.end = int(options.get("end_slot", 0))
        self.max_batch = int(options.get("max_slots_per_batch", 64))
        self.genesis = int(options.get("genesis", 1606824023))
        self.secs = int(options.get("secs_per_slot", 12))
        self.providers = [u.strip()
                          for u in options.get("provider_uris", "").split(",")
                          if u.strip()]
        self.timeout_s = float(options.get("timeout_s", 10))
        # field names come from the passed StructType — no SparkContext
        # exists in the Python worker to parse the DDL with
        self.fields = [f.name for f in schema.fields]

    def initialOffset(self):
        return {"slot": self.start}

    def _head_slot(self) -> int:
        if not self.providers:
            return self.end
        from ..dags.build_dags import provider_fallback

        payload = provider_fallback(
            self.providers,
            lambda uri: _http_get_json(
                f"{uri.rstrip('/')}/eth/v1/beacon/headers/head",
                self.timeout_s))
        return int(payload["data"]["header"]["message"]["slot"]) + 1

    def _rows(self, lo: int, hi: int):
        for slot in range(lo, hi):
            if not self.providers:
                row = _fetch_block_row(slot, self.genesis, self.secs)
            else:
                from ..dags.build_dags import provider_fallback

                payload = provider_fallback(
                    self.providers,
                    lambda uri: _fetch_block_http(uri, slot, self.timeout_s))
                row = (_skipped_row(slot, self.genesis, self.secs)
                       if payload is None
                       else _parse_block_response(payload, slot,
                                                  self.genesis, self.secs))
            yield tuple(row.get(f) for f in self.fields)

    def read(self, start):
        lo = start["slot"]
        hi = min(max(self._head_slot(), lo), lo + self.max_batch)
        # materialized list, not a generator: the simple-reader runtime
        # pickles the prefetched batch into its replay cache
        return iter(list(self._rows(lo, hi))), {"slot": hi}

    def readBetweenOffsets(self, start, end):
        return iter(list(self._rows(start["slot"], end["slot"])))


class BeaconApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "beacon_api"

    def schema(self) -> str:
        # DDL string, not StructType: schema() executes in a Python
        # worker where fromDDL has no SparkContext to parse with
        entity = self.options.get("entity", "blocks")
        if entity not in ("blocks", "validators", "committees"):
            raise ValueError(
                f"beacon_api: unknown entity {entity!r} — expected "
                "blocks | validators | committees")
        return beacon_ddl(f"beacon_{entity}")

    def reader(self, schema) -> BeaconApiReader:
        return BeaconApiReader(schema, self.options)

    def simpleStreamReader(self, schema) -> BeaconApiStreamReader:
        entity = self.options.get("entity", "blocks")
        if entity != "blocks":
            # validators/committees are epoch snapshots the reference
            # exports on a cron, not a head-following stream; the batch
            # reader with end_epoch = start_epoch + 1 is that shape
            raise ValueError(
                "beacon_api streaming supports entity=blocks only; "
                f"got {entity!r} — use the batch reader with an epoch "
                "range instead")
        return BeaconApiStreamReader(schema, self.options)


def register_beacon_api(spark) -> None:
    """Idempotent registration: after this,
    ``spark.read.format("beacon_api")`` resolves."""
    spark.dataSource.register(BeaconApiDataSource)
