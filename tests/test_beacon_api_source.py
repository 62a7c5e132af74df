"""The beacon_api Python data source (S10 in-engine): partition
planning, row parity with the fixture generator, and the verify chain
running over sourced data."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.sources.beacon_api import register_beacon_api
from ethereum2_etl_airflow_spark.sources.fixtures import gen_beacon_blocks

GENESIS = 1704067200
SECS = 300  # 288 slots/day, fast


def _source(spark, start, end, per_part=64):
    register_beacon_api(spark)
    return (spark.read.format("beacon_api")
            .option("start_slot", start).option("end_slot", end)
            .option("slots_per_partition", per_part)
            .option("genesis", GENESIS).option("secs_per_slot", SECS)
            .load())


def test_source_matches_fixture_generator(spark):
    src = _source(spark, 0, 288)
    gen = gen_beacon_blocks(spark, 288, genesis=GENESIS, secs_per_slot=SECS)
    assert src.schema == gen.schema
    a = src.orderBy("block_slot").collect()
    b = gen.orderBy("block_slot").collect()
    assert a == b


def test_source_partition_planning(spark):
    src = _source(spark, 100, 420, per_part=64)
    assert src.rdd.getNumPartitions() == 5   # ceil(320/64)
    slots = [r["block_slot"] for r in src.select("block_slot").collect()]
    assert sorted(slots) == list(range(100, 420))


def test_verify_chain_over_sourced_day(spark):
    """The flagship S10 path: API source → temp views → verify
    invariants (gapless slots, timestamp math) all green on day one."""
    from ethereum2_etl_airflow_spark.operators.verify import run_check
    from ethereum2_etl_airflow_spark.sources.fixtures import (
        gen_beacon_committees, gen_beacon_validators)

    blocks = _source(spark, 0, 288)
    from ethereum2_etl_airflow_spark.operators.load import derive_block_date

    derive_block_date(blocks, "block_timestamp") \
        .createOrReplaceTempView("beacon_blocks")
    derive_block_date(
        gen_beacon_committees(spark, 9, genesis=GENESIS, secs_per_slot=SECS),
        "epoch_timestamp").createOrReplaceTempView("beacon_committees")
    derive_block_date(
        gen_beacon_validators(spark, 32, epoch=0, genesis=GENESIS,
                              secs_per_slot=SECS),
        "timestamp").createOrReplaceTempView("beacon_validators")
    ds = blocks.select(
        F.date_format(F.min("block_timestamp"), "yyyy-MM-dd")).collect()[0][0]
    run_check(spark, "blocks_count", ds)
    run_check(spark, "blocks_have_latest", ds)


def test_full_pipeline_source_to_latest(spark, tmp_path):
    """Capstone: beacon_api source → NDJSON staging → schema-enforced
    load → partitioned table → verify → meta sidecar → latest snapshot.
    Every reference stage, one chain, hermetic."""
    from ethereum2_etl_airflow_spark.operators.load import (
        compute_meta, derive_block_date,
        read_latest_snapshot, write_latest_snapshot, write_partitioned)
    from ethereum2_etl_airflow_spark.operators.verify import run_check
    from ethereum2_etl_airflow_spark.sources.ndjson import (
        read_ndjson, stage_export)
    from ethereum2_etl_airflow_spark.sources.schemas import beacon_schema

    root = str(tmp_path)
    # 1. export one day of blocks from the API source
    blocks = _source(spark, 0, 288)
    # 2. stage as date-partitioned NDJSON (the reference's GCS layout)
    base = stage_export(blocks, root, "beacon_blocks", "block_timestamp")
    # 3. load with imposed schema → partitioned parquet table
    staged = read_ndjson(spark, f"{base}/*/*.json",
                         beacon_schema("beacon_blocks"))
    table_dir = f"{root}/tables/beacon_blocks"
    loaded = derive_block_date(staged, "block_timestamp")
    write_partitioned(loaded, table_dir)
    table = spark.read.parquet(table_dir)
    assert table.count() == 288
    # 4. verify invariants over the loaded table
    table.createOrReplaceTempView("beacon_blocks")
    run_check(spark, "blocks_count", "2024-01-01")
    run_check(spark, "blocks_have_latest", "2024-01-01")
    # 5. meta sidecar
    meta = compute_meta(table, "block_slot").collect()
    assert len(meta) == 1 and (meta[0]["start_block"],
                               meta[0]["end_block"]) == (0, 287)
    # 6. latest snapshot with atomic pointer
    write_latest_snapshot(table.where(~F.col("skipped")), f"{root}/latest")
    back = read_latest_snapshot(spark, f"{root}/latest")
    assert back.count() == table.where(~F.col("skipped")).count()


# --- HTTP fetch path (fake beacon node) -----------------------------------

import http.server
import json
import re
import threading

from ethereum2_etl_airflow_spark.sources.beacon_api import (
    _parse_block_response)
from ethereum2_etl_airflow_spark.sources.fixtures import block_row


def _s(v):
    return None if v is None else str(v)


def _api_payload(slot: int) -> dict:
    """Beacon-node-shaped /eth/v2/beacon/blocks response whose parse
    round-trips to the fixture generator's row for ``slot``."""
    row = block_row(slot, GENESIS, SECS)
    return {"data": {
        "root": row["block_root"],
        "signature": row["signature"],
        "message": {
            "slot": str(slot),
            "proposer_index": _s(row["proposer_index"]),
            "parent_root": row["parent_root"],
            "state_root": row["state_root"],
            "body": {
                "randao_reveal": row["randao_reveal"],
                "graffiti": row["graffiti"],
                "eth1_data": {
                    "deposit_root": row["eth1_deposit_root"],
                    "deposit_count": str(row["eth1_deposit_count"]),
                    "block_hash": row["eth1_block_hash"]},
                "attestations": [{
                    "aggregation_bits": a["aggregation_bits"],
                    "signature": a["signature"],
                    "data": {
                        "slot": str(a["slot"]), "index": str(a["index"]),
                        "beacon_block_root": a["beacon_block_root"],
                        "source": {"epoch": str(a["source_epoch"]),
                                   "root": a["source_root"]},
                        "target": {"epoch": str(a["target_epoch"]),
                                   "root": a["target_root"]}}}
                    for a in row["attestations"]],
                "deposits": [{
                    "data": {"pubkey": d["pubkey"],
                             "withdrawal_credentials":
                                 d["withdrawal_credentials"],
                             "amount": str(d["amount"]),
                             "signature": d["signature"]}}
                    for d in row["deposits"]],
                "voluntary_exits": [{
                    "signature": v["signature"],
                    "message": {"epoch": str(v["epoch"]),
                                "validator_index":
                                    str(v["validator_index"])}}
                    for v in row["voluntary_exits"]],
            }}}}


def _committees_payload(epoch: int) -> dict:
    """Beacon-node-shaped /committees response whose parse round-trips
    to committee_rows(epoch)."""
    from ethereum2_etl_airflow_spark.sources.fixtures import committee_rows

    return {"data": [{"index": str(r["index"]), "slot": str(r["slot"]),
                      "validators": [str(v) for v in r["committee"]]}
                     for r in committee_rows(epoch, GENESIS, 4, SECS)]}


def _validators_payload(epoch: int, n: int) -> dict:
    """Beacon-node-shaped /validators response whose parse round-trips
    to validator_row(i, epoch): ETH decimals back to gwei strings."""
    from ethereum2_etl_airflow_spark.sources.fixtures import validator_row

    items = []
    for i in range(n):
        r = validator_row(i, epoch, GENESIS, SECS)
        items.append({
            "index": str(r["validator_index"]),
            "balance": str(int(r["balance"] * 10**9)),
            "status": r["status"],
            "validator": {
                "pubkey": r["pubkey"],
                "withdrawal_credentials": r["withdrawal_credentials"],
                "effective_balance": str(int(r["effective_balance"] * 10**9)),
                "slashed": r["slashed"],
                "activation_eligibility_epoch":
                    r["activation_eligibility_epoch"],
                "activation_epoch": r["activation_epoch"],
                "exit_epoch": r["exit_epoch"],
                "withdrawable_epoch": r["withdrawable_epoch"]}})
    return {"data": items}


def _make_handler(fail_all: bool = False):
    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *args):  # keep pytest output clean
            pass

        def _json(self, obj):
            body = json.dumps(obj).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if fail_all:
                self.send_response(500)
                self.end_headers()
                return
            m = re.match(r"^/eth/v2/beacon/blocks/(\d+)$", self.path)
            if m:
                slot = int(m.group(1))
                if slot % 7 == 3:  # missed proposal → 404 → skipped row
                    self.send_response(404)
                    self.end_headers()
                    return
                self._json(_api_payload(slot))
                return
            m = re.match(
                r"^/eth/v1/beacon/states/(\d+)/committees\?epoch=(\d+)$",
                self.path)
            if m:
                epoch = int(m.group(2))
                if epoch >= 100:  # pruned state → 404 → no rows
                    self.send_response(404)
                    self.end_headers()
                    return
                self._json(_committees_payload(epoch))
                return
            m = re.match(r"^/eth/v1/beacon/states/(\d+)/validators$",
                         self.path)
            if m:
                epoch = int(m.group(1)) // 32
                self._json(_validators_payload(epoch, 24))
                return
            self.send_response(400)
            self.end_headers()
    return Handler


class _FakeNode:
    def __init__(self, fail_all: bool = False):
        self.srv = http.server.ThreadingHTTPServer(
            ("127.0.0.1", 0), _make_handler(fail_all))
        self.uri = f"http://127.0.0.1:{self.srv.server_address[1]}"
        self.thread = threading.Thread(target=self.srv.serve_forever,
                                       daemon=True)
        self.thread.start()

    def close(self):
        self.srv.shutdown()
        self.srv.server_close()


def _http_source(spark, uris: str, start=0, end=56, **opts):
    register_beacon_api(spark)
    r = (spark.read.format("beacon_api")
         .option("start_slot", start).option("end_slot", end)
         .option("slots_per_partition", 28)
         .option("genesis", GENESIS).option("secs_per_slot", SECS)
         .option("provider_uris", uris))
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_parse_round_trips_fixture_row():
    # slots cover deposits (s%11==5) + voluntary exits (s%29==17)
    # branches; none are skipped slots (s%7==3), which have no payload
    for slot in (0, 1, 5, 46, 75):
        assert _parse_block_response(_api_payload(slot), slot,
                                     GENESIS, SECS) \
            == block_row(slot, GENESIS, SECS)


def test_http_source_fetches_and_maps(spark):
    node = _FakeNode()
    try:
        got = {r["block_slot"]: r
               for r in _http_source(spark, node.uri).collect()}
        want = {r["block_slot"]: r
                for r in _source(spark, 0, 56).collect()}
        assert sorted(got) == list(range(56))
        for s in range(56):
            if s % 7 == 3:
                assert got[s]["skipped"] is True
                assert got[s]["proposer_index"] is None
                assert got[s]["attestations"] == []
                assert got[s]["block_timestamp"] \
                    == want[s]["block_timestamp"]
            else:
                assert got[s] == want[s]
    finally:
        node.close()


def test_http_provider_fallback_o8(spark):
    bad, good = _FakeNode(fail_all=True), _FakeNode()
    try:
        rows = _http_source(spark, f"{bad.uri},{good.uri}",
                            end=14).collect()
        assert len(rows) == 14
    finally:
        bad.close()
        good.close()


def test_http_rate_limit_o15_smoke(spark):
    node = _FakeNode()
    try:
        rows = _http_source(spark, node.uri, end=14,
                            rate_limit=500).collect()
        assert len(rows) == 14
    finally:
        node.close()


def _entity_source(spark, entity, start_epoch, end_epoch, uris=None, **opts):
    register_beacon_api(spark)
    r = (spark.read.format("beacon_api")
         .option("entity", entity)
         .option("start_epoch", start_epoch).option("end_epoch", end_epoch)
         .option("genesis", GENESIS).option("secs_per_slot", SECS))
    if uris:
        r = r.option("provider_uris", uris)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_committees_source_matches_fixture_generator(spark):
    from ethereum2_etl_airflow_spark.sources.fixtures import (
        gen_beacon_committees)

    src = _entity_source(spark, "committees", 0, 9,
                         epochs_per_partition=3)
    gen = gen_beacon_committees(spark, 9, genesis=GENESIS,
                                secs_per_slot=SECS)
    assert src.schema == gen.schema
    assert src.rdd.getNumPartitions() == 3   # ceil(9/3)
    assert src.orderBy("slot", "index").collect() \
        == gen.orderBy("slot", "index").collect()


def test_validators_source_matches_fixture_generator(spark):
    from ethereum2_etl_airflow_spark.sources.fixtures import (
        gen_beacon_validators)

    src = _entity_source(spark, "validators", 5, 6, n_validators=32)
    gen = gen_beacon_validators(spark, 32, epoch=5, genesis=GENESIS,
                                secs_per_slot=SECS)
    assert src.schema == gen.schema
    assert src.orderBy("validator_index").collect() \
        == gen.orderBy("validator_index").collect()


def test_http_committees_fetches_and_maps(spark):
    node = _FakeNode()
    try:
        got = _entity_source(spark, "committees", 0, 6, uris=node.uri,
                             epochs_per_partition=2)
        want = _entity_source(spark, "committees", 0, 6,
                              epochs_per_partition=2)
        assert got.orderBy("slot", "index").collect() \
            == want.orderBy("slot", "index").collect()
        # pruned state (epoch >= 100 → 404) yields no rows, no error
        empty = _entity_source(spark, "committees", 100, 102,
                               uris=node.uri)
        assert empty.count() == 0
    finally:
        node.close()


def test_http_validators_fetches_and_maps(spark):
    node = _FakeNode()
    try:
        got = _entity_source(spark, "validators", 5, 6, uris=node.uri)
        want = _entity_source(spark, "validators", 5, 6, n_validators=24)
        assert got.orderBy("validator_index").collect() \
            == want.orderBy("validator_index").collect()
    finally:
        node.close()


def test_entity_option_rejects_unknown_and_streaming_non_blocks(spark):
    import pytest as _pytest

    register_beacon_api(spark)
    with _pytest.raises(Exception, match="unknown entity"):
        (spark.read.format("beacon_api").option("entity", "nope")
         .load().collect())
    # simpleStreamReader is only invoked at query start, so assert the
    # guard on the DataSource directly
    from ethereum2_etl_airflow_spark.sources.beacon_api import (
        BeaconApiDataSource)

    with _pytest.raises(ValueError, match="entity=blocks only"):
        BeaconApiDataSource({"entity": "committees"}) \
            .simpleStreamReader(None)


def test_beacon_api_stream_follows_head_and_resumes(spark, tmp_path):
    """Streaming tail of the export: micro-batches advance the slot
    offset (bounded by max_slots_per_batch), and a restarted query
    resumes from the checkpointed offset — no re-read, no gap.  Parquet
    sink: the memory sink cannot recover from a checkpoint."""
    from ethereum2_etl_airflow_spark.sources.beacon_api import (
        register_beacon_api)

    register_beacon_api(spark)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        q = (spark.readStream.format("beacon_api")
             .option("start_slot", 0).option("end_slot", 100)
             .option("max_slots_per_batch", 64)
             .option("genesis", 1704067200).option("secs_per_slot", 300)
             .load()
             .select("block_slot", "block_epoch", "skipped")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    first = run_once()
    assert len(first) >= 64, f"first run read {len(first)} slots"
    # restarted queries resume from the checkpointed offset
    seen = first
    for _ in range(3):
        if len(seen) >= 100:
            break
        seen = run_once()
    slots = sorted(r["block_slot"] for r in seen)
    assert slots == list(range(100)), "gaps or duplicates after resume"
    assert all(r["block_epoch"] == r["block_slot"] // 32 for r in seen)
