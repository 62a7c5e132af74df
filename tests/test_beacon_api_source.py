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
