"""Chain-time math tests (SURVEY §2.5 T1-T4; 12 s slots, 32-slot epochs)."""

from __future__ import annotations

from datetime import datetime, timezone

from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.functions import chaintime as ct


def test_genesis_slot_zero():
    g = datetime.fromtimestamp(ct.GENESIS_UNIX, tz=timezone.utc)
    s, e = ct.block_range_for_hour(g)
    assert s == 0


def test_block_range_for_date_density():
    d = datetime(2021, 6, 15, tzinfo=timezone.utc)
    s, e = ct.block_range_for_date(d)
    assert e - s + 1 == 86400 // 12  # 7200 slots per day
    # contiguous with the next day
    s2, _ = ct.block_range_for_date(datetime(2021, 6, 16, tzinfo=timezone.utc))
    assert s2 == e + 1


def test_epoch_range_for_date():
    d = datetime(2021, 6, 15, tzinfo=timezone.utc)
    s, e = ct.block_range_for_date(d)
    es, ee = ct.epoch_range_for_date(d)
    assert es == s // 32 and ee == e // 32


def test_hour_window_shape():
    lo, hi = ct.hour_window(datetime(2021, 6, 15, 13, 27, 11, tzinfo=timezone.utc))
    assert lo.minute == lo.second == 0
    assert (hi - lo).total_seconds() == 3599.999999  # HH:59:59.999999 end
    s, e = ct.block_range_for_hour(lo)
    assert e - s + 1 == 3600 // 12  # 300 slots per hour


def test_column_expressions_match_python(spark):
    dts = [datetime(2021, 6, 15, h, 13, 7, tzinfo=timezone.utc) for h in range(4)]
    df = spark.createDataFrame([(d,) for d in dts], "ts timestamp")
    got = df.select(
        ct.slot_for_timestamp(F.col("ts")).alias("slot"),
        ct.epoch_for_timestamp(F.col("ts")).alias("epoch"),
    ).collect()
    for row, d in zip(got, dts):
        expected_slot = int((d.timestamp() - ct.GENESIS_UNIX) // 12)
        assert row["slot"] == expected_slot
        assert row["epoch"] == expected_slot // 32


def test_timestamp_for_slot_roundtrip(spark):
    df = spark.range(0, 1000, 37).select(
        ct.timestamp_for_slot(F.col("id")).alias("ts"), "id")
    back = df.select(ct.slot_for_timestamp(F.col("ts")).alias("s"), "id").collect()
    assert all(r["s"] == r["id"] for r in back)


def test_sentinel_epoch_comparison(spark):
    df = spark.createDataFrame(
        [("18446744073709551615",), ("123456",)], "exit_epoch string")
    out = df.select(
        (ct.epoch_str_as_decimal(F.col("exit_epoch"))
         == F.lit(str(ct.FAR_FUTURE_EPOCH)).cast("decimal(20,0)")).alias("never")
    ).collect()
    assert [r["never"] for r in out] == [True, False]


def test_pre_genesis_timestamps_floor_not_truncate(spark):
    """Negative elapsed must FLOOR to the preceding slot/epoch (-0.5 → -1),
    matching the driver-side helpers — cast('long') truncates toward 0."""
    from datetime import datetime, timezone

    from ethereum2_etl_airflow_spark.functions.chaintime import (
        GENESIS_UNIX, epoch_for_timestamp, slot_for_timestamp,
    )

    rows = [(datetime.fromtimestamp(GENESIS_UNIX + off, tz=timezone.utc),)
            for off in (-25, -12, -6, -1, 0, 6, 12)]
    df = spark.createDataFrame(rows, "ts timestamp")
    got = [tuple(r) for r in df.select(
        slot_for_timestamp(F.col("ts")).alias("slot"),
        epoch_for_timestamp(F.col("ts")).alias("epoch")).collect()]
    # python floor-division reference
    exp = [(off // 12, (off // 12) // 32 if off // 12 >= 0 else -1)
           for off in (-25, -12, -6, -1, 0, 6, 12)]
    exp = [(s, s // 32) for s, _ in exp]
    assert got == exp
