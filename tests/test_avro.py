"""Jar-free Avro source/sink (sources/avro.py): codec roundtrips,
container framing, schema translation, distributed read/write."""

from __future__ import annotations

from datetime import date, datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ethereum2_etl_airflow_spark.sources.avro import (
    _zigzag_decode, _zigzag_encode, avro_to_spark_type, decode_container,
    encode_container, read_avro, spark_to_avro_schema, write_avro)

REC = {"type": "record", "name": "r", "fields": [
    {"name": "k", "type": "long"},
    {"name": "s", "type": ["null", "string"]},
    {"name": "f", "type": "double"},
    {"name": "b", "type": "bytes"},
    {"name": "ok", "type": "boolean"},
    {"name": "d", "type": {"type": "int", "logicalType": "date"}},
    {"name": "ts", "type": {"type": "long",
                            "logicalType": "timestamp-micros"}},
    {"name": "arr", "type": {"type": "array", "items": "long"}},
]}

ROWS = [
    {"k": 0, "s": "héllo", "f": 1.5, "b": b"\x00\xff", "ok": True,
     "d": date(2024, 2, 29), "ts": datetime(2024, 1, 2, 3, 4, 5, 6),
     "arr": [1, -2, 3]},
    {"k": -(1 << 40), "s": None, "f": -0.0, "b": b"", "ok": False,
     "d": date(1969, 12, 31), "ts": datetime(1970, 1, 1, 0, 0, 0),
     "arr": []},
    {"k": (1 << 62), "s": "", "f": 2.0 ** -30, "b": b"x" * 300,
     "ok": True, "d": date(1970, 1, 1),
     "ts": datetime(2038, 1, 19, 3, 14, 7), "arr": [0]},
]


def test_zigzag_roundtrip_edges():
    for n in (0, 1, -1, 63, -64, 64, 2**31 - 1, -(2**31), 2**62,
              -(2**62), 2**63 - 1, -(2**63)):
        enc = _zigzag_encode(n)
        dec, pos = _zigzag_decode(memoryview(enc), 0)
        assert dec == n and pos == len(enc)


@pytest.mark.parametrize("codec", ["null", "deflate"])
def test_container_roundtrip(codec):
    blob = encode_container(ROWS, REC, codec=codec)
    rows, sch = decode_container(blob)
    assert sch == REC
    assert rows == ROWS


def test_multi_block_framing():
    # sync_interval=1 → one block per row, three sync-framed blocks
    blob = encode_container(ROWS, REC, codec="deflate", sync_interval=1)
    rows, _ = decode_container(blob)
    assert rows == ROWS
    assert len(blob) > len(encode_container(ROWS, REC))  # more framing


def test_bad_magic_and_corrupt_sync_raise():
    with pytest.raises(ValueError, match="magic"):
        decode_container(b"PAR1" + b"\x00" * 64)
    blob = bytearray(encode_container(ROWS, REC, codec="null"))
    blob[-1] ^= 0xFF  # flip one sync byte of the final block
    with pytest.raises(ValueError, match="sync"):
        decode_container(bytes(blob))


def test_unsupported_codec_rejected():
    with pytest.raises(ValueError, match="codec"):
        encode_container(ROWS, REC, codec="snappy")


def test_schema_translation_both_ways():
    st, _ = avro_to_spark_type(REC)
    assert isinstance(st, T.StructType)
    assert dict((f.name, (f.dataType, f.nullable)) for f in st.fields)[
        "s"] == (T.StringType(), True)
    assert st["d"].dataType == T.DateType()
    assert st["ts"].dataType == T.TimestampType()
    assert st["arr"].dataType == T.ArrayType(T.LongType(),
                                             containsNull=False)
    # spark → avro → spark is a fixed point on the supported subset
    back = spark_to_avro_schema(st)
    st2, _ = avro_to_spark_type(back)
    assert [(f.name, f.dataType) for f in st2.fields] == \
        [(f.name, f.dataType) for f in st.fields]


def test_distributed_roundtrip_matches_source(spark, sf_dir, tmp_path):
    """write_avro (one file per partition) then read_avro (binaryFile +
    mapInPandas) round-trips a real table bit-exactly, across files."""
    src = (spark.read.parquet(f"{sf_dir}/orders.parquet")
           .select("o_orderkey", "o_orderstatus", "o_totalprice",
                   F.to_date("o_orderdate").alias("o_orderdate"))
           .repartition(3))
    path = str(tmp_path / "orders_avro")
    write_avro(src, path, codec="deflate")
    import glob
    assert len(glob.glob(path + "/part-*.avro")) == 3
    got = read_avro(spark, path + "/*.avro")
    assert got.schema == T.StructType([
        T.StructField("o_orderkey", T.LongType(), True),
        T.StructField("o_orderstatus", T.StringType(), True),
        T.StructField("o_totalprice", T.DoubleType(), True),
        T.StructField("o_orderdate", T.DateType(), True)])
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, src.collect()))
    # decode runs executor-side as ONE Arrow stage over binaryFile
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan


def test_read_avro_explicit_schema_prunes_columns(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 2.0)], "k long, s string, f double")
    path = str(tmp_path / "t")
    write_avro(df.coalesce(1), path, codec="null")
    narrow = read_avro(spark, path + "/*.avro",
                       schema=T.StructType(
                           [T.StructField("k", T.LongType())]))
    assert narrow.columns == ["k"]
    assert narrow.collect()[0]["k"] == 1
