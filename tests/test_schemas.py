"""Schema translator tests (SURVEY §2.6 D2; `bigquery_utils.py:36-65` analog)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

from ethereum2_etl_airflow_spark.sources.schemas import (
    BEACON_TABLES, beacon_schema, bq_json_file_to_struct, bq_json_to_struct,
    struct_to_bq_json,
)

# A hand-written BQ-style schema exercising every translator branch
# (nested repeated RECORD, scalar repeated, defaults).  NOT copied from the
# reference; shaped like its dialect.
SAMPLE = [
    {"name": "id", "type": "INTEGER", "mode": "NULLABLE"},
    {"name": "when", "type": "TIMESTAMP"},
    {"name": "flag", "type": "BOOLEAN", "mode": "NULLABLE"},
    {"name": "amount", "type": "NUMERIC"},
    {"name": "tags"},  # defaults: STRING NULLABLE (bigquery_utils.py:52-53)
    {"name": "indices", "type": "INTEGER", "mode": "REPEATED"},
    {"name": "items", "type": "RECORD", "mode": "REPEATED", "fields": [
        {"name": "k", "type": "STRING"},
        {"name": "sub", "type": "RECORD", "fields": [
            {"name": "x", "type": "FLOAT"},
        ]},
    ]},
]


def test_translator_types():
    st = bq_json_to_struct(SAMPLE)
    assert st["id"].dataType == T.LongType()
    assert st["when"].dataType == T.TimestampType()
    assert st["amount"].dataType == T.DecimalType(38, 9)
    assert st["tags"].dataType == T.StringType()
    assert st["indices"].dataType == T.ArrayType(T.LongType())
    items = st["items"].dataType
    assert isinstance(items, T.ArrayType)
    inner = items.elementType
    assert isinstance(inner, T.StructType)
    assert inner["sub"].dataType["x"].dataType == T.DoubleType()


def test_translator_roundtrip():
    st = bq_json_to_struct(SAMPLE)
    again = bq_json_to_struct(struct_to_bq_json(st))
    assert st == again


def test_translator_from_file(tmp_path):
    p = tmp_path / "schema.json"
    p.write_text(json.dumps(SAMPLE))
    assert bq_json_file_to_struct(p) == bq_json_to_struct(SAMPLE)


def test_beacon_schemas_materialize():
    for table in BEACON_TABLES:
        st = beacon_schema(table)
        assert len(st.fields) > 4
    blocks = beacon_schema("beacon_blocks")
    att = blocks["attestations"].dataType
    assert isinstance(att, T.ArrayType) and isinstance(att.elementType, T.StructType)
    vals = beacon_schema("beacon_validators")
    assert vals["balance"].dataType == T.DecimalType(38, 9)
    # uint64 sentinel columns must stay STRING (SURVEY §7.4.2)
    assert vals["exit_epoch"].dataType == T.StringType()


def test_unknown_type_rejected():
    import pytest
    with pytest.raises(ValueError):
        bq_json_to_struct([{"name": "g", "type": "GEOGRAPHY"}])
