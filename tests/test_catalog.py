"""Catalog/DDL helpers (SURVEY §2.6 D1, D3, D4)."""

from __future__ import annotations

from ethereum2_etl_airflow_spark.catalog import (
    create_database, create_or_replace_view, register_parquet_table,
    table_exists,
)


def test_create_database_idempotent(spark):
    create_database(spark, "crypto_ethereum2")
    create_database(spark, "crypto_ethereum2")  # Conflict swallowed (D1)
    assert any(db.name == "crypto_ethereum2"
               for db in spark.catalog.listDatabases())


def test_view_create_and_replace(spark, sf_dir):
    register_parquet_table(spark, "cat_events", f"{sf_dir}/events.parquet")
    create_or_replace_view(
        spark, "cat_v", "SELECT event_type, COUNT(*) AS n FROM cat_events "
        "GROUP BY event_type")
    assert spark.table("cat_v").count() == 5
    # replace with a different definition (bigquery_utils.py:78-90 analog)
    create_or_replace_view(
        spark, "cat_v", "SELECT 1 AS one")
    assert spark.table("cat_v").columns == ["one"]


def test_table_exists_probe(spark, sf_dir):
    register_parquet_table(spark, "cat_probe", f"{sf_dir}/region.parquet")
    assert table_exists(spark, "cat_probe")
    assert not table_exists(spark, "no_such_table_xyz")
