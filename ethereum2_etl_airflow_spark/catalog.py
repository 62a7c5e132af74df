"""Catalog / DDL helpers (SURVEY.md §2.6 D1-D5).

Spark analogs of the reference's BigQuery catalog glue
(`bigquery_utils.py`): idempotent dataset creation (:10-21), view
create-or-replace (:78-90), table existence probe (:93-98).  Job
submit+assert (:24-33) has no analog — Spark actions are synchronous and
failures raise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["create_database", "create_or_replace_view", "table_exists",
           "register_parquet_table"]


def create_database(spark: SparkSession, name: str) -> None:
    """D1: idempotent dataset create (`bigquery_utils.py:10-21` swallows
    Conflict; IF NOT EXISTS is the declarative equivalent)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def create_or_replace_view(spark: SparkSession, name: str, sql: str,
                           temp: bool = True) -> None:
    """D3: create/replace a view from SQL (`bigquery_utils.py:78-90`)."""
    if temp:
        spark.sql(sql).createOrReplaceTempView(name)
    else:
        spark.sql(f"CREATE OR REPLACE VIEW {name} AS {sql}")


def table_exists(spark: SparkSession, name: str) -> bool:
    """D4: existence probe (`bigquery_utils.py:93-98`)."""
    return spark.catalog.tableExists(name)


def register_parquet_table(spark: SparkSession, name: str, path: str) -> DataFrame:
    """Register a parquet path as a temp view for SQL access."""
    df = spark.read.parquet(path)
    df.createOrReplaceTempView(name)
    return df
