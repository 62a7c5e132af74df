"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Backed by :mod:`ethereum2_etl_airflow_spark.plans.registry`; one entry per
implemented operator from SURVEY.md §2 (+ §2.9 extension ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ethereum2_etl_airflow_spark.plans.registry import (  # noqa: E402
    oracle_sqls, spark_queries,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the composed pre-training curation pipeline (Gopher
    filter -> exact dedup -> sliding chunks -> leakage-safe folds) over
    the sf0.001 planted-duplicate corpus -- one logical plan through
    four operator families, oracle-checked as `pipeline_pretrain`."""
    from ethereum2_etl_airflow_spark.plans.checks_extension import (
        q_pipeline_pretrain)
    from ethereum2_etl_airflow_spark.sources.testdata import (
        ensure_runtime_conf)

    ensure_runtime_conf(spark)
    return q_pipeline_pretrain(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.9."""
    return spark_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent per query (omitted for
    non-SQL-expressible ops → rows-only check)."""
    return oracle_sqls()
