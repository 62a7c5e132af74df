"""Airflow DAG builders (SURVEY §2.7 O1-O15) — orchestration stays in
Airflow; every data operation is a Spark job in this package.

Import-gated: the engine library works without Airflow installed; these
builders raise a clear error only when actually invoked without it.
"""

from .build_dags import (  # noqa: F401
    RateLimiter, build_export_dag, build_load_dag, provider_fallback,
    wait_for_staged_object,
)
