"""Unified check-query registry — the driver contract's backing store.

Each entry: name → (spark_callable(spark, sf_dir) -> DataFrame,
oracle_sql | None).  ``oracle_sql=None`` marks genuinely
non-SQL-expressible operators (MLlib LSH, streaming) — the driver records
a weaker rows-only check for those.
"""

from __future__ import annotations

from .checks_curation import CURATION_CHECKS
from .checks_extension import EXTENSION_CHECKS
from .checks_reference import REFERENCE_CHECKS
from .checks_relational import RELATIONAL_CHECKS
from .checks_tpch import TPCH_CHECKS

__all__ = ["all_checks", "spark_queries", "oracle_sqls"]


def all_checks() -> dict[str, tuple]:
    # No import guards: if an extension module fails to import, the whole
    # contract must crash loudly — a silently shrunk queries() once cost a
    # round of driver correctness rows for 18 checks.
    out: dict[str, tuple] = {}
    out.update(REFERENCE_CHECKS)
    out.update(RELATIONAL_CHECKS)
    out.update(TPCH_CHECKS)
    out.update(EXTENSION_CHECKS)
    out.update(CURATION_CHECKS)
    return out


def spark_queries():
    return {name: fn for name, (fn, _sql) in all_checks().items()}


def oracle_sqls() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in all_checks().items()
            if sql is not None}
