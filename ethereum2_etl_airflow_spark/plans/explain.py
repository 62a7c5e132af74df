"""Physical-plan inspection helpers.

"Would this survive a 100x scale-up?" is a property of the plan, not the
output — these helpers make plan shape testable, so regressions in
pushdown/pruning/broadcast fail CI instead of surfacing as a 100 TB
incident.  Used by tests/test_plans.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

__all__ = ["plan_string", "pushed_filters", "read_schema_columns",
           "has_broadcast_join", "scanned_partition_dirs",
           "partition_filters", "wholestage_codegen_spans"]


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode)


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters that reached the parquet scan (``PushedFilters: [...]``)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(x.strip() for x in m.group(1).split(",") if x.strip())
    return out


def read_schema_columns(df: DataFrame) -> list[str]:
    """Columns actually read from parquet (``ReadSchema``) — column
    pruning evidence."""
    cols: list[str] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan_string(df)):
        cols.extend(c.split(":")[0].strip() for c in m.group(1).split(",") if c)
    return cols


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df) or \
        "BroadcastNestedLoopJoin" in plan_string(df)


def scanned_partition_dirs(df: DataFrame) -> int | None:
    """Number of partition directories the scan will actually read —
    ``inputFiles()`` lists files after partition-filter pruning, so this
    is direct partition-pruning evidence.  Falls back to the explain
    text's ``partition count`` when present."""
    files = df.inputFiles()
    if files:
        import os

        return len({os.path.dirname(f) for f in files})
    m = re.search(r"partition count: (\d+)", plan_string(df))
    return int(m.group(1)) if m else None


def partition_filters(df: DataFrame) -> list[str]:
    """``PartitionFilters: [...]`` from the scan node."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", plan_string(df)):
        out.extend(x.strip() for x in m.group(1).split(",") if x.strip())
    return out


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans — wider/fewer is better.  Simple
    mode marks codegen stages as ``*(n)`` node prefixes; formatted mode
    may omit the label, so both are scanned.

    Under AQE the pre-execution plan is ``isFinalPlan=false`` and carries
    no codegen markers — execute the DataFrame (e.g. ``df.count()``)
    first, then call this to read the final plan."""
    simple = plan_string(df, "simple")
    ids = set(re.findall(r"\*\((\d+)\)", simple))
    ids |= set(re.findall(r"WholeStageCodegen \((\d+)\)", plan_string(df)))
    return len(ids)
