"""Declarative data-quality expectations — the deequ/Great-Expectations
category re-expressed as ONE Spark aggregate.

The reference's verify stage (`/root/reference/dags/ethereum2etl_airflow/
build_load_dag.py:109-132` + `verify/sqls/*.sql`) hard-codes four
assertion queries, each its own scan.  This operator generalizes the
category: a constraint list compiles into a single map-side-combining
aggregate — one scan however many constraints — and the verdicts come
back as rows, so a verify DAG task can assert on them or persist them as
a quality report table.

Every metric is an exact integer count (violations), so the report is
bit-identical cross-engine and SQL-oracle-checkable.

Constraint specs (name, kind, params):

- ``("c", "not_null", col)``            — col IS NOT NULL violations
- ``("c", "unique", col)``              — rows minus distinct values
- ``("c", "range", col, lo, hi)``       — col outside [lo, hi]
- ``("c", "in_set", col, values)``      — col not in the accepted set
- ``("c", "matches", col, regex)``      — col not rlike regex
- ``("c", "min_rows", n)``              — dataset has < n rows

Scale shape: conditional-count aggregates all partial-combine map-side;
``unique`` adds a count(distinct) (Spark expands to one extra exchange);
the final unpivot to rows is over a single aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["run_expectations"]


def run_expectations(df: DataFrame, specs: list[tuple]) -> DataFrame:
    """(constraint, violations, passed) — one row per spec, computed in
    a single pass over ``df`` (plus Spark's distinct-expansion for any
    ``unique`` specs)."""
    aggs = []
    names = []
    for spec in specs:
        name, kind = spec[0], spec[1]
        names.append(name)
        if kind == "not_null":
            col = spec[2]
            aggs.append(F.count_if(F.col(col).isNull()))
        elif kind == "unique":
            col = spec[2]
            aggs.append(F.count(F.col(col))
                        - F.countDistinct(F.col(col)))
        elif kind == "range":
            col, lo, hi = spec[2], spec[3], spec[4]
            aggs.append(F.count_if(~F.col(col).between(lo, hi)))
        elif kind == "in_set":
            col, values = spec[2], spec[3]
            aggs.append(F.count_if(~F.col(col).isin(list(values))))
        elif kind == "matches":
            col, pat = spec[2], spec[3]
            aggs.append(F.count_if(~F.col(col).rlike(pat)))
        elif kind == "min_rows":
            n = spec[2]
            aggs.append(F.when(F.count(F.lit(1)) >= n, F.lit(0))
                        .otherwise(n - F.count(F.lit(1))))
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
    one = df.agg(*[a.cast("long").alias(f"v{i}")
                   for i, a in enumerate(aggs)])
    rows = F.array(*[
        F.struct(F.lit(n).alias("constraint"),
                 F.col(f"v{i}").alias("violations"))
        for i, n in enumerate(names)])
    return (one.select(F.explode(rows).alias("r"))
            .select("r.constraint", "r.violations",
                    (F.col("r.violations") == 0).alias("passed")))
