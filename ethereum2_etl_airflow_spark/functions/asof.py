"""As-of (most-recent-at-or-before) join — SURVEY §2.8 joins row.

Spark has no native ASOF JOIN (DuckDB/kdb do); the scalable formulation
is the union-marker window, not a range join:

1. tag left (probe) and right (reference) rows, union them;
2. one window per key ordered by (ts, tag): ``last_value(right payload,
   ignorenulls)`` carries the latest reference row at-or-before each
   probe row;
3. keep probe rows.

Cost: ONE shuffle on the key (same as any join) + a sort within
partitions — no range-explosion, no per-row subquery, skew handled the
same way as any window (AQE/salting).  This is the standard big-data
as-of pattern (e.g. point-in-time feature joins in feature stores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_cols: list[str] | None = None,
              strict: bool = False) -> DataFrame:
    """For every left row, attach the right row with the greatest
    ``right_ts`` <= ``left_ts`` (or < when ``strict``) within the same
    ``on`` key.  Right columns come back with an ``asof_`` prefix
    (NULL when no earlier reference row exists).

    Ties on equal timestamps: the union orders reference rows before
    probe rows at the same instant iff ``strict`` is False, so an
    exactly-simultaneous reference row is visible to the probe unless
    strict ordering is requested.
    """
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    l_tag = left.withColumn("__ts", F.col(left_ts)) \
                .withColumn("__is_left", F.lit(1))
    payload = F.struct(F.col(right_ts).alias("__ref_ts"),
                       *[F.col(c) for c in right_cols])
    r_tag = (right.select(F.col(on), F.col(right_ts).alias("__ts"),
                          payload.alias("__payload"))
             .withColumn("__is_left", F.lit(0)))
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    l_tag = l_tag.withColumn("__payload",
                             F.lit(None).cast(r_tag.schema["__payload"].dataType))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    # tie order at equal __ts: inclusive → reference rows first (their
    # payload is visible to a simultaneous probe); strict → probe first.
    # Final tiebreaker: the payload struct itself — several reference
    # rows sharing (key, ts) would otherwise resolve arbitrarily per run;
    # ordering by payload makes last() pick the lexicographically
    # greatest payload deterministically.
    tie = F.col("__is_left") if not strict else (1 - F.col("__is_left"))
    w = (Window.partitionBy(on)
         .orderBy(F.col("__ts"), tie, F.col("__payload"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn(
        "__asof", F.last("__payload", ignorenulls=True).over(w))
    out = carried.where(F.col("__is_left") == 1).select(
        *[F.col(c) for c in left.columns],
        F.col("__asof.__ref_ts").alias(f"asof_{right_ts}"),
        *[F.col(f"__asof.{c}").alias(f"asof_{c}") for c in right_cols],
    )
    return out
