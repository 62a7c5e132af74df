"""Loaders for the driver's TPC-H-ish testdata (TESTDATA.md).

Centralizes two portability concerns:

1. **Runtime confs**: the harness may hand us a SparkSession it built
   itself, so every entry point defensively sets the runtime-settable
   confs we rely on (UTC session timezone; ``nanosAsLong`` so the
   pandas-written ``events.parquet`` INT64(TIMESTAMP_NANOS) column is
   readable — Spark has no nanosecond timestamp type).
2. **Nanos normalization**: ``events.ts`` arrives as raw nanos (bigint)
   under ``nanosAsLong``; :func:`load_table` converts it to a microsecond
   TIMESTAMP, matching what DuckDB yields for the same file, so oracle
   comparisons line up exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["ensure_runtime_conf", "load_table", "TABLES"]

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: columns stored as INT64(TIMESTAMP_NANOS) in parquet, per table
_NANOS_TS_COLS = {"events": ["ts"]}


def ensure_runtime_conf(spark: SparkSession) -> SparkSession:
    """Set runtime-settable confs this engine depends on and ship the
    package to executors (idempotent) — every entry point calls this so a
    foreign SparkSession (the driver harness's) behaves like ours."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static conf on some builds; session.build_session sets it
    try:
        from ..session import ship_package

        ship_package(spark)
    except Exception:
        pass  # non-fatal: cwd-based imports still work in-repo
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table, normalizing nanosecond timestamps."""
    ensure_runtime_conf(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANOS_TS_COLS.get(name, []):
        if dict(df.dtypes).get(c) == "bigint":
            # integer nanos → truncate to micros (same floor DuckDB applies).
            # DIV keeps the math in int64: float division would lose
            # precision (ns epoch values exceed double's 2^53 exact range).
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` DIV 1000")))
    return df
