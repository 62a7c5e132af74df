"""Schema-enforced NDJSON scans (SURVEY.md §2.1 S1-S3).

The reference stages every entity stream as newline-delimited JSON under
Hive-style date partitions and loads it with an imposed schema
(`build_load_dag.py:76-96`): format NEWLINE_DELIMITED_JSON (:81),
``ignore_unknown_values`` (:83), wildcard over all partitions (:92) or a
single date (:89-90).

Spark gives the same semantics declaratively: an explicit ``.schema(st)``
on the JSON reader (a) skips the inference pass — at 100 TB that is a full
extra scan — and (b) drops unknown keys / NULLs missing keys, exactly
BigQuery's load behavior.  PERMISSIVE mode matches BigQuery's tolerance;
pass ``corrupt_col`` to capture malformed lines instead of silently
nulling them (strictly better than the reference, SURVEY §1.3).

Scale notes: NDJSON partitions are split by Spark on line boundaries, so a
single huge file still parallelizes; ``maxPartitionBytes`` (session.py)
bounds task input.  Date filters on the ``block_date`` partition directory
prune at planning time — a single-date scan touches one directory, never
the full history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

__all__ = ["read_ndjson", "read_partition", "staging_path", "stage_export"]


def staging_path(root: str, table: str, block_date: str | None = None,
                 hour: str | None = None, hourly: bool = False) -> str:
    """Staged-object layout, mirroring the reference's GCS convention:
    ``export/{table}/block_date=YYYY-MM-DD/`` (`build_export_dag.py:61-64`)
    and ``export_hourly/{table}/block_date=.../{HH}/``
    (`build_hourly_export_dag.py:63-66`).
    """
    stage = "export_hourly" if hourly else "export"
    p = f"{root}/{stage}/{table}"
    if block_date is not None:
        p += f"/block_date={block_date}"
        if hour is not None:
            # deviation from the reference's bare `/{HH}/` directory:
            # Hive-style `hour=HH` so Spark partition discovery exposes the
            # hour as a prunable virtual column
            p += f"/hour={hour}"
    return p


def read_ndjson(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType,
    corrupt_col: str | None = None,
) -> DataFrame:
    """S1/S2: schema-enforced NDJSON scan over one or many partitions.

    Unknown keys dropped, missing keys NULL — the imposed schema already
    gives ``ignore_unknown_values`` (`build_load_dag.py:83`) semantics.
    """
    reader = spark.read.option("mode", "PERMISSIVE")
    if corrupt_col:
        schema = T.StructType(
            list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).json(path)


def stage_export(
    df,
    root: str,
    table: str,
    ts_col: str,
    hourly: bool = False,
    latest_copy: bool = False,
) -> str:
    """Export-side staging writer (S6, `build_export_dag.py:61-64`;
    hourly + latest variants `build_hourly_export_dag.py:63-71`):
    distributed NDJSON write under the Hive date(/hour) layout with
    dynamic partition overwrite (idempotent re-export of a tick).

    ``latest_copy=True`` also publishes the batch as the "latest"
    snapshot — the reference's constant ``block_date=latest`` tag
    partition, realized instead as a sibling ``{table}_latest`` tree with
    the race-free versioned-pointer swap of
    :func:`..operators.load.write_latest_snapshot` (SURVEY §7.4.5; kept
    outside the date-partition tree so partition discovery over the
    staging layout stays consistent).

    Returns the table's staging root.
    """
    from ..operators.load import write_latest_snapshot

    base = staging_path(root, table, hourly=hourly)
    out = df.withColumn("block_date", F.to_date(F.col(ts_col)))
    parts = ["block_date"]
    if hourly:
        out = out.withColumn("hour", F.date_format(F.col(ts_col), "HH"))
        parts.append("hour")
    out.write.mode("overwrite").partitionBy(*parts).json(base)
    if latest_copy:
        write_latest_snapshot(df, f"{base}_latest")
    return base


def read_partition(
    spark: SparkSession,
    root: str,
    table: str,
    schema: T.StructType,
    block_date: str,
    hour: str | None = None,
    hourly: bool = False,
) -> DataFrame:
    """S3: single-partition scan (`build_load_dag.py:88-90,127`).

    Reads only the ``block_date={ds}`` directory — the Spark analog of the
    reference's date-scoped wildcard; at scale this is partition pruning
    by path, no full-history listing.
    """
    path = staging_path(root, table, block_date, hour, hourly)
    df = read_ndjson(spark, path, schema)
    return df.withColumn("block_date", F.lit(block_date).cast("date"))
