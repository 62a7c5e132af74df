"""Physical-layout helpers.

``ensure_parallelism`` exists because Spark's scan parallelism is bounded
by the *source* layout: a single parquet file with one row group is one
task no matter how many cores the cluster has (byte-range splits assign a
row group to exactly one task).  A CPU-heavy narrow stage downstream
(shingling, signature packing, GEMM blocks) then serializes on one core.

The helper is deliberately scale-aware in both directions:

- Small/badly-laid-out sources (few files, one row group — the local
  testdata shape): repartition up to the session's parallelism.  The
  shuffle moves only what a single task held, i.e. it is cheap exactly
  when it is needed.
- Big sources (a 100 TB corpus is thousands of splits): the partition
  count already exceeds the threshold, so this is a **no-op** — no extra
  shuffle is ever added on the scale path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["ensure_parallelism", "finalize_release", "zorder_key",
           "zorder_by"]


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` iff its physical plan yields materially fewer
    partitions than the session can run concurrently (< half of
    ``defaultParallelism``).  Returns ``df`` unchanged otherwise."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    try:
        current = df.rdd.getNumPartitions()
    except Exception:  # streaming / unresolvable plans: leave untouched
        return df
    if current >= max(2, target // 2):
        return df
    return df.repartition(target)


def finalize_release(result: DataFrame, *cached: DataFrame) -> DataFrame:
    """Materialize ``result`` (eager ``localCheckpoint``), then unpersist
    the cached intermediates it was built from.

    The dedup/similarity operators cache big intermediates (shingle sets,
    normalized vectors, LSH features) that several plan branches read;
    those caches must live until the result is computed, but a long-lived
    session running many checks (bench/parity run ~70 in one JVM) must
    not accumulate them.  The results themselves are orders of magnitude
    smaller (top-k rows, near-dup pairs), so the contract is: compute the
    result NOW while the caches are warm, drop the caches, hand back the
    materialized result.  Checkpoint blocks are released by the
    ContextCleaner once the returned DataFrame is garbage-collected.
    """
    out = result.localCheckpoint(eager=True)
    for df in cached:
        df.unpersist()
    return out


def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) key: interleave the low ``bits`` of two
    non-negative integer columns — bit i of c1 lands at 2i, of c2 at
    2i+1.  Sorting by this key clusters rows that are close in BOTH
    dimensions, so parquet row-group min/max stats prune 2-D predicates
    (the Delta/Iceberg OPTIMIZE ZORDER layout trick, as plain column
    math).  Callers bucket/scale inputs into [0, 2^bits) first; pure
    shift/mask expressions, identical in any engine.
    """
    from pyspark.sql import functions as F

    a = c1.cast("bigint")
    b = c2.cast("bigint")
    key = F.lit(0).cast("bigint")
    for i in range(bits):
        key = (key
               + F.shiftleft(F.shiftright(a, i).bitwiseAND(1), 2 * i)
               + F.shiftleft(F.shiftright(b, i).bitwiseAND(1), 2 * i + 1))
    return key


def zorder_by(df: DataFrame, c1: str, c2: str, bits: int = 16,
              key_col: str = "zkey") -> DataFrame:
    """Rewrite ``df`` into Z-order: append the Morton key and range-
    repartition + sort by it — the write-side layout pass before a
    parquet sink.  Range partitioning keeps output files disjoint in
    key space (each file covers one Z-curve segment), which is exactly
    what makes the min/max pruning work."""
    from pyspark.sql import functions as F

    keyed = df.withColumn(key_col, zorder_key(F.col(c1), F.col(c2), bits))
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, key_col).sortWithinPartitions(key_col)
