"""Continuously-maintained "latest" table: a streaming upsert that keeps,
per key, the newest row seen so far — the reference's
``beacon_validators_latest`` snapshot (rewritten wholesale by every cron
tick, `build_hourly_export_dag.py:146-149`) re-expressed as an
incremental Structured Streaming materialization.

``foreachBatch`` is the supported escape hatch for merge semantics the
built-in sinks don't have: each micro-batch is compacted to one row per
key (:func:`..operators.load.latest_by_key`), merged with the current
snapshot, and published through the atomic pointer swap of
:func:`..operators.load.write_latest_snapshot` — readers never see a
partial snapshot, exactly as in the batch path.

Scale: per batch the work is one partial-agg compaction of the delta +
one merge keyed by ``key_cols`` against the snapshot (snapshot size =
key cardinality, not history).  The pointer swap keeps old versions
until vacuumed, so concurrent readers are never torn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.load import (latest_by_key, read_latest_snapshot,
                              write_latest_snapshot)

__all__ = ["stream_latest_snapshot"]


def stream_latest_snapshot(stream_df: DataFrame, base_path: str,
                           key_cols: list[str], order_cols: list[str],
                           checkpoint_dir: str | None = None):
    """Start (and return) a streaming query maintaining the latest-row-
    per-key snapshot at ``base_path``.  Use ``trigger(availableNow)``
    semantics by awaiting the returned query for batch-style runs."""
    spark = stream_df.sparkSession

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        delta = latest_by_key(batch, key_cols, order_cols)
        try:
            current = read_latest_snapshot(spark, base_path)
            merged = latest_by_key(
                current.unionByName(delta), key_cols, order_cols)
        except FileNotFoundError:
            merged = delta
        write_latest_snapshot(merged, base_path)

    writer = (stream_df.writeStream.foreachBatch(merge_batch)
              .trigger(availableNow=True))
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
