"""Streaming exact dedup — the continuous face of the X1 operator
(SURVEY §2.9): keep the first occurrence of each content fingerprint as
documents arrive, drop later copies.

Spark-native shape: ``dropDuplicatesWithinWatermark`` on the sha256
content fingerprint.  State holds one (fingerprint → seen) entry per
distinct document INSIDE the watermark horizon and is evicted as the
watermark advances — bounded by arrival-window cardinality, not corpus
history.  That horizon is the semantic contract: a copy arriving later
than the watermark delay after the original is NOT deduplicated (it is a
new state entry).  Cross-horizon global dedup is the batch operator
(:func:`..operators.dedup.dedup_exact`) over the accumulated table; the
two compose as the standard lambda pair (stream trims the firehose,
batch compacts history).

The fingerprint is computed JVM-side (sha2 over normalized text), so the
streaming stage adds one narrow projection + the state-store exchange on
the fingerprint — the same high-entropy key the batch operator groups
on, so no skew by construction.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession

from ..operators.text import fingerprint

__all__ = ["dedup_stream", "run_dedup_available_now"]


def dedup_stream(docs: DataFrame, ts_col: str = "ts",
                 text_col: str = "text",
                 watermark: str = "1 hour") -> DataFrame:
    """First-occurrence pass-through over a streaming documents source:
    rows whose content fingerprint was already seen within the watermark
    horizon are dropped.  Output schema = input schema + ``fp``."""
    with_fp = (docs.withColumn("fp", fingerprint(text_col))
               .withWatermark(ts_col, watermark))
    return with_fp.dropDuplicatesWithinWatermark(["fp"])


def run_dedup_available_now(stream_df: DataFrame,
                            spark: SparkSession,
                            est_keys: int | None = None) -> DataFrame:
    """Run the dedup stream to completion over currently-available input
    (append sink — each surviving row is emitted exactly once).
    Delegates to the shared bounded harness (tmpfs throwaway
    checkpoint, see :func:`..streaming.run_bounded`); pass ``est_keys``
    (expected distinct fingerprints inside the watermark horizon) to
    auto-size the state partitions via
    :func:`..streaming.state_partitions`."""
    from . import run_bounded

    return run_bounded(stream_df, spark, mode="append", prefix="dedup",
                       est_keys=est_keys)
