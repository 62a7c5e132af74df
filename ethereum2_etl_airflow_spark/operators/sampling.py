"""Deterministic sampling operators for training-data curation.

Two tiers, by stratum size:

- :func:`stratified_sample` — exactly-n-per-stratum.  Rows rank inside
  each stratum by ``md5(id)`` (a cryptographic hash ⇒ uniform,
  engine-portable order — DuckDB's ``md5`` produces the identical hex, so
  the oracle can reproduce the *exact* sample) and the first n survive.
  One shuffle on the stratum key; the window sort is the cost, so this is
  the small/medium-stratum tier (eval splits, per-language caps).
- :func:`hash_fraction_sample` — keep a deterministic ~fraction of rows
  with a stateless per-row predicate on the ``md5(id)`` hex prefix.  NO
  shuffle, no state, trivially reproducible and composable (the same row
  set survives on every engine and every run) — the 100 TB tier.
  Granularity is 1/256 per hex-prefix character pair.

Neither uses ``df.sample()``: Spark's sampler is seed-deterministic only
per partition *layout*, so the same data laid out differently samples
differently — unacceptable for reproducible training corpora.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["stratified_sample", "hash_fraction_sample"]


def stratified_sample(df: DataFrame, group_col: str, n: int,
                      id_col: str = "doc_id") -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per ``group_col`` value, chosen
    by md5-of-id order (ties broken by id — total, deterministic)."""
    key = F.md5(F.col(id_col).cast("string"))
    w = Window.partitionBy(group_col).orderBy(key.asc(), F.col(id_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= n).drop("__rn"))


def hash_fraction_sample(df: DataFrame, keep_lt_hex: str,
                         id_col: str = "doc_id") -> DataFrame:
    """Keep rows whose ``md5(id)`` hex prefix sorts below ``keep_lt_hex``
    (e.g. ``"40"`` keeps ≈ 0x40/0x100 = 25%).  Pure narrow filter —
    pushes to the scan, shuffles nothing."""
    prefix = F.substring(F.md5(F.col(id_col).cast("string")),
                         1, len(keep_lt_hex))
    return df.where(prefix < F.lit(keep_lt_hex.lower()))
