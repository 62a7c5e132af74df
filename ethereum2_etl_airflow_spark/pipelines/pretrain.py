"""Pre-training corpus curation pipeline — the operators composed the
way a real corpus build runs them:

    quality filter → exact dedup (keep min-id survivor) →
    sliding-window chunking → leakage-safe fold assignment

One logical plan end-to-end: no stage materializes, so Catalyst prunes
columns across stage boundaries (the chunker never reads the rule
bitmask, the fold assigner only reads ids) and the whole composition
stays a DataFrame a caller can keep composing.

Scale shape is the union of the parts (each documented on its
operator): the filter is narrow; dedup is one fingerprint-keyed
combining aggregate + a semi-join back; chunking is narrow fan-out;
folds are a stateless hash.  Fold comes from the DOCUMENT id, not the
chunk id, so all chunks of a document land in one fold — the
train/validation leakage guard chunking would otherwise break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.curation import chunk_sliding, fold_expr
from ..operators.text import fingerprint, gopher_filter

__all__ = ["curate_pretrain"]


def curate_pretrain(docs: DataFrame, window: int = 32, stride: int = 24,
                    k_folds: int = 5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_id, start, n_tokens, chunk_text, fold) for every
    chunk of every kept, content-unique document."""
    kept_ids = gopher_filter(docs, text_col, id_col).where("keep")
    kept = docs.join(kept_ids.select(id_col), id_col, "left_semi")
    # exact dedup: min-id survivor per content fingerprint
    survivors = (kept.select(F.col(id_col),
                             fingerprint(F.col(text_col)).alias("fp"))
                 .groupBy("fp").agg(F.min(id_col).alias(id_col))
                 .select(id_col))
    unique = kept.join(survivors, id_col, "left_semi")
    chunks = chunk_sliding(unique, window, stride, text_col, id_col)
    return chunks.withColumn("fold", fold_expr(F.col(id_col), k_folds))
