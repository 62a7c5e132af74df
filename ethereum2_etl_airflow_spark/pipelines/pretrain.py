"""Pre-training corpus curation pipeline — the operators composed the
way a real corpus build runs them:

    quality filter → exact dedup (keep min-id survivor) →
    sliding-window chunking → leakage-safe fold assignment

Stage boundaries MATERIALIZE (round-11): composed lazily, the stages'
plan re-reads the source once per corpus-expression consumer — the
fan-out that at 100 TB means repeated corpus scans.  The pipeline
caches exactly ONE artifact — the post-filter ``kept`` set (what a
production build would persist as its stage output) — computes the
chunks against it, and releases it (the ``finalize_release``
contract); the returned chunks are materialized, which is the
pipeline's output anyway.  The quality filter itself needs no
materialization at all: the gopher verdict is a narrow per-row
expression (round-11), so filtering is a WHERE on the source scan.
Column pruning still applies inside each stage.

Scale shape is the union of the parts (each documented on its
operator): the filter is narrow; dedup is one fingerprint-keyed
combining aggregate + a semi-join back; chunking is narrow fan-out;
folds are a stateless hash.  Fold comes from the DOCUMENT id, not the
chunk id, so all chunks of a document land in one fold — the
train/validation leakage guard chunking would otherwise break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.layout import ensure_parallelism, finalize_release
from ..operators.curation import chunk_sliding, fold_expr
from ..operators.text import fingerprint, gopher_verdict

__all__ = ["curate_pretrain"]


def curate_pretrain(docs: DataFrame, window: int = 32, stride: int = 24,
                    k_folds: int = 5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(doc_id, chunk_id, start, n_tokens, chunk_text, fold) for every
    chunk of every kept, content-unique document."""
    src = docs.select(id_col, text_col)
    # quality filter: gopher is a narrow per-row verdict (round-11), so
    # the filter stage is a plain WHERE on the source scan — no verdict
    # join.  One layout hazard: Catalyst pushes the (deterministic)
    # verdict predicate BELOW a bare repartition, so on a source whose
    # scan is narrower than the machine (single-row-group files) the
    # CPU-heavy verdict would run at file width no matter what exchange
    # sits above it.  When — and only when — the fan-out repartition is
    # actually needed, pin it (cache) so the verdict evaluates against
    # the wide materialized layout; on an already-wide corpus scan this
    # is a no-op and nothing extra is cached.
    wide = ensure_parallelism(src)
    pinned = []
    if wide is not src:
        wide = wide.cache()
        pinned.append(wide)
    kept = wide.where(gopher_verdict(F.col(text_col))["keep"]).cache()
    # exact dedup: min-id survivor per content fingerprint
    survivors = (kept.select(F.col(id_col),
                             fingerprint(F.col(text_col)).alias("fp"))
                 .groupBy("fp").agg(F.min(id_col).alias(id_col))
                 .select(id_col))
    unique = kept.join(survivors, id_col, "left_semi")
    chunks = chunk_sliding(unique, window, stride, text_col, id_col)
    out = chunks.withColumn("fold", fold_expr(F.col(id_col), k_folds))
    return finalize_release(out, kept, *pinned)
