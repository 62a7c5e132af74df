"""Model-inference stages for a training-data pipeline — the "run a
scorer over 100 TB of text" shapes, expressed so the MODEL is data and
the INFERENCE is pure column algebra.

Three operators:

- :func:`hashed_linear_score` — fastText-style linear classifier over
  hashed bag-of-words features (the standard quality/toxicity filter
  architecture for pretraining corpora).  The model is a (bucket,
  weight) table joined broadcast; with no table supplied, a
  closed-form demo model makes the whole operator integer-exact and
  SQL-oracle-checkable.
- :func:`random_projection_embed` — deterministic ±1 random-projection
  embeddings (the cheap dense-featurizer: SimHash's real-valued
  cousin), emitted in long (doc, dim, component) form.
- :func:`bernoulli_keep` — per-document Bernoulli keep with
  probability proportional to a score column, derandomized through
  ``md5(id)`` so the sample is reproducible on any engine, any
  partitioning, any run.

Why hashing instead of a vocabulary: a 100 TB corpus has an unbounded
token set; hashing buckets it into a FIXED feature space (the hashing
trick), so the model table is bounded (n_buckets rows), broadcastable,
and needs no vocabulary-building pass over the corpus.

All hash math is md5-derived (like `operators/quality.py`'s CMS and
`operators/sampling.py`'s samplers) so every number is bit-identical
cross-engine — which is what lets the driver's DuckDB oracle verify
model INFERENCE output value-for-value, not just row counts.

Scale shape (all three): explode tokens → codegen hash/weight
projection → ONE map-side-combining groupBy per doc.  No vocabulary
join, no Python in the hot path; the optional weights join is
broadcast by construction (n_buckets is a constant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens

__all__ = ["demo_weights", "hashed_linear_score",
           "random_projection_embed", "bernoulli_keep",
           "calibration_bins"]


def _bucket(tok_col, n_buckets: int):
    """Feature bucket of a token: first 8 md5 hex chars as an int,
    mod n_buckets — uniform, engine-portable."""
    return F.conv(F.substring(F.md5(tok_col), 1, 8), 16, 10) \
        .cast("long") % n_buckets


def _demo_weight(bucket_col):
    """Closed-form integer weight in [-1000, 1000] for a bucket — the
    "demo model" (a Knuth-multiplicative scramble of the bucket id)
    that keeps the operator value-checkable without shipping a model
    table.  Real deployments pass ``weights`` instead."""
    return (bucket_col * 2654435761) % 2001 - 1000


def demo_weights(spark, n_buckets: int = 4096) -> DataFrame:
    """The demo model as an explicit (bucket, weight) table — for
    exercising the broadcast-join path with weights that match the
    closed form."""
    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        _demo_weight(F.col("id")).cast("long").alias("weight"))


def hashed_linear_score(docs: DataFrame, weights: DataFrame | None = None,
                        n_buckets: int = 4096, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Linear classifier inference over hashed bag-of-words: each token
    OCCURRENCE hashes to one of ``n_buckets`` features; the document
    score is the sum of the matched feature weights, and ``keep`` is
    ``score > 0`` (the filter decision).

    ``weights``: optional (bucket BIGINT, weight BIGINT) model table —
    broadcast-joined (it is n_buckets rows by contract); buckets absent
    from the table contribute 0.  Without it, the closed-form demo
    model applies and the whole operator is SQL-oracle-checkable
    (`check dedup via scoring_linear`).

    Returns (id_col, n_tokens, score, keep)."""
    tok = docs.select(F.col(id_col),
                      F.explode(tokens(F.col(text_col))).alias("t"))
    b = tok.select(id_col, _bucket(F.col("t"), n_buckets).alias("bucket"))
    if weights is None:
        scored = b.select(id_col,
                          _demo_weight(F.col("bucket")).alias("w"))
    else:
        scored = (b.join(F.broadcast(weights), "bucket", "left")
                  .select(id_col,
                          F.coalesce("weight", F.lit(0)).alias("w")))
    return (scored.groupBy(id_col)
            .agg(F.count("*").alias("n_tokens"),
                 F.sum("w").cast("long").alias("score"))
            .withColumn("keep", F.col("score") > 0))


def random_projection_embed(docs: DataFrame, dims: int = 8,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Deterministic ±1 random-projection embedding: component ``j`` of
    a document is Σ over token occurrences of ``sign(md5(token|j))``
    (+1 when the first md5 hex nibble-pair is even, −1 when odd).
    Integer-exact, so embeddings are bit-identical cross-engine and the
    check verifies VALUES.

    Emitted long-form (id, dim, component) — the shape that feeds a
    groupBy-pivot, a similarity join, or a quantizer without array
    comparison headaches.  Cost: |tokens| × dims codegen rows into one
    combining groupBy; dims is a small constant (8–64)."""
    tok = docs.select(F.col(id_col),
                      F.explode(tokens(F.col(text_col))).alias("t"))
    dim_sign = tok.select(
        id_col,
        F.posexplode(F.array(*[
            (F.conv(F.substring(
                F.md5(F.concat(F.col("t"), F.lit(f"|{j}"))), 1, 2),
                16, 10).cast("long") % 2 * 2 - 1)
            for j in range(dims)])).alias("dim", "sign"))
    return (dim_sign.groupBy(id_col, "dim")
            .agg(F.sum("sign").cast("long").alias("component")))


def bernoulli_keep(docs: DataFrame, score_col, seed: str = "ws",
                   id_col: str = "doc_id") -> DataFrame:
    """Quality-weighted sampling: keep each document with probability
    ``clamp(score, 0, 1)``, derandomized — the keep decision is
    ``md5(seed:id) < score`` in 16-bit integer space, so the sample is
    a pure narrow filter (no rand(), no shuffle) reproducible on any
    engine.  The curriculum/up-weighting primitive: score 1.0 always
    keeps, 0.25 keeps ≈ a quarter, deterministically per id.

    (Renamed from ``weighted_sample`` in round 11: the package also
    exports :func:`~.curation.weighted_sample` — fixed-size priority
    sampling — and two public operators sharing a name across sibling
    modules was an import-site hazard.  The check id stays
    ``sample_weighted``.)

    Integer contract: keep iff ``h16 * 10000 < round(clamp(score) *
    10000) * 65536`` where h16 is the first 4 md5 hex chars of
    ``seed || ':' || id`` — exact in 64-bit, no float comparison."""
    h16 = F.conv(F.substring(
        F.md5(F.concat(F.lit(seed), F.lit(":"),
                       F.col(id_col).cast("string"))), 1, 4),
        16, 10).cast("long")
    bps = F.round(
        F.greatest(F.lit(0.0), F.least(F.lit(1.0),
                                       score_col.cast("double"))) * 10000
    ).cast("long")
    return docs.where(h16 * 10000 < bps * 65536)


#: deprecated alias (pre-round-11 name; collided with
#: :func:`~.curation.weighted_sample`) — not in ``__all__``
weighted_sample = bernoulli_keep


def calibration_bins(scored: DataFrame, score_col: str, label_col,
                     n_bins: int = 10, lo: int = 0,
                     hi: int = 1000) -> DataFrame:
    """X99: reliability-diagram bins for a filter classifier — the
    calibration audit every score-thresholded curation step needs
    before its threshold means anything: bucket the integer score
    range [lo, hi) into ``n_bins`` equal bins and report, per bin, the
    count, the positive count, the empirical positive rate (exact
    integer millis), and the mean score (exact integer millis of the
    bin-relative scale) — a well-calibrated scorer has rate_millis
    tracking the bin's score position.

    ``label_col`` is a boolean column (or name) — the ground truth the
    calibration is measured against.  All arithmetic is integer
    (``div``), so the output is exact and SQL-oracle-checkable;
    plotting and ECE-style weighted sums are the consumer's float
    step.

    Returns (bin, n, n_pos, rate_millis, mean_score) ordered by bin;
    scores outside [lo, hi) clamp into the edge bins (a scorer
    emitting out-of-range values still shows up, at the edges, rather
    than vanishing).

    Scale shape: one map-side-combining groupBy on ≤ n_bins keys —
    the sketch-class aggregation shape."""
    lab = F.col(label_col) if isinstance(label_col, str) else label_col
    s = F.col(score_col).cast("long")
    width = (hi - lo) // n_bins
    # integer `div` truncates toward zero, but under-range scores only
    # need to land ≤ 0 before the clamp, so truncation direction is
    # immaterial here
    b = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1),
                                     F.expr(f"(CAST({score_col} AS BIGINT)"
                                            f" - {lo}) div {width}")))
    return (scored.select(b.cast("int").alias("bin"),
                          lab.cast("int").alias("pos"), s.alias("sc"))
            .groupBy("bin")
            .agg(F.count("*").alias("n"),
                 F.sum("pos").cast("long").alias("n_pos"),
                 F.expr("1000 * sum(pos) div count(*)")
                 .alias("rate_millis"),
                 F.expr("1000 * sum(sc) div count(*)")
                 .alias("mean_score")))
