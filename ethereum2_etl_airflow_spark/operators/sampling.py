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

__all__ = ["stratified_sample", "hash_fraction_sample", "shuffle_key",
           "shuffle_deterministic", "weighted_mix", "sample_exact_n",
           "negative_sample"]


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


def shuffle_key(seed: str, id_col: str = "doc_id") -> F.Column:
    """The deterministic shuffle order key: ``md5(seed || ':' || id)``.
    A new seed is a completely new permutation; the same seed is the
    same total order on any engine, any partitioning, any run."""
    return F.md5(F.concat(F.lit(seed), F.lit(":"),
                          F.col(id_col).cast("string")))


def shuffle_deterministic(df: DataFrame, seed: str,
                          id_col: str = "doc_id",
                          key_col: str = "shuffle_key") -> DataFrame:
    """Seeded global shuffle for training-data ordering: append the
    :func:`shuffle_key` and lay rows out in that order (range partition
    + in-partition sort, the write-side shape — every output file covers
    a disjoint key range, so concatenating files in filename-key order
    IS the permutation).

    Why not ``ORDER BY rand(seed)``: Spark's rand is deterministic only
    per partition *layout*, so the same corpus laid out differently
    shuffles differently — md5 keys survive re-partitioning, engine
    swaps, and incremental appends (new rows interleave into the same
    permutation).  One range shuffle, no global single-task sort, no
    row_number funnel."""
    keyed = df.withColumn(key_col, shuffle_key(seed, id_col))
    n = df.sparkSession.sparkContext.defaultParallelism
    return keyed.repartitionByRange(n, key_col).sortWithinPartitions(key_col)


def weighted_mix(df: DataFrame, weights: dict[str, float],
                 group_col: str = "source", seed: str = "mix",
                 id_col: str = "doc_id") -> DataFrame:
    """Deterministic dataset mixing: keep each row of group ``g`` with
    probability ``weights[g]`` (groups absent from ``weights`` drop) —
    the per-source subsampling step that hits a target corpus mixture.

    Mechanism: the row survives iff the first 4 hex chars of its seeded
    md5 sort below ``floor(weight·65536)`` as a 4-digit hex literal —
    1/65536 rate granularity, stateless, no shuffle, layout-invariant,
    and reproducible cross-engine (the oracle replays it verbatim).
    Weights must be in [0, 1]; 1.0 keeps everything (threshold ``'g'``
    — the comparison is LEXICOGRAPHIC on hex strings, so the
    keep-everything sentinel must sort above ``'ffff'``, which a
    numeric-looking ``'10000'`` would not)."""
    for g, w in weights.items():
        if not 0.0 <= w <= 1.0:
            raise ValueError(f"weight for {g!r} must be in [0,1], got {w}")
    prefix = F.substring(shuffle_key(seed, id_col), 1, 4)
    thr = F.lit("")  # unknown group: empty threshold, nothing survives
    expr = None
    for g, w in sorted(weights.items()):
        lit = F.lit(format(int(w * 65536), "04x") if w < 1.0 else "g")
        expr = (F.when(F.col(group_col) == g, lit) if expr is None
                else expr.when(F.col(group_col) == g, lit))
    thr = expr.otherwise(thr) if expr is not None else thr
    return df.where(prefix < thr)


def sample_exact_n(df: DataFrame, n: int, id_col: str = "doc_id",
                   key_col: str = "sample_key") -> DataFrame:
    """Exactly-``n`` deterministic global sample: the n smallest
    ``md5(id)`` rows — the reservoir-sampling result, without reservoir
    state.  ``orderBy(key).limit(n)`` compiles to TakeOrderedAndProject
    (per-partition top-n, then a driver-side merge of n·P candidates) —
    no global sort, no single-task funnel."""
    key = F.md5(F.col(id_col).cast("string"))
    return (df.withColumn(key_col, key)
            .orderBy(key_col, id_col).limit(n))


def negative_sample(df: DataFrame, anchor_ids: list[int], k: int = 5,
                    id_col: str = "vec_id",
                    label_col: str = "label") -> DataFrame:
    """Deterministic contrastive negatives: for each anchor, the ``k``
    candidates with a DIFFERENT label, ordered by
    ``md5(anchor_id || '|' || cand_id)`` — a per-anchor-independent,
    engine-portable pseudo-random order, so (a) reruns and relayouts
    pick identical negatives, (b) each anchor draws from an independent
    permutation (no candidate is globally "unlucky"), and (c) the whole
    draw is SQL-oracle-checkable.

    Scale shape: the anchor set is bounded (a training batch), so each
    anchor is one TakeOrdered branch over the label-filtered corpus —
    per-partition heap + driver merge of k·P rows, never a global sort
    and never a |A|x|C| window.  For unbounded anchor sets switch to a
    partial-topk pass keyed by anchor."""
    anchors = {int(r[id_col]): r[label_col] for r in
               df.select(id_col, label_col)
               .where(F.col(id_col).isin([int(a) for a in anchor_ids]))
               .collect()}
    missing = [int(a) for a in anchor_ids if int(a) not in anchors]
    if missing:
        raise ValueError(f"anchor ids not present in {id_col}: {missing}")
    null_lab = [a for a, lab in anchors.items() if lab is None]
    if null_lab:
        # label != NULL is never true — the anchor would silently
        # produce zero negatives, so fail loudly instead
        raise ValueError(f"anchors with NULL {label_col}: {null_lab}")
    branches = []
    for aid in anchor_ids:
        aid = int(aid)
        order = F.md5(F.concat(F.lit(str(aid)), F.lit("|"),
                               F.col(id_col).cast("string")))
        branches.append(
            df.where(F.col(label_col) != anchors[aid])
            .select(F.lit(aid).alias("anchor_id"),
                    F.col(id_col).alias("neg_id"),
                    F.col(label_col).alias("neg_label"),
                    order.alias("h"))
            .orderBy("h", "neg_id").limit(k))
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b)
    w = Window.partitionBy("anchor_id").orderBy("h", "neg_id")
    return (out.withColumn("rank", F.row_number().over(w))
            .select("anchor_id", "rank", "neg_id", "neg_label"))
