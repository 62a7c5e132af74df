"""Deduplication operators for LLM training-data pipelines (SURVEY §2.9
X1/X2 + BASELINE.json: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup).

Scale design (the point of each strategy at 100 TB):

- **Exact** (X1): group on a content fingerprint (sha256 of normalized
  text), keep the minimum id.  One shuffle on a high-entropy 256-bit key —
  no skew by construction; partial agg kills most traffic map-side.
- **n-gram Jaccard**: explode 3-word shingles → self-join on shingle →
  per-pair intersection counts → integer cross-multiplied threshold test.
  Exact but quadratic in the worst case; at scale you band it (see
  MinHash) — kept exact here because it is the oracle-checkable reference
  semantics.
- **MinHash + LSH** (X2): MLlib ``MinHashLSH`` over a hashed shingle
  vector; ``approxSimilarityJoin`` does the band-bucket join so candidate
  generation is near-linear.  Seeded → deterministic.
- **SimHash**: 64-bit signature from per-token xxhash64 sign-sums;
  near-dup candidates = equal 16-bit band (4 bands → Hamming ≤ 3 is
  guaranteed candidate).  Pure column expressions + one groupBy.
- **Embedding cosine**: blocked pairwise cosine with decimal-accumulated
  dot products (order-independent, hash-stable); blocking key bounds the
  quadratic term.  The LSH variant for unblocked scale lives in
  :mod:`.similarity`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import fingerprint, tokens

__all__ = [
    "dedup_exact", "shingles", "ngram_jaccard_pairs",
    "minhash_near_dups", "simhash_signature", "simhash_candidates",
    "cosine_near_dup_pairs",
]


def dedup_exact(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """X1: one surviving row id per distinct canonical content + the
    duplicate count.  ``sha2(normalize(text))`` group key."""
    return (
        df.groupBy(fingerprint(text_col).alias("fp"))
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_copies"))
    )


def shingles(col, n: int = 3):
    """n-word shingles as strings.  1-based ``element_at``; documents with
    fewer than n tokens yield an empty list (guarded sequence)."""
    t = tokens(col)
    k = F.size(t) - (n - 1)
    return F.when(k >= 1, F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )).otherwise(F.array().cast("array<string>"))


def ngram_jaccard_pairs(docs: DataFrame, threshold_tenths: int = 6,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs with J >= threshold_tenths/10.

    explode distinct shingles → equi-join on shingle (id_a < id_b) →
    count intersections → integer threshold: ``10*inter >= t*(|A|+|B|-inter)``.
    Returns (id_a, id_b, inter, size_a, size_b).
    """
    sh = (docs.select(F.col(id_col).alias("id"),
                      F.explode(F.array_distinct(shingles(F.col(text_col), n)))
                      .alias("sh")))
    sizes = sh.groupBy("id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .where(10 * F.col("inter")
               >= threshold_tenths * (F.col("size_a") + F.col("size_b") - F.col("inter")))
        .select("id_a", "id_b", "inter", "size_a", "size_b")
    )


def minhash_near_dups(docs: DataFrame, jaccard_distance: float = 0.4,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_hash_tables: int = 5, seed: int = 42) -> DataFrame:
    """X2: MinHash+LSH candidate pairs within the given Jaccard distance.

    Pipeline: shingle set → fixed-dim sparse count vector (HashingTF) →
    MinHash signatures → banded bucket join (``approxSimilarityJoin``).
    At 100 TB this is the linear-ish near-dedup path: candidates only form
    inside shared LSH buckets, never a full cross join.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = docs.select(F.col(id_col).alias("id"),
                     F.array_distinct(shingles(F.col(text_col))).alias("sh"))
    sh = sh.where(F.size("sh") > 0)
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=1 << 18)
    # cache() is load-bearing, not just a reuse win: Spark does not
    # guarantee filter-before-UDF evaluation order, and without the
    # barrier the MinHash hash UDF can run on the empty-shingle rows the
    # filter drops ("Must have at least 1 non zero entry").  The cached
    # table is the post-filter vector set — the thing approxSimilarityJoin
    # reads twice anyway.
    feats = tf.transform(sh).cache()
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=num_hash_tables, seed=seed)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, jaccard_distance,
                                       distCol="jaccard_dist")
    return (
        pairs.select(F.col("datasetA.id").alias("id_a"),
                     F.col("datasetB.id").alias("id_b"),
                     F.col("jaccard_dist"))
        .where(F.col("id_a") < F.col("id_b"))
    )


def simhash_signature(docs: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64, sign-sum each bit,
    sign → signature bit.  Pure column expressions (explode + 64 partial-
    agg sums + bit assembly) — no UDF, linear in corpus size."""
    tok = docs.select(F.col(id_col).alias("id"),
                      F.explode(tokens(F.col(text_col))).alias("tok"))
    h = tok.withColumn("h", F.xxhash64("tok"))
    bit_sums = h.groupBy("id").agg(*[
        F.sum(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) * 2 - 1)
        .alias(f"b{b}")
        for b in range(64)
    ])
    sig = F.lit(0).cast("long")
    for b in range(64):
        sig = sig + F.when(F.col(f"b{b}") > 0,
                           F.shiftleft(F.lit(1).cast("long"), b)).otherwise(0)
    return bit_sums.select("id", sig.alias("simhash"))


def simhash_candidates(sigs: DataFrame) -> DataFrame:
    """Near-dup candidate pairs from equal 16-bit SimHash bands (4 bands —
    any pair with Hamming distance ≤ 3 shares at least one band).  Banding
    replaces the quadratic all-pairs Hamming scan with 4 equi-joins."""
    bands = sigs.select(
        "id", "simhash",
        *[F.shiftrightunsigned(F.col("simhash"), 16 * i)
          .bitwiseAND(F.lit(0xFFFF)).alias(f"band{i}") for i in range(4)],
    )
    out = None
    for i in range(4):
        a, b = bands.alias("a"), bands.alias("b")
        cand = (a.join(b, (F.col(f"a.band{i}") == F.col(f"b.band{i}"))
                       & (F.col("a.id") < F.col("b.id")))
                .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                        F.col("a.simhash").alias("sig_a"),
                        F.col("b.simhash").alias("sig_b")))
        out = cand if out is None else out.unionByName(cand)
    dist = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return out.distinct().withColumn("hamming", dist.cast("int"))


def cosine_near_dup_pairs(emb: DataFrame, block_col: str = "label",
                          threshold_millis: int = 999) -> DataFrame:
    """Embedding-cosine near-dup pairs within a blocking key.

    Dot products accumulate in DECIMAL (order-independent → hash-stable);
    the threshold compares the cosine rounded to 1e-9 against
    threshold_millis/1000.  Blocking bounds the pair count; for unblocked
    corpora use the LSH path in :mod:`.similarity`.
    Input: (vec_id, embedding array<float|double>, <block_col>).
    """
    from ..functions.vectors import cosine_decimal

    a = emb.select(F.col("vec_id").alias("id_a"),
                   F.col("embedding").alias("va"), F.col(block_col))
    b = emb.select(F.col("vec_id").alias("id_b"),
                   F.col("embedding").alias("vb"), F.col(block_col))
    pairs = a.join(b, on=block_col).where(F.col("id_a") < F.col("id_b"))
    cos = cosine_decimal(F.col("va"), F.col("vb"))
    return (
        pairs.select(block_col, "id_a", "id_b",
                     cos.cast("decimal(18,9)").alias("cos9"))
        .where(F.col("cos9") >= F.lit(threshold_millis) / 1000.0)
        .select(block_col, "id_a", "id_b",
                F.col("cos9").cast("double").alias("cosine"))
    )
