"""DataFrame-native Bloom-filter semi-join prefilter.

The 100 TB shape this serves: semi-joining a huge fact stream against a
medium key set (too big to broadcast as a hash set, small enough that a
few-hundred-KB bit array summarizes it).  Without it, every fact row
shuffles to the join; with it, the fact side is cut to near-matches by a
broadcast bit-array probe BEFORE any exchange, and only the candidates
pay the exact join.  This is what Spark's runtime
``spark.sql.optimizer.runtime.bloomFilter`` injection does for
shuffle-join plans — re-expressed here as an explicit, composable
operator (the internal ``bloom_filter_agg`` / ``might_contain``
expressions are not user-callable), usable on any plan shape including
streams and multi-stage pipelines.

Correctness contract: a Bloom filter has NO false negatives, so
``bloom_semi_join`` composes the probe with an exact semi-join over the
survivors — the result is bit-identical to a plain semi-join (the SQL
oracle), while the exact join's input is a small candidate subset.

Build shape: k positions per key (``xxhash64(key, i)``), OR-folded into
64-bit words by a map-side-combining groupBy over ≤ m/64 word indices,
then assembled into ONE dense array row (bounded by the constant m, not
by data).  Probe shape: crossJoin(broadcast(1-row bit array)) + a pure
JVM ``forall`` over the k probe positions — a narrow codegen filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bloom_build", "bloom_probe", "bloom_semi_join"]


def _positions(key_col, m_bits: int, k: int) -> list:
    # k independent positions: xxhash64 with a distinct literal tag each;
    # pmod keeps them in [0, m)
    return [F.pmod(F.xxhash64(key_col, F.lit(i)), F.lit(m_bits))
            for i in range(k)]


def bloom_build(keys: DataFrame, key: str, m_bits: int = 1 << 18,
                k: int = 5) -> DataFrame:
    """ONE-row DataFrame ``(bits array<long>)`` — the Bloom bit array
    over ``keys[key]``, dense over all m/64 words (absent words are 0).

    The per-word OR aggregate partial-combines map-side, so the shuffle
    carries at most m/64 rows per map task; the final dense assembly is
    a single bounded row (m is a configuration constant)."""
    n_words = (m_bits + 63) // 64
    pos = F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("p")
    words = (keys.select(pos)
             .select((F.col("p") / 64).cast("long").alias("w"),
                     F.call_function(
                         "shiftleft", F.lit(1).cast("long"),
                         F.pmod(F.col("p"), F.lit(64)).cast("int"))
                     .alias("b"))
             .groupBy("w").agg(F.bit_or("b").alias("bits")))
    dense = (words.groupBy()
             .agg(F.map_from_entries(F.collect_list(F.struct("w", "bits")))
                  .alias("wm"))
             .select(F.transform(
                 F.sequence(F.lit(0), F.lit(n_words - 1)),
                 lambda i: F.coalesce(F.try_element_at("wm",
                                                       i.cast("long")),
                                      F.lit(0).cast("long"))).alias("bits")))
    return dense


def bloom_probe(df: DataFrame, key: str, bloom: DataFrame,
                m_bits: int = 1 << 18, k: int = 5) -> DataFrame:
    """Rows of ``df`` whose key hits all k Bloom positions — a superset
    of the true matches (possible false positives, never negatives)."""
    # collision-proof internal name: the caller's frame may itself have
    # a 'bits' column
    probed = df.crossJoin(F.broadcast(
        bloom.withColumnRenamed("bits", "__bloom_bits")))
    hit = F.lit(True)
    for p in _positions(F.col(key), m_bits, k):
        word = F.try_element_at("__bloom_bits", (p / 64).cast("int") + 1)
        bit = F.call_function("shiftleft", F.lit(1).cast("long"),
                              F.pmod(p, F.lit(64)).cast("int"))
        hit = hit & (word.bitwiseAND(bit) != 0)
    return probed.where(hit).drop("__bloom_bits")


def bloom_semi_join(big: DataFrame, small: DataFrame, on: str,
                    m_bits: int = 1 << 18, k: int = 5) -> DataFrame:
    """``big LEFT SEMI JOIN small ON on`` with a Bloom prefilter: the
    broadcast bit-array probe drops non-matching rows before the
    exchange; the exact semi-join over the surviving candidates removes
    false positives, so the result is exactly the plain semi-join."""
    # no distinct on the build side either: bit_or is idempotent, so
    # duplicate keys OR the same bits — the dedup exchange bought
    # nothing (round-11; the map-side combine already collapses the
    # per-word rows)
    bloom = bloom_build(small.select(on), on, m_bits, k)
    candidates = bloom_probe(big, on, bloom, m_bits, k)
    # no distinct on the semi-join right side: right-side duplicates
    # cannot change left-semi semantics, so the dedup exchange is waste
    return candidates.join(small.select(on), on, "left_semi")
