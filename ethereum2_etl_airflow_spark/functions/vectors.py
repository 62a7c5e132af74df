"""Vector column math for embedding operators (SURVEY §2.9 X3).

The dot-product kernels accumulate in DECIMAL so the sum is
order-independent and bit-identical across engines (a float sum's value
depends on accumulation order; decimal addition is exact).  Per-element
products are computed in DOUBLE (IEEE, deterministic) then rounded once
to DECIMAL — binary floats can never tie at a decimal rounding boundary,
so the rounding is unambiguous.

Two precision tiers:

- ``dot_compact`` uses DECIMAL(18,9): precision ≤ 18 keeps Spark's (and
  DuckDB's) decimal in a plain 64-bit long — an order of magnitude faster
  than BigDecimal-backed wide decimals.  Safe for O(1)-magnitude
  components, i.e. normalized vectors.
- ``dot_decimal`` / ``norm_decimal`` use DECIMAL(28,14) for raw vectors.

Bulk pairwise pattern (the 100 TB shape): materialize the L2 norm ONCE
per vector with :func:`with_normalized`, then score each pair with a
single ``dot_compact`` — O(|V|) norm work + one fast reduce per pair,
instead of three wide-decimal reduces per pair.

Everything is ``F.zip_with`` / ``F.aggregate`` column expressions —
JVM-side, no UDF, no data movement beyond the surrounding join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["dot_decimal", "dot_compact", "norm_decimal", "cosine_decimal",
           "with_normalized", "dot_double_lit", "argmax_cell"]

_DEC = "decimal(18,9)"
_DEC_WIDE = "decimal(28,14)"


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _dot(a: Column, b: Column, dec: str) -> Column:
    prods = F.zip_with(_to_double(a), _to_double(b),
                       lambda x, y: (x * y).cast(dec))
    # re-cast each partial sum so the accumulator type stays fixed
    return F.aggregate(prods, F.lit(0).cast(dec),
                       lambda acc, v: (acc + v).cast(dec)).cast("double")


def dot_decimal(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, wide-decimal accumulation; returns DOUBLE."""
    return _dot(a, b, _DEC_WIDE)


def dot_compact(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ, long-backed DECIMAL(18,9) accumulation — the fast kernel
    for normalized components; returns DOUBLE."""
    return _dot(a, b, _DEC)


def norm_decimal(a: Column) -> Column:
    """‖a‖₂ — decimal-accumulated sum of squares, sqrt in double.

    Uses the compact long-backed DECIMAL(18,9) tier: squares are
    non-negative, so the sum fits 9 integer digits for any embedding
    with ‖a‖₂ < ~30k — far beyond normalized/learned-embedding ranges —
    and the long-backed path is ~10x faster than BigDecimal-backed wide
    decimals (measured on the norm-materialization stage)."""
    ad = _to_double(a)
    ss = F.aggregate(F.transform(ad, lambda x: (x * x).cast(_DEC)),
                     F.lit(0).cast(_DEC),
                     lambda acc, v: (acc + v).cast(_DEC))
    return F.sqrt(ss.cast("double"))


def cosine_decimal(a: Column, b: Column) -> Column:
    """cos(a, b) in DOUBLE, deterministic given identical float inputs.
    Per-pair norms — fine for small pair counts; for bulk scoring use
    :func:`with_normalized` + :func:`dot_compact`."""
    return dot_decimal(a, b) / (norm_decimal(a) * norm_decimal(b))


def dot_double_lit(v: Column, const: list[float]) -> Column:
    """Σ vᵢ·cᵢ against a *literal* vector, plain DOUBLE left-fold — for
    internal bucketing decisions (IVF cell assignment) where the result
    never reaches an oracle hash.  Deterministic within Spark (the HOF
    fold is sequential), an order of magnitude cheaper than the decimal
    tiers, and crucially pure JVM: no Python workers enter the plan."""
    lit = F.array(*[F.lit(float(x)) for x in const])
    return F.aggregate(F.zip_with(v, lit, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def argmax_cell(v: Column, centroids) -> Column:
    """First-argmax cell id (0-based) of ``v`` against a centroid matrix
    (numpy array / list of lists) — matches ``np.argmax`` tie behavior.
    All JVM column expressions; with n_lists centroids the plan carries
    n_lists literal arrays, fine for the O(10²) list counts IVF uses."""
    dots = F.array(*[dot_double_lit(v, list(c)) for c in centroids])
    return (F.array_position(dots, F.array_max(dots)) - 1).cast("int")


def with_normalized(df: DataFrame, vec_col: str = "embedding",
                    out_col: str = "nv") -> DataFrame:
    """Append an L2-normalized DOUBLE copy of ``vec_col``.  The norm is
    let-bound (:func:`..functions.let.bind`) so it is computed once per
    vector — not once per pair, and crucially not once per element (the
    naive ``withColumn`` staging collapses and inlines the norm
    expression into the divide lambda — measured 20x slower).  Zero
    vectors yield NULL components (0/0); downstream comparisons drop
    them."""
    from .let import bind

    v = F.col(vec_col)
    return df.withColumn(
        out_col,
        bind(norm_decimal(v),
             lambda nrm: F.transform(_to_double(v), lambda x: x / nrm)))
