"""Vector column math for embedding operators (SURVEY §2.9 X3).

The dot-product kernel accumulates in DECIMAL so the sum is
order-independent and bit-identical across engines (a float sum's value
depends on accumulation order; decimal addition is exact).  Per-element
products are computed in DOUBLE (IEEE, deterministic) then rounded once
to DECIMAL(28,14) — binary floats can never tie at a decimal rounding
boundary, so the rounding is unambiguous.

Everything is ``F.zip_with`` / ``F.aggregate`` column expressions —
JVM-side, no UDF, no data movement beyond the surrounding join.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

__all__ = ["dot_decimal", "norm_decimal", "cosine_decimal"]

_DEC = "decimal(28,14)"


def _to_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot_decimal(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with decimal accumulation; returns DOUBLE."""
    prods = F.zip_with(_to_double(a), _to_double(b),
                       lambda x, y: (x * y).cast(_DEC))
    # re-cast each partial sum so the accumulator type stays DECIMAL(28,14)
    return F.aggregate(prods, F.lit(0).cast(_DEC),
                       lambda acc, v: (acc + v).cast(_DEC)).cast("double")


def norm_decimal(a: Column) -> Column:
    """‖a‖₂ — decimal-accumulated sum of squares, sqrt in double."""
    ad = _to_double(a)
    ss = F.aggregate(F.transform(ad, lambda x: (x * x).cast(_DEC)),
                     F.lit(0).cast(_DEC), lambda acc, v: (acc + v).cast(_DEC))
    return F.sqrt(ss.cast("double"))


def cosine_decimal(a: Column, b: Column) -> Column:
    """cos(a, b) in DOUBLE, deterministic given identical float inputs."""
    return dot_decimal(a, b) / (norm_decimal(a) * norm_decimal(b))
