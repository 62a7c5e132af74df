"""Skew-mitigation join helpers.

AQE's skew-join splitting (on by default in :mod:`..session`) handles
most skew at runtime, but it only kicks in for sort-merge joins and needs
statistics.  ``salted_join`` is the explicit fallback for pathological
hot keys (the classic 100 TB incident: one user_id owning 10% of a fact
table): the fact side gets a deterministic salt in [0, S), the dimension
side is replicated S times, and the join key becomes (key, salt) — the
hot key's rows spread over S tasks instead of one straggler.

Semantically identical to the unsalted equi-join (inner/left): every fact
row meets exactly one replica of its matching dim row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["salted_join"]

_SALT = "__salt"


def salted_join(fact: DataFrame, dim: DataFrame, on: str,
                how: str = "inner", salt: int = 16) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on column ``on`` with an S-way salt.

    The salt is ``xxhash64(whole fact row) mod S`` — deterministic (reruns
    produce identical partitioning, no RNG in the plan) and independent of
    the join key (so it actually splits the hot key).  ``dim`` is
    replicated S times via an exploded literal range; keep S·|dim| within
    shuffle budget, or broadcast ``dim`` instead and skip salting.
    Supports ``inner`` and ``left`` (fact-preserving) joins.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    fact_s = fact.withColumn(
        _SALT, F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]),
                      F.lit(salt)).cast("int"))
    # explode is a generator — it cannot be nested inside another
    # expression (e.g. a cast), so the column is added bare
    dim_s = dim.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    out = fact_s.join(dim_s, on=[on, _SALT], how=how)
    return out.drop(_SALT)
