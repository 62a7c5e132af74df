"""`bind` — a let-binding combinator for Catalyst expressions.

Catalyst inlines expressions per *reference*: a builder that mentions an
expensive sub-expression N times (or once inside a per-element lambda)
re-evaluates it N times (or per element).  CollapseProject removes any
projection you try to stage it in; caching works but costs a
materialization.

``bind(e, f)`` evaluates ``e`` exactly once per row by binding it to a
higher-order-function lambda variable — variables are evaluated bindings,
not inlined trees::

    bind(tokens(text), lambda t: shingle_builder(t))
    # = element_at(transform(array(tokens(text)), t -> shingle_builder(t)), 1)

Measured on the shingle pipeline (5.5k docs × ~85 shingles × 3-reference
builder): inline 10.5 s → bound 0.39 s, byte-identical output.

Works for any expression type (the value is boxed in a 1-element array).
Nest freely for multiple bindings.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, functions as F

__all__ = ["bind"]


def bind(expr: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once per row; ``body`` receives it as a cheap
    lambda-variable reference."""
    return F.element_at(F.transform(F.array(expr), body), 1)
