"""Stream-static enrichment join — the stateless streaming join shape.

A micro-batch stream joined to a static dimension table needs NO
watermark and NO join state: each micro-batch plans a fresh batch join
against the dimension snapshot (Structured Streaming re-plans the static
side every batch, so a slowly-updated dimension file is re-read without
restarting the query).  This completes the engine's streaming-join
matrix: stream-stream inner (:mod:`.join`), stream-stream left-outer
with watermark-driven null emission, and stream-static here.

Scale: the dimension side should broadcast — the stream side then never
shuffles for the join (narrow, per-batch).  At 1000 executors a
non-broadcast stream-static join would re-shuffle every micro-batch;
the explicit ``F.broadcast`` makes the cheap plan structural, not a
stats accident.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["enrich_with_dim"]


def enrich_with_dim(stream: DataFrame, dim: DataFrame,
                    stream_key: str, dim_key: str,
                    dim_cols: list[str], how: str = "inner") -> DataFrame:
    """Join a (possibly streaming) fact DataFrame to a static broadcast
    dimension.  Stateless: works in append mode with no watermark.

    ``dim_cols`` are the dimension attributes carried onto the fact
    rows (the dim key itself is dropped — the fact key survives)."""
    d = dim.select(F.col(dim_key), *[F.col(c) for c in dim_cols])
    return (stream.join(F.broadcast(d),
                        stream[stream_key] == d[dim_key], how)
            .drop(dim_key))
