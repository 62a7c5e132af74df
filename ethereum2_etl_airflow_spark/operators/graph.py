"""Connected components over an edge DataFrame — the clustering step a
near-dedup pipeline needs after pair generation (pairs only say "a≈b";
keeping one survivor per duplicate *group* needs the transitive closure).

The reference has no equivalent (its pipeline stops at per-table loads);
this is part of the LLM-training-data extension mandated by
BASELINE.json.

Algorithm: iterative min-label propagation.  label(v) starts as v; each
round every node takes the min label over its closed neighborhood; the
fixpoint assigns every node the minimum node id of its component.

Scale notes (100 TB near-dup graphs):

- each round is ONE shuffle join (symmetric edges × labels, both keyed by
  node id) + a map-side-combining groupBy — no driver-side graph state;
- the edge list is cached once and reused every round; labels are
  ``localCheckpoint``-ed per round so the plan/lineage stays O(1) deep
  instead of O(rounds);
- convergence is O(max component diameter) rounds.  Near-dup components
  are star-ish (a survivor plus its variants) with tiny diameters, so
  this converges in a handful of rounds; the alternating
  large-star/small-star scheme (O(log n) rounds on adversarial graphs)
  is the documented upgrade path if components ever chain;
- the convergence probe is ``limit(1)`` over changed labels — it
  short-circuits instead of counting the full frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components"]


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 30) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id reachable from ``node``.
    Deterministic (min is order-free)."""
    sym = (edges.select(F.col(src).cast("long").alias("u"),
                        F.col(dst).cast("long").alias("v"))
           .union(edges.select(F.col(dst).cast("long").alias("u"),
                               F.col(src).cast("long").alias("v")))
           .cache())
    labels = (sym.select(F.col("u").alias("node")).distinct()
              .withColumn("label", F.col("node"))
              .localCheckpoint(eager=True))
    for _ in range(max_iter):
        neigh = (sym.join(labels.withColumnRenamed("node", "v"), "v")
                 .groupBy("u").agg(F.min("label").alias("nl"))
                 .withColumnRenamed("u", "node"))
        new = (labels.join(neigh, "node", "left")
               .select("node",
                       F.least(F.col("label"),
                               F.coalesce("nl", "label")).alias("label"))
               .localCheckpoint(eager=True))
        changed = (new.alias("n")
                   .join(labels.alias("o"), "node")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new
        if changed == 0:
            break
    sym.unpersist()
    return labels.select("node", F.col("label").alias("component"))
