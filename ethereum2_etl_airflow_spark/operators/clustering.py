"""Distributed k-means clustering over embedding columns — the corpus
organizer of an LLM data pipeline (cluster-balanced sampling, per-topic
mixing quotas, SemDeDup's own cell structure all start from "cluster
the embedding space").  The reference repo has no equivalent; this is
part of the LLM-training-data extension mandated by BASELINE.json.

Lloyd's algorithm, made deterministic and oracle-exact by the same
recipe as :func:`~.dedup.semantic_dedup` / :func:`~.similarity.pq_topk`
— no float accumulation anywhere:

- vectors are int8 floor-quantized per vector (exact IEEE double math,
  identical on every engine — :func:`~.curation.quantize_embeddings`);
- seeds are the ``k`` corpus vectors with the smallest ``(md5(id), id)``
  — deterministic, layout-invariant, no ``rand()``;
- distances are integer L2 (Σ(q−c)² over BIGINT — exact);
- assignment ties break toward the lower cluster rank
  (min-of-structs);
- centroid updates are element-wise TRUNCATING integer means
  (``sum div count`` — Spark ``div`` and DuckDB ``//`` both truncate
  toward zero, so the unrolled-CTE oracle matches bit-for-bit);
- the iteration count is FIXED, not convergence-probed (the
  :func:`~.graph.pagerank_int` rule: a fixed count unrolls to an exact
  SQL oracle; callers needing the fixpoint raise ``n_iter``).

Scale shape (100 TB corpus, N vectors × dim):

- each round is ONE broadcast cross join of the corpus against the
  k×dim centroid table collapsed by a partial-aggregating
  min-of-structs (no corpus shuffle — the N·k candidate stream dies
  map-side), plus ONE map-side-combining groupBy of N·dim (cluster,
  pos) rows for the update;
- centroids are the only iterative state: k×dim integers, kept as a
  ``localCheckpoint``-ed DataFrame per round (lineage stays O(1)), never
  collected to the driver;
- the corpus is quantized once and cached; released on finalize.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..functions.layout import ensure_parallelism, finalize_release

__all__ = ["kmeans_int", "kmeans_fit", "kmeans_assign",
           "cluster_balanced_sample"]


def _quantized(emb: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, q: array<long>) — per-vector int8 floor-quantization, array
    form (the exploded form is :func:`~.curation.quantize_embeddings`)."""
    x = F.col(vec_col)
    maxabs = F.array_max(F.transform(x, lambda e: F.abs(e.cast("double"))))
    q8 = F.transform(
        x, lambda e: F.when(F.col("__m") == 0.0, F.lit(0).cast("long"))
        .otherwise(F.floor(e.cast("double") * 127.0 / F.col("__m"))
                   .cast("long")))
    return (emb.withColumn("__m", maxabs)
            .select(F.col(id_col), q8.alias("q")))


def _d2():
    """Integer L2² between the row's ``q`` and a centroid row's ``cq``."""
    return F.aggregate(
        F.zip_with("q", "cq", lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def _assign(qdf: DataFrame, centroids: DataFrame,
            id_col: str) -> DataFrame:
    """(id, q, cluster, dist2) — broadcast cross join + partial-
    aggregating min-of-structs: the N·k candidate stream collapses
    inside each map task, the corpus is never shuffled."""
    return (qdf.crossJoin(F.broadcast(centroids))
            .groupBy(F.col(id_col))
            .agg(F.first("q").alias("q"),
                 F.min(F.struct(_d2().alias("d"), F.col("r")))
                 .alias("b"))
            .select(id_col, "q", F.col("b.r").alias("cluster"),
                    F.col("b.d").alias("dist2")))


def kmeans_fit(qdf: DataFrame, k: int, n_iter: int,
               id_col: str = "vec_id") -> DataFrame:
    """Centroids (r, cq) after ``n_iter`` Lloyd's rounds over the
    quantized corpus ``qdf`` (``(id, q)`` — :func:`_quantized`, which
    the caller should cache: the fit scans it once per round).  Seeds
    are the ``k`` rows with the smallest ``(md5(id), id)``; updates are
    element-wise truncating integer means with empty-cluster carry;
    centroids are ``localCheckpoint``-ed per round so lineage stays
    O(1) and the k×dim state never lives on the driver.

    The whole fit runs under a pinned shuffle width sized from
    ``qdf``'s own plan stats (same discipline as the pagerank and BPE
    loops): the update-side shuffles are bounded by k×dim
    partial-aggregate rows per map task, but ``_assign``'s
    ``groupBy(id)`` reduce is CORPUS-sized (one row per vector
    survives map-side combine), so the width must track the corpus —
    a test-scale fit keeps the small floor ``min(8, k)`` while a
    large corpus keeps the session width, and neither pays
    over-partitioning fixed costs × rounds nor squeezes a big
    assignment reduce into 8 tasks.  AQE is pinned off (the width is
    already right; its per-stage materialize→re-optimize adds latency
    × rounds)."""
    from ..functions.layout import pinned_shuffle, plan_width

    hx = F.md5(F.col(id_col).cast("string"))
    with pinned_shuffle(qdf.sparkSession,
                        plan_width(qdf, floor=max(1, min(8, k))),
                        adaptive=False):
        # k seed rows reach one task via limit(k); the single-partition
        # row_number window then only ever sees k rows — not a corpus
        # sort
        cent = (qdf.orderBy(hx, F.col(id_col)).limit(k)
                .select((F.row_number().over(
                    Window.orderBy(hx, F.col(id_col))) - 1).alias("r"),
                    F.col("q").alias("cq"))
                .localCheckpoint(eager=True))
        for _ in range(n_iter):
            asg = _assign(qdf, cent, id_col)
            upd = (asg.select("cluster",
                              F.posexplode("q").alias("pos", "v"))
                   .groupBy("cluster", "pos")
                   .agg(F.expr("sum(v) div count(*)").alias("cv"))
                   .groupBy("cluster")
                   .agg(F.transform(
                       F.sort_array(F.collect_list(
                           F.struct(F.col("pos"), F.col("cv")))),
                       lambda s: s["cv"]).alias("cq_new")))
            cent = (cent.join(upd.withColumnRenamed("cluster", "r"),
                              "r", "left")
                    .select("r", F.coalesce("cq_new", "cq").alias("cq"))
                    .localCheckpoint(eager=True))
    return cent


def kmeans_int(emb: DataFrame, k: int = 4, n_iter: int = 3,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, cluster, dist2) — Lloyd's k-means over int8-quantized
    embeddings: ``n_iter`` rounds of (assign, update) from the
    deterministic md5 seeds, then one final assignment against the
    final centroids.  ``dist2`` is the exact integer L2² to the
    assigned centroid.  A cluster that loses all members keeps its
    previous centroid (deterministic, no reseeding).

    The FINAL assignment runs under the same stats-sized pinned width
    as the fit loop (round-7: it previously executed at session width
    outside the fit's pin — one corpus-sized exchange paying
    session-wide fixed costs at test SFs; the shared outer pin means
    the fit's nested pin simply joins this one)."""
    from ..functions.layout import pinned_shuffle, plan_width

    qdf = ensure_parallelism(_quantized(emb, id_col, vec_col)).cache()
    with pinned_shuffle(qdf.sparkSession,
                        plan_width(qdf, floor=max(1, min(8, k))),
                        adaptive=False):
        cent = kmeans_fit(qdf, k, n_iter, id_col)
        final = _assign(qdf, cent, id_col).select(id_col, "cluster",
                                                  "dist2")
        return finalize_release(final, qdf)


def cluster_balanced_sample(emb: DataFrame, k: int = 4, n_iter: int = 3,
                            per_cluster: int = 10,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """Diversity sampling: k-means the corpus, then keep the
    ``per_cluster`` members with the smallest ``(md5(id), id)`` from
    EACH cluster — a deterministic, embedding-aware stratified sample
    (uniform sampling over-represents the dominant mode; per-cluster
    quotas keep the tails).  Returns (id, cluster, dist2).

    Scale shape: the per-cluster top-n is a window over k partitions —
    with k bounded this is the one deliberately narrow stage, sized by
    the cluster count, not the corpus (same discipline as
    :func:`~.curation.cap_per_key`, which is the escape hatch if k ever
    grows to millions)."""
    asg = kmeans_int(emb, k=k, n_iter=n_iter,
                     id_col=id_col, vec_col=vec_col)
    w = (Window.partitionBy("cluster")
         .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col)))
    return (asg.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= per_cluster)
            .select(id_col, "cluster", "dist2"))


def kmeans_assign(batch: DataFrame, history: DataFrame, k: int = 4,
                  n_iter: int = 3, id_col: str = "vec_id",
                  vec_col: str = "embedding") -> DataFrame:
    """Incremental assignment — the arrival-time companion of
    :func:`kmeans_int` (same contract as the incremental dedup family):
    centroids are fit on HISTORY ONLY, so cell boundaries never drift
    as batches arrive, and each arriving vector gets the cluster / L2²
    it would have received on any other day.  Returns (id, cluster,
    dist2) for the BATCH rows.

    Scale shape: the fit is the usual bounded rounds over history; the
    batch side is ONE broadcast-centroid scan — no join against
    history, no shuffle of either corpus."""
    from ..functions.layout import pinned_shuffle, plan_width

    hq = ensure_parallelism(_quantized(history, id_col, vec_col)).cache()
    cent = kmeans_fit(hq, k, n_iter, id_col)
    bq = _quantized(batch, id_col, vec_col)
    # the batch assignment's exchange is BATCH-sized, not
    # history-sized — pin it to the batch's own stats width (round-7,
    # same discipline as kmeans_int's final assignment)
    with pinned_shuffle(bq.sparkSession,
                        plan_width(bq, floor=max(1, min(8, k))),
                        adaptive=False):
        out = _assign(bq, cent, id_col).select(id_col, "cluster",
                                               "dist2")
        return finalize_release(out, hq)
