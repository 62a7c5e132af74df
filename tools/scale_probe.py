"""Scale-up probe — docs/SCALE.md's data source.

Holds the machine constant and scales the DATA: unions the sf tables N
times with disjoint id ranges, materializes the layout, then times a
scan-bound aggregate, the exact-dedup groupBy, the MinHash LSH pipeline,
and the Gopher filter at each factor (warm once, min of 2).  Sub-linear
or linear growth is the pass condition; super-linear growth would mean a
quadratic join / one-task window / driver loop hiding in the operator.

``--graph`` probes the graph batch instead: the part co-purchase edge
list scales as N disjoint copies of the subgraph (both endpoint ids
shifted), then triangle_counts / pagerank_int / kcore_peel /
random_walks are timed at each factor — the measurement behind the
m^1.5 wedge bound and the O(1)-lineage iterative claims in
docs/SCALE.md.

    python tools/scale_probe.py [--sf-dir /root/testdata/sf0.1] \
        [--factors 1,4,16] [--graph]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--graph", action="store_true",
                    help="probe the graph operator batch instead")
    ap.add_argument("--ann", action="store_true",
                    help="probe the similarity/ANN operator batch instead")
    ap.add_argument("--curation", action="store_true",
                    help="probe the curation/tokenizer batch instead")
    ap.add_argument("--lm", action="store_true",
                    help="probe the LM-scoring/clustering batch instead")
    ap.add_argument("--stream", action="store_true",
                    help="probe the streaming family instead (wall + "
                         "state-store rows per factor)")
    ap.add_argument("--retrieval", action="store_true",
                    help="probe the lexical-retrieval family instead")
    ap.add_argument("--parts", default="",
                    help="comma list of state-partition counts for "
                         "--stream-parts (default 4,8,16,32 — the "
                         "documented sweep incl. the 32-point row)")
    ap.add_argument("--r10", action="store_true",
                    help="scale rows for the round-10 ops "
                         "(hard_negatives, quality_prune, "
                         "weighted_sample, IVF index build/serve)")
    ap.add_argument("--r11", action="store_true",
                    help="scale rows for the round-11 ops "
                         "(plan_shards, span_corrupt, dialogue_turns, "
                         "allocate_budget, markdown_extract)")
    ap.add_argument("--stream-parts", action="store_true",
                    help="probe the stateful-partition-count axis of the "
                         "streaming family at one key-volume factor")
    ap.add_argument("--qaxis", action="store_true",
                    help="probe the QUERY-COUNT axis of the serving "
                         "family (hard_negatives, query_ivf_index, "
                         "bm25_topk_from_index) at fixed corpus size")
    ap.add_argument("--queries", default="5,50,500",
                    help="comma list of |Q| points for --qaxis")
    ap.add_argument("--cpu-axis", action="store_true",
                    help="8-vs-32-core sweep over --cpu-queries "
                         "(round-11 verdict item 7: the driver's c8/c32 "
                         "comparison needs a same-epoch repo-side "
                         "counterpart)")
    ap.add_argument("--cpus", default="8,32",
                    help="comma list of core counts for --cpu-axis")
    ap.add_argument("--cpu-queries",
                    default="bm25_expanded,sessionize_stream,"
                            "dedup_clusters_star,sim_ivf,stream_join,"
                            "stream_join_outer,dedup_survivors,"
                            "triangle_count,query_expansion,pagerank",
                    help="comma list of check names for --cpu-axis")
    args = ap.parse_args()

    if args.cpu_axis:
        cpu_axis_probe(args)
        return
    if args.qaxis:
        qaxis_probe(args)
        return

    if args.stream_parts:
        stream_parts_probe(args)
        return
    if args.stream:
        stream_probe(args)
        return
    if args.retrieval:
        retrieval_probe(args)
        return

    if args.graph:
        graph_probe(args)
        return
    if args.ann:
        ann_probe(args)
        return
    if args.curation:
        curation_probe(args)
        return
    if args.r10:
        r10_probe(args)
        return
    if args.r11:
        r11_probe(args)
        return
    if args.lm:
        lm_probe(args)
        return

    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators import dedup as D
    from ethereum2_etl_airflow_spark.operators import text as X
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    spark = build_session(app_name="scale-probe")

    def scaled(df, n: int, idcol: str):
        out = None
        for i in range(n):
            d = df.withColumn(idcol, F.col(idcol) + F.lit(i * 50_000_000))
            out = d if out is None else out.unionByName(d)
        return out

    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()
    li = (load_table(spark, args.sf_dir, "lineitem")
          .select("l_orderkey", "l_partkey", "l_quantity",
                  "l_extendedprice", "l_returnflag", "l_linestatus")
          .cache())
    li.count()

    def best2(fn) -> float:
        fn()  # warm: codegen compiled, broadcasts built
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        sd = scaled(docs, n, "doc_id").localCheckpoint(eager=True)
        sl = scaled(li, n, "l_orderkey").localCheckpoint(eager=True)
        r1 = best2(lambda: noop(
            sl.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.avg("l_extendedprice"),
                 F.count("*"))))
        r2 = best2(lambda: noop(D.dedup_exact(sd)))
        r3 = best2(lambda: noop(D.minhash_exact_pairs(sd)))
        r4 = best2(lambda: noop(X.gopher_filter(sd)))
        from ethereum2_etl_airflow_spark.operators.scoring import (
            hashed_linear_score)
        r5 = best2(lambda: noop(hashed_linear_score(sd)))
        r6 = best2(lambda: noop(D.repeated_ngram_spans(sd)))
        print(f"SCALE n={n} li={sl.count()} docs={sd.count()} "
              f"q1={r1} dedup_exact={r2} minhash={r3} gopher={r4} "
              f"linear_score={r5} repeated_spans={r6}",
              flush=True)
    spark.stop()


def curation_probe(args) -> None:
    """Scale the documents corpus as N disjoint-id copies (sources
    disjoint per copy so per-key row counts stay constant while key
    count scales) and time the curation/tokenizer batch.  Expected
    shapes: pii_scrub is a narrow codegen map (linear); cap_per_key is
    two-phase partial-cap + window over ≤ cap·P survivors (linear, no
    dominant-key sort); bin_by_quantile is one sketch-sized cutpoint
    aggregate + a narrow assignment (linear); pack_offsets is the
    distributed prefix-sum (linear, one extra exchange); bpe_train
    collapses the corpus to a (word, freq) table ONCE, so extra copies
    of the same text change the freq VALUES, not the table size —
    near-flat is the expected reading, and the fixed per-merge argmax
    floor dominates."""
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators import curation as C
    from ethereum2_etl_airflow_spark.operators.tokenizer import bpe_train
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(app_name="scale-probe-curation")
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        docs.cache().count()
        sd = None
        for i in range(n):
            d = (docs.withColumn("doc_id", F.col("doc_id")
                                 + F.lit(i * 50_000_000))
                 .withColumn("source", F.concat(F.col("source"),
                                                F.lit(f"#{i}"))))
            sd = d if sd is None else sd.unionByName(d)
        sd = sd.localCheckpoint(eager=True)
        nd = sd.count()
        r_pii = best2(lambda: noop(C.pii_scrub(sd)))
        r_cap = best2(lambda: noop(
            C.cap_per_key(sd, "source", "doc_id", cap=50)))
        r_bin = best2(lambda: noop(C.bin_by_quantile(sd, "n_chars")))
        r_pack = best2(lambda: noop(C.pack_offsets(sd)))
        r_bpe = best2(lambda: bpe_train(sd, n_merges=4))
        print(f"SCALE-CURATION n={n} docs={nd} pii_scrub={r_pii} "
              f"cap_per_key={r_cap} bin_quantile={r_bin} "
              f"pack_offsets={r_pack} bpe_train4={r_bpe}", flush=True)
    spark.stop()


def ann_probe(args) -> None:
    """Scale the embedding corpus (and, for the text-sparse op, the
    documents corpus) as N disjoint-id copies and time the
    similarity/ANN batch.  What each shape should show:

    - ``pq_topk`` / ``retrieval_topk``: the corpus side is a pure
      codegen scan (codes/LUTs are bounded driver literals) → linear;
      the driver-side constant (codebook collect + plan build) shows
      up as a flat intercept, NOT a slope.
    - ``embed_neardup`` / ``semantic_dedup``: the quadratic GEMM is
      bounded per block/cell, so with block cardinality scaled along
      with the data (disjoint labels per copy; n_cells ∝ n) growth is
      linear in blocks — the documented memory contract in action.
    - ``sparse_cosine_pairs``: PPJoin-style prefix filtering over
      blocked docs — same blocked-linear expectation.
    """
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators import dedup as D
    from ethereum2_etl_airflow_spark.operators import similarity as S
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(app_name="scale-probe-ann")

    emb = load_table(spark, args.sf_dir, "embeddings").cache()
    emb.count()
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        emb.cache().count()
        docs.cache().count()
        # disjoint ids per copy; labels/sources disjoint per copy too,
        # so block SIZE stays constant while block COUNT scales — the
        # contract under which the blocked-quadratic ops claim linear.
        # Embeddings are ROTATED per copy (cyclic shift by the copy
        # index): identical copies would be exact semantic twins, and
        # the near-dup/semantic ops would then measure TRUE-PAIR mass
        # growing quadratically with the factor (data semantics, not a
        # plan defect — first sweep measured exactly that); rotation
        # preserves norms and the value distribution while making the
        # copies mutually dissimilar, so dup density per copy stays
        # constant and the probe isolates the scan/GEMM scaling.
        se = None
        for i in range(n):
            rot = (F.concat(F.slice("embedding", i + 1, 64 - i),
                            F.slice("embedding", 1, i))
                   if i else F.col("embedding"))
            d = emb.select((F.col("vec_id") + F.lit(i * 50_000_000))
                           .alias("vec_id"), rot.alias("embedding"),
                           (F.col("label") + F.lit(i * 1000)).alias("label"))
            se = d if se is None else se.unionByName(d)
        se = se.localCheckpoint(eager=True)
        sd = None
        for i in range(n):
            d = docs.withColumn("doc_id", F.col("doc_id")
                                + F.lit(i * 50_000_000)) \
                .withColumn("source", F.concat(F.col("source"),
                                               F.lit(f"#{i}")))
            sd = d if sd is None else sd.unionByName(d)
        sd = sd.localCheckpoint(eager=True)
        nrows = se.count()
        r_pq = best2(lambda: noop(S.pq_topk(se, [1, 2, 3], k=10)))
        r_rt = best2(lambda: noop(
            S.retrieval_topk(se, [1, 2, 3], k=10, shortlist=50)))
        r_nd = best2(lambda: noop(
            D.cosine_near_dup_pairs(se, block_col="label",
                                    threshold_millis=999)))
        # cells scale with sqrt(data) — the FAISS IVF discipline: cell
        # assignment costs N·n_cells and the per-cell GEMM costs
        # N²/n_cells, so n_cells ∝ √N balances both at N^1.5 total
        # (linear per-core once the cluster grows with the data)
        ncells = 8 * max(1, int(n ** 0.5))
        r_sem = best2(lambda: noop(
            D.semantic_dedup(se, n_cells=ncells, threshold_millis=950)))
        r_sc = best2(lambda: noop(
            S.sparse_cosine_pairs(sd, threshold_millis=650)))
        print(f"SCALE-ANN n={n} vecs={nrows} sim_pq={r_pq} "
              f"retrieval_topk={r_rt} embed_neardup={r_nd} "
              f"semantic_dedup={r_sem} sparse_cosine={r_sc}", flush=True)
    spark.stop()


def lm_probe(args) -> None:
    """Scale documents / embeddings as N disjoint-id copies and time the
    LM-scoring + clustering batch (X69/X70).  Expected shapes:

    - ``perplexity_scores``: copies repeat the SAME text, so the model
      tables (vocab-sized) stay CONSTANT while the scored corpus scales
      — the sub-linear-model/linear-scoring claim in operators/lm.py.
      Scoring is two joins + one agg → linear in corpus rows.
    - ``kmeans_int``: per round one broadcast crossJoin collapsed by a
      partial agg (N·k map-side) + one combining (cluster, pos) groupBy
      (N·dim rows) → linear; the k×dim centroid state is constant.
    - ``cluster_balanced_sample``: adds a k-partition window over the
      assignment → same linear envelope.

    Embeddings are rotated per copy (the ANN-probe trick) so cluster
    geometry stays non-degenerate as copies multiply."""
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.clustering import (
        cluster_balanced_sample, kmeans_int)
    from ethereum2_etl_airflow_spark.operators.lm import perplexity_scores
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(app_name="scale-probe-lm")
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()
    emb = load_table(spark, args.sf_dir, "embeddings").cache()
    emb.count()

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        docs.cache().count()
        emb.cache().count()
        sd = None
        for i in range(n):
            d = docs.withColumn("doc_id",
                                F.col("doc_id") + F.lit(i * 50_000_000))
            sd = d if sd is None else sd.unionByName(d)
        sd = sd.localCheckpoint(eager=True)
        se = None
        for i in range(n):
            rot = (F.concat(F.slice("embedding", i + 1, 64 - i),
                            F.slice("embedding", 1, i))
                   if i else F.col("embedding"))
            d = emb.select((F.col("vec_id") + F.lit(i * 50_000_000))
                           .alias("vec_id"), rot.alias("embedding"))
            se = d if se is None else se.unionByName(d)
        se = se.localCheckpoint(eager=True)
        nd, ne = sd.count(), se.count()
        r_ppl = best2(lambda: noop(
            perplexity_scores(sd.where("doc_id % 2 = 1"),
                              sd.where("doc_id % 2 = 0"))))
        r_km = best2(lambda: noop(kmeans_int(se, k=8, n_iter=3)))
        r_cs = best2(lambda: noop(
            cluster_balanced_sample(se, k=8, n_iter=3, per_cluster=20)))
        # divergence: |S| and vocab stay constant under doc copies, so
        # the pair stage is fixed-size and only the corpus-side
        # tokenize+count groupBy should grow -> near-flat expected
        from ethereum2_etl_airflow_spark.operators.lm import (
            dsir_logratio_bits, source_unigram_divergence)

        r_div = best2(lambda: noop(source_unigram_divergence(sd)))
        r_dsir = best2(lambda: noop(
            dsir_logratio_bits(sd.where("doc_id % 10 != 0"),
                               sd.where("doc_id % 10 = 0"))))
        print(f"SCALE-LM n={n} docs={nd} vecs={ne} "
              f"lm_perplexity={r_ppl} kmeans={r_km} "
              f"cluster_sample={r_cs} source_div={r_div} "
              f"dsir={r_dsir}", flush=True)
    spark.stop()


def retrieval_probe(args) -> None:
    """Scale the documents corpus as N disjoint-id copies (per-copy text
    suffix so the vocabulary grows mildly and dl shifts slightly — pure
    identical copies would leave every per-doc stat bit-identical) and
    time the round-8 lexical-retrieval family.  Expected shapes:

    - ``bm25_topk``: the dl projection + query-term-filtered fan-out +
      one combining groupBy are all linear in corpus rows; the corpus
      N/T aggregate is a second linear scan — slope ~2 scans, no
      quadratic stage (the scored stream is bounded by docs matching a
      query term).
    - ``impact_postings``: the full (doc, term) tf table + per-term cap
      — linear in token occurrences; the two-phase cap keeps stopword
      terms from sorting in one task, so no skew wall.
    - ``mmr_topk``: shortlist pass linear; the greedy is a bounded
      driver artifact — expected FLAT in corpus size beyond the scan.
    """
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.similarity import mmr_topk
    from ethereum2_etl_airflow_spark.operators.text import (
        bm25_topk, impact_postings)
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(app_name="scale-probe-retrieval")
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()
    emb = load_table(spark, args.sf_dir, "embeddings").cache()
    emb.count()
    queries = {1: ["dup", "hash"], 2: ["dup", "vector", "scan"],
               3: ["dup", "customer"]}

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        docs.cache().count()
        sd = None
        for i in range(n):
            d = (docs.withColumn("doc_id",
                                 F.col("doc_id") + F.lit(i * 50_000_000))
                 .withColumn("text", F.concat("text", F.lit(f" copy{i}"))))
            sd = d if sd is None else sd.unionByName(d)
        sd = sd.localCheckpoint(eager=True)
        se = None
        for i in range(n):
            rot = (F.concat(F.slice("embedding", i + 1, 64 - i),
                            F.slice("embedding", 1, i))
                   if i else F.col("embedding"))
            d = emb.select((F.col("vec_id") + F.lit(i * 50_000_000))
                           .alias("vec_id"), rot.alias("embedding"))
            se = d if se is None else se.unionByName(d)
        se = se.localCheckpoint(eager=True)
        nd = sd.count()
        r_bm = best2(lambda: noop(bm25_topk(sd, queries, k=10)))
        r_ii = best2(lambda: noop(impact_postings(sd, k=8)))
        r_mm = best2(lambda: noop(mmr_topk(se, [1, 2, 3], k=8,
                                           shortlist=16)))
        # round-9 additions: passage extraction over a fixed retrieved
        # ranking (the op's own cost, ranking precomputed once), and
        # the full two-pass PRF expansion
        from ethereum2_etl_airflow_spark.operators.text import (
            best_passages, expand_queries)

        ranking = bm25_topk(sd, queries, k=10)  # already materialized
        r_ps = best2(lambda: noop(
            best_passages(sd, ranking, queries, w=16)))
        r_ex = best2(lambda: noop(
            expand_queries(sd, queries, k_fb=5, m_exp=3, k=10)))
        print(f"SCALE-RETRIEVAL n={n} docs={nd} bm25={r_bm} "
              f"impact_index={r_ii} mmr={r_mm} passages={r_ps} "
              f"expand={r_ex}", flush=True)
    spark.stop()




def r11_probe(args) -> None:
    """Measured scale rows for the round-11 ops.  Expected shapes:

    - ``plan_shards``: range exchange + two narrow passes + a ≤ P-row
      collect — linear in rows (the rank is a prefix COUNT, never a
      one-task window);
    - ``span_corrupt``: explode + windows + one combining groupBy on
      the doc key — linear in token volume;
    - ``dialogue_turns``: ONE hash exchange on the user key, windows
      and listagg ride the same clustering — linear in events;
    - ``allocate_budget``: map-side-combining groupBy to the bounded
      source catalog — linear scan, constant-size tail;
    - ``markdown_extract``: pure narrow regexp map — parquet-scan
      bound.
    """
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.curation import (
        allocate_budget, dialogue_turns, plan_shards, span_corrupt)
    from ethereum2_etl_airflow_spark.operators.text import markdown_extract
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(app_name="scale-probe-r11")
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()
    ev = load_table(spark, args.sf_dir, "events").cache()
    ev.count()

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        docs.cache().count()
        ev.cache().count()
        sd = None
        for i in range(n):
            d = docs.withColumn("doc_id", F.col("doc_id")
                                + F.lit(i * 50_000_000))
            sd = d if sd is None else sd.unionByName(d)
        sd = sd.localCheckpoint(eager=True)
        se = None
        for i in range(n):
            # shift both the id space and the user space so sessions
            # scale as disjoint users, not longer per-user histories
            d = (ev.withColumn("event_id", F.col("event_id")
                               + F.lit(i * 50_000_000))
                 .withColumn("user_id", F.col("user_id")
                             + F.lit(i * 1_000_000)))
            se = d if se is None else se.unionByName(d)
        se = se.localCheckpoint(eager=True)

        r1 = best2(lambda: noop(plan_shards(sd)))
        r2 = best2(lambda: noop(span_corrupt(
            sd.where(F.col("doc_id") % 7 == 0))))
        r3 = best2(lambda: noop(dialogue_turns(se)))
        r4 = best2(lambda: noop(allocate_budget(sd, budget=1_000_000)))
        md = sd.select("doc_id", F.concat(
            F.lit("# H\n\n[l](u) `c`\n\n```\nx\n```\n\n"),
            F.col("text")).alias("md"))
        r5 = best2(lambda: noop(markdown_extract(md)))
        print(f"factor={n} plan_shards={r1}s span_corrupt={r2}s "
              f"dialogue_turns={r3}s allocate_budget={r4}s "
              f"markdown_extract={r5}s", flush=True)


def r10_probe(args) -> None:
    """Measured scale rows for the round-10 ops.  Expected shapes:

    - ``hard_negatives``: one bruteforce top-(k+1) pass — linear in
      corpus rows (|Q| fixed; scoring is a broadcast-probe scan, the
      only shuffle is the two-phase rank over ≤ (k+1)·P survivors);
    - ``quality_prune``: one hash exchange on the group key + per-group
      sort — linear (sort inside fixed group count);
    - ``weighted_sample``: narrow priority map + TakeOrdered partial
      top-n — linear scan, driver merge bounded by n·P;
    - ``ivf build``: one fit (bounded rounds) + one corpus write —
      linear; ``ivf serve``: reads ~n_probe/n_cells of the index files
      (DPP) — slope ~corpus/4 at n_cells=8, n_probe=2.
    """
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.curation import (
        prune_bottom_quantile, weighted_sample)
    from ethereum2_etl_airflow_spark.operators.similarity import (
        build_ivf_index, hard_negatives, query_ivf_index)
    from ethereum2_etl_airflow_spark.operators.text import token_count
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(app_name="scale-probe-r10")
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()
    emb = load_table(spark, args.sf_dir, "embeddings").cache()
    emb.count()

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        import gc

        gc.collect()
        spark.catalog.clearCache()
        docs.cache().count()
        emb.cache().count()
        # embedding family first, docs family after: the two scaled
        # checkpoints co-resident would tax each other's measurements
        # with GC/memory pressure at high factors (round-10: observed
        # 7.2 s isolated vs 23 s co-resident for hard_negatives at 64x)
        se = None
        for i in range(n):
            rot = (F.concat(F.slice("embedding", i + 1, 64 - i),
                            F.slice("embedding", 1, i))
                   if i else F.col("embedding"))
            d = emb.select((F.col("vec_id") + F.lit(i * 50_000_000))
                           .alias("vec_id"), rot.alias("embedding"))
            se = d if se is None else se.unionByName(d)
        se = se.localCheckpoint(eager=True)
        ne = se.count()
        r_hn = best2(lambda: noop(hard_negatives(
            se, {q: q + 1 for q in range(5)}, k=5)))
        root = tempfile.mkdtemp(prefix="e2etl_ivf_probe_")
        t0 = time.time()
        build_ivf_index(se, root, n_cells=8, n_iter=2)
        r_build = round(time.time() - t0, 2)
        r_serve = best2(lambda: noop(query_ivf_index(
            spark, root, [0, 1, 2, 3, 4], k=10, n_probe=2)))
        shutil.rmtree(root, ignore_errors=True)
        se = None
        gc.collect()
        spark.catalog.clearCache()
        docs.cache().count()
        sd = None
        for i in range(n):
            d = (docs.withColumn("doc_id",
                                 F.col("doc_id") + F.lit(i * 50_000_000))
                 .withColumn("text", F.concat("text", F.lit(f" c{i}"))))
            sd = d if sd is None else sd.unionByName(d)
        sd = sd.localCheckpoint(eager=True)
        nd = sd.count()
        scored = sd.select("source", "doc_id",
                           token_count(F.col("text")).alias("score"))
        r_qp = best2(lambda: noop(prune_bottom_quantile(
            scored, "source", "score")))
        wdf = sd.select("doc_id", (F.col("doc_id") % 10 + 1).alias("w"))
        r_ws = best2(lambda: noop(weighted_sample(wdf, n=200,
                                                  weight_col="w")))
        print(f"SCALE-R10 n={n} docs={nd} vecs={ne} "
              f"hard_negatives={r_hn} quality_prune={r_qp} "
              f"weighted_sample={r_ws} ivf_build={r_build} "
              f"ivf_serve={r_serve}", flush=True)
    spark.stop()


def qaxis_probe(args) -> None:
    """|Q| axis of the serving family (round-11, VERDICT item 6): the
    corpus sweeps pin cost vs DATA; serving cost also scales with the
    QUERY batch, and the bounded-artifact claims need that axis
    measured too.  Expected shapes at fixed corpus:

    - ``hard_negatives``: the scoring scan does |Q|·N dots behind a
      broadcast of the |Q|-row query/positive tables — wall is
      corpus-scan-bound at small |Q| and grows ~linearly once |Q|·N
      dominates; the rank stage stays ≤ (k+1)·P rows per query.
    - ``query_ivf_index`` (vector mode — literal queries, zero lookup
      scan): probes = |Q|·n_probe rows broadcast; files read bounded
      by the UNION of probed cells (≤ n_cells directories regardless
      of |Q|), so wall saturates once every cell is probed by some
      query — the DPP claim on the query axis.
    - ``bm25_topk_from_index``: the term filter is the union of query
      terms — the index scan is ONE pass whatever |Q| is; per-query
      cost is the posting-sum aggregation (|hit postings| rows).
    """
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.similarity import (
        build_ivf_index, hard_negatives, query_ivf_index)
    from ethereum2_etl_airflow_spark.operators.text import (
        bm25_topk_from_index, impact_postings, tokens)
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    import shutil
    import tempfile

    spark = build_session(app_name="scale-probe-qaxis")
    emb = load_table(spark, args.sf_dir, "embeddings").cache()
    n_vec = emb.count()
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    root = tempfile.mkdtemp(prefix="e2etl_qaxis_ivf_")
    build_ivf_index(emb, root, n_cells=8, n_iter=2)
    # literal query vectors: every 3rd corpus embedding, rotated ids
    all_vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
                for r in emb.where(F.col("vec_id") % 3 == 0)
                .orderBy("vec_id").limit(600).collect()}
    vec_ids = sorted(all_vecs)
    # query terms: distinct tokens by document order (deterministic)
    toks = [r["t"] for r in
            docs.select(F.explode(tokens(F.col("text"))).alias("t"))
            .groupBy("t").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "t").limit(1200).collect()]
    index = impact_postings(docs, k=64).localCheckpoint(eager=True)
    for nq in [int(x) for x in args.queries.split(",")]:
        qids = vec_ids[:nq]
        r_hn = best2(lambda: noop(hard_negatives(
            emb, {q: (q + 1) % n_vec for q in qids}, k=5)))
        qvecs = {q: all_vecs[q] for q in qids}
        r_ivf = best2(lambda: noop(query_ivf_index(
            spark, root, k=10, n_probe=2, query_vectors=qvecs)))
        tq = {i: [toks[(2 * i) % len(toks)],
                  toks[(2 * i + 1) % len(toks)]] for i in range(nq)}
        r_bm = best2(lambda: noop(bm25_topk_from_index(index, tq, k=10)))
        print(f"SCALE-QAXIS |Q|={nq} vecs={n_vec} "
              f"hard_negatives={r_hn} ivf_serve_vec={r_ivf} "
              f"bm25_from_index={r_bm}", flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def stream_parts_probe(args) -> None:
    """The state-PARTITION axis of the streaming family (round-9 verdict
    item 8): the key-volume/history sweeps hold the stateful partition
    count at the measured sweet spot (STATE_PARTITIONS=4); this probe
    varies it (4/8/16 by default) at ONE key-volume factor (64× by
    default — the heaviest measured point) so the knob's own scaling
    story is pinned experimentally, the way the kcore scratch A/B
    pinned the spill story.  Two regimes compete: per-micro-batch
    state-store lifecycle cost (open/commit/fsync per partition per
    batch) RISES with partitions, while per-batch processing
    parallelism rises too.  At 1x volume (round-6 sweep) the lifecycle
    cost dominates -> 4 partitions beat 8; MEASURED at 64x (this
    probe, 2026-08-16) the per-event work dominates and the ordering
    inverts: 4 -> 188.9 s, 8 -> 113.3 s, 16 -> 63.1 s, 32 -> 46.8 s —
    the partition count must TRACK key volume, which is exactly the
    "size to live key cardinality" deployment rule stated in
    streaming/__init__.  State rows are partition-invariant (96 000 at
    every setting — state is keyed, not replicated), and so is the
    session count within one dataset build."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table
    from ethereum2_etl_airflow_spark.streaming import run_bounded
    from ethereum2_etl_airflow_spark.streaming.sessionize import (
        sessionize_stream)

    spark = build_session(app_name="scale-probe-stream-parts")
    events = load_table(spark, args.sf_dir, "events").cache()
    events.count()
    root = tempfile.mkdtemp(prefix="e2etl_spparts_")
    n = int(args.factors.split(",")[0]) if args.factors else 64

    ev = None
    for i in range(n):
        d = (events.select(
            (F.col("user_id") + F.lit(i * 50_000_000)).alias("user_id"),
            "ts", "value"))
        ev = d if ev is None else ev.unionByName(d)
    ev_path = os.path.join(root, f"ev{n}")
    ev.repartition(8).write.mode("overwrite").parquet(ev_path)
    n_ev = spark.read.parquet(ev_path).count()

    def file_stream(path: str, mfpt: int):
        return (spark.readStream
                .schema(spark.read.parquet(path).schema)
                .option("maxFilesPerTrigger", mfpt).parquet(path))

    parts_list = (tuple(int(p) for p in args.parts.split(","))
                  if getattr(args, "parts", "") else (4, 8, 16, 32))
    for parts in parts_list:
        import gc

        gc.collect()
        prog: list = []
        t0 = time.time()
        sess = sessionize_stream(file_stream(ev_path, 2),
                                 gap_s=6 * 3600, watermark="1 hour")
        out = run_bounded(sess, spark, mode="append", n=parts,
                          prefix=f"spp{parts}", progress_out=prog)
        n_sess = out.count()
        w = round(time.time() - t0, 2)
        per_batch = [sum(op.get("numRowsTotal", 0)
                         for op in p.get("stateOperators", []))
                     for p in prog]
        per_batch = [x for x in per_batch if x] or [0]
        print(f"SCALE-STREAM-PARTS n={n} events={n_ev} parts={parts} "
              f"wall={w} sessions={n_sess} state_max={max(per_batch)}",
              flush=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def stream_probe(args) -> None:
    """Measured scale rows for the streaming family — the walls AND the
    state-store row counts behind docs/SCALE.md's watermark/active-key
    bound claims, on two axes:

    - **Key-volume axis** (same time range, key cardinality ×N):
      ``sessionize_stream`` over events with per-copy-shifted user ids —
      the claim is one open session per ACTIVE KEY, so state rows must
      track N; ``cms_build`` in complete mode over docs ×N — the claim
      is a CONSTANT d·w counter table however large the input.  Both
      stream as 8 files / maxFilesPerTrigger 2, so the micro-batch
      count is constant and the wall isolates per-batch data growth.
    - **History axis** (same per-epoch content, N disjoint time epochs
      arriving in event-time order): ``dedup_stream``'s
      dropDuplicatesWithinWatermark — the claim is state bounded by the
      WATERMARK HORIZON, not history, so the max state rows across the
      run must stay ~one epoch's fingerprints while total input grows
      ×N.  One file per epoch, maxFilesPerTrigger=1 (the file source
      processes in mtime order), so the watermark advances epoch by
      epoch and expires the previous epoch's state.

    State readings come from the engine's own progress stream
    (``stateOperators[].numRowsTotal`` — run_bounded's progress_out)."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.quality import cms_build
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table
    from ethereum2_etl_airflow_spark.streaming import run_bounded
    from ethereum2_etl_airflow_spark.streaming.dedup import dedup_stream
    from ethereum2_etl_airflow_spark.streaming.sessionize import (
        sessionize_stream)

    spark = build_session(app_name="scale-probe-stream")
    events = load_table(spark, args.sf_dir, "events").cache()
    events.count()
    docs = load_table(spark, args.sf_dir, "documents").cache()
    docs.count()
    root = tempfile.mkdtemp(prefix="e2etl_sprobe_")

    def state_rows(progress: list) -> tuple[int, int]:
        """(max, final) total state rows across micro-batches."""
        per_batch = [sum(op.get("numRowsTotal", 0)
                         for op in p.get("stateOperators", []))
                     for p in progress]
        per_batch = [n for n in per_batch if n] or [0]
        return max(per_batch), per_batch[-1]

    def file_stream(path: str, mfpt: int):
        return (spark.readStream
                .schema(spark.read.parquet(path).schema)
                .option("maxFilesPerTrigger", mfpt).parquet(path))

    for n in [int(x) for x in args.factors.split(",")]:
        import gc

        gc.collect()

        # -- key-volume axis: events with user ids disjoint per copy --
        ev = None
        for i in range(n):
            d = (events.select(
                (F.col("user_id") + F.lit(i * 50_000_000)).alias("user_id"),
                "ts", "value"))
            ev = d if ev is None else ev.unionByName(d)
        ev_path = os.path.join(root, f"ev{n}")
        ev.repartition(8).write.mode("overwrite").parquet(ev_path)
        n_ev = spark.read.parquet(ev_path).count()

        prog: list = []
        t0 = time.time()
        sess = sessionize_stream(file_stream(ev_path, 2),
                                 gap_s=6 * 3600, watermark="1 hour")
        out = run_bounded(sess, spark, mode="append", prefix="sps",
                          progress_out=prog)
        n_sess = out.count()
        w_sess = round(time.time() - t0, 2)
        sess_max, sess_fin = state_rows(prog)

        # -- key-volume axis: CMS complete-mode agg over docs ×N --
        dc = None
        for i in range(n):
            d = docs.select(
                (F.col("doc_id") + F.lit(i * 50_000_000)).alias("doc_id"),
                "text")
            dc = d if dc is None else dc.unionByName(d)
        dc_path = os.path.join(root, f"dc{n}")
        dc.repartition(8).write.mode("overwrite").parquet(dc_path)

        prog = []
        t0 = time.time()
        cms = cms_build(file_stream(dc_path, 2))
        out = run_bounded(cms, spark, mode="complete", prefix="spc",
                          progress_out=prog)
        n_cms = out.count()
        w_cms = round(time.time() - t0, 2)
        cms_max, cms_fin = state_rows(prog)

        # -- history axis: N time epochs, one file each, mtime order --
        ep_path = os.path.join(root, f"ep{n}")
        os.makedirs(ep_path, exist_ok=True)
        base = 1_704_067_200
        for i in range(n):
            epoch = docs.select(
                (F.col("doc_id") + F.lit(i * 50_000_000)).alias("doc_id"),
                F.concat("text", F.lit(f" #ep{i}")).alias("text"),
                F.timestamp_seconds(
                    F.lit(base + i * 86_400)
                    + F.col("doc_id") % 600).alias("ts"))
            epoch.coalesce(1).write.mode("append").parquet(ep_path)

        prog = []
        t0 = time.time()
        surv = dedup_stream(file_stream(ep_path, 1), ts_col="ts",
                            text_col="text", watermark="1 hour")
        out = run_bounded(surv, spark, mode="append", prefix="spd",
                          progress_out=prog)
        n_fp = out.count()
        w_dd = round(time.time() - t0, 2)
        dd_max, dd_fin = state_rows(prog)

        print(f"SCALE-STREAM n={n} events={n_ev} "
              f"sessionize={w_sess} sessions={n_sess} "
              f"sess_state_max={sess_max} "
              f"cms={w_cms} cms_rows={n_cms} cms_state_max={cms_max} "
              f"dedup={w_dd} fps={n_fp} dd_state_max={dd_max} "
              f"dd_state_final={dd_fin}", flush=True)
        shutil.rmtree(ev_path, ignore_errors=True)
        shutil.rmtree(dc_path, ignore_errors=True)
        shutil.rmtree(ep_path, ignore_errors=True)
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


def graph_probe(args) -> None:
    """Scale the part co-purchase graph as N DISJOINT copies (both
    endpoint ids shifted by the copy index, so distinct() cannot
    collapse them and component structure is preserved per copy) and
    time each graph operator.  Expectation: triangle_counts tracks the
    m^1.5 wedge bound on this bounded-degree graph (≈ linear in
    edges); the iterative ops (pagerank, kcore, walks) are
    rounds × (one shuffle join over edges) → linear."""
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.graph import (
        kcore_peel, pagerank_int, random_walks, triangle_counts)
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    # size the heap to the DATA, not the suite default: this experiment
    # deliberately materializes 16x edge sets + per-op intermediates in
    # one JVM, and 16 GiB (the suite-tuned default) is memory-marginal
    # at the top factor — exactly the executor-memory dial a real
    # cluster turns when the per-node data share grows
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")
    spark = build_session(app_name="scale-probe-graph")

    li = load_table(spark, args.sf_dir, "lineitem")
    pairs = (li.groupBy("l_orderkey")
             .agg(F.sort_array(F.collect_set("l_partkey")).alias("ps"))
             .select(F.explode(F.expr(
                 "flatten(transform(ps, (x, i) -> "
                 "transform(slice(ps, i + 2, size(ps) - i - 1), "
                 "y -> struct(x AS id_a, y AS id_b))))")).alias("p"))
             .select("p.id_a", "p.id_b").distinct()
             .localCheckpoint(eager=True))

    def scaled_edges(n: int):
        out = None
        for i in range(n):
            shift = F.lit(i * 50_000_000)
            d = pairs.select((F.col("id_a") + shift).alias("id_a"),
                             (F.col("id_b") + shift).alias("id_b"))
            out = d if out is None else out.unionByName(d)
        return out.localCheckpoint(eager=True)

    def best2(fn) -> float:
        fn()
        times = []
        for _ in range(2):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        return round(min(times), 2)

    def noop(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    for n in [int(x) for x in args.factors.split(",")]:
        # cluster-sizing discipline under data growth: shuffle-partition
        # count scales with the data so per-partition hash-join builds
        # stay memory-bounded (|E|/P roughly constant) — exactly what a
        # real deployment does between 1x and 16x data.  Runtime-settable;
        # triangle_counts reads the conf at call time.
        spark.conf.set("spark.sql.shuffle.partitions",
                       str(64 * max(1, n // 2)))
        # release the previous factor's checkpointed edge set + any op
        # leftovers before materializing the next (larger) one — without
        # this the cumulative 1x+4x residue OOMs the 16x factor even
        # though a solo 16x run fits comfortably
        import gc

        gc.collect()
        spark.catalog.clearCache()
        e = scaled_edges(n)
        m = e.count()
        r_tri = best2(lambda: noop(
            triangle_counts(e, assume_canonical=True)))
        r_pr = best2(lambda: noop(
            pagerank_int(e.withColumnRenamed("id_a", "src")
                         .withColumnRenamed("id_b", "dst"))))
        r_kc = best2(lambda: noop(kcore_peel(e, k=3, n_rounds=3)))
        r_rw = best2(lambda: noop(random_walks(e, walk_len=3)))
        print(f"SCALE-GRAPH n={n} edges={m} triangles={r_tri} "
              f"pagerank={r_pr} kcore={r_kc} walks={r_rw}", flush=True)
    spark.stop()


def cpu_axis_probe(args) -> None:
    """8-vs-32-core sweep (round-11 verdict item 7).  Shells out to
    tools/profile_queries.py once per (round, cpu-count) in A/B/A/B
    interleave — each subprocess is a fresh JVM at
    ``local[$SPARK_GRAFT_CPUS]`` — and always times ``sort_limit``
    alongside as the same-epoch control.  Per query it reports warm
    min over both rounds, the job count, and the fixed-cost reading:
    at sf0.1 a query whose plan runs J jobs of ≤8-partition stages has
    a ~J·(per-job fixed cost) floor that MORE CORES CANNOT CUT — wall
    ratios near (or below) 1 are expected there and say nothing about
    parallelism; only wide-stage queries (triangle wedges, corpus
    scans at machine width) can show a real c32 edge."""
    import re
    import subprocess

    names = [q.strip() for q in args.cpu_queries.split(",") if q.strip()]
    cpus_list = [c.strip() for c in args.cpus.split(",") if c.strip()]
    pat = re.compile(r"^(\S+)\s+cold\s+([\d.]+)\s+warm_min\s+([\d.]+)"
                     r"\s+warm_med\s+([\d.]+)\s+jobs\s+(\d+)")
    acc: dict = {}
    jobs: dict = {}
    for rnd in range(2):
        for cpus in cpus_list:
            env = dict(os.environ, SPARK_GRAFT_CPUS=cpus)
            out = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "profile_queries.py"),
                 "--sf-dir", args.sf_dir, "--reps", "3",
                 "sort_limit", *names],
                env=env, capture_output=True, text=True).stdout
            for line in out.splitlines():
                m = pat.match(line.strip())
                if not m:
                    continue
                name, _cold, wmin, _wmed, nj = m.groups()
                acc.setdefault((name, cpus), []).append(float(wmin))
                jobs[name] = int(nj)
            ctrl = min(acc.get(("sort_limit", cpus), [float("nan")]))
            print(f"# round {rnd} cpus={cpus} control sort_limit "
                  f"warm_min={ctrl}", flush=True)
    print("CPU-AXIS query | " + " | ".join(f"c{c} warm_min"
                                           for c in cpus_list)
          + " | jobs | ratio(c8/c32)")
    for name in ["sort_limit"] + names:
        mins = [min(acc.get((name, c), [float('nan')]))
                for c in cpus_list]
        ratio = (mins[0] / mins[-1]) if mins[-1] else float("nan")
        print(f"CPU-AXIS {name} | "
              + " | ".join(f"{m:.2f}" for m in mins)
              + f" | {jobs.get(name, '?')} | {ratio:.2f}", flush=True)


if __name__ == "__main__":
    main()
