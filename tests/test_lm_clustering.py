"""Bigram-LM scoring (X69) and k-means clustering (X70): semantic
assertions beyond the oracle parity harness — hand-checkable corpora,
OOV accounting, partition/quota invariants, rerun determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.operators.clustering import (
    cluster_balanced_sample, kmeans_int,
)
from ethereum2_etl_airflow_spark.operators.lm import (
    PROB_SCALE, doc_bigrams, dsir_logratio_bits, dsir_select,
    perplexity_scores, train_bigram_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bigram_lm_hand_corpus(spark):
    # train: "a b a b a" -> unigrams a:3 b:2 (V=2); bigrams ab:2 ba:2
    train = _docs(spark, [(0, "a b a b a")])
    uni, bi, v = train_bigram_lm(train)
    assert v == 2
    assert {(r["w1"], r["c1"]) for r in uni.collect()} == {("a", 3), ("b", 2)}
    assert {(r["w1"], r["w2"], r["c2"]) for r in bi.collect()} == {
        ("a", "b", 2), ("b", "a", 2)}

    # score "a b c": (a,b) seen num=3 den=5 -> bits=floor(log2(5 div 3))=0,
    # fp=600000; (b,c) unseen num=1 den=4 -> bits=2, fp=250000
    out = perplexity_scores(_docs(spark, [(1, "a b c")]), train).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_bigrams"], r["oov_bigrams"]) == (2, 1)
    assert r["ppl_bits"] == 0 + 2
    assert r["probmass_fp"] == 3 * PROB_SCALE // 5 + PROB_SCALE // 4


def test_lm_degenerate_docs_score_zero(spark):
    train = _docs(spark, [(0, "a b a")])
    corpus = _docs(spark, [(1, "solo"), (2, None), (3, "")])
    rows = {r["doc_id"]: r for r in
            perplexity_scores(corpus, train).collect()}
    # one row per doc, all-zero for <2-token docs (incl. NULL text)
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert (r["n_bigrams"], r["oov_bigrams"],
                r["ppl_bits"], r["probmass_fp"]) == (0, 0, 0, 0)


def test_lm_empty_training_corpus(spark):
    """V clamps to 1: scoring under an empty LM is the uniform floor,
    never a div-by-zero NULL/error."""
    train = _docs(spark, []).where("doc_id < 0")
    out = perplexity_scores(_docs(spark, [(1, "a b")]), train).collect()
    assert len(out) == 1
    r = out[0]
    # num=1, den=0+1 -> bits=0, fp=PROB_SCALE
    assert (r["n_bigrams"], r["oov_bigrams"]) == (1, 1)
    assert r["ppl_bits"] == 0
    assert r["probmass_fp"] == PROB_SCALE


def test_doc_bigrams_orders_pairs(spark):
    got = [(r["w1"], r["w2"]) for r in
           doc_bigrams(_docs(spark, [(0, "x y z")])).collect()]
    assert got == [("x", "y"), ("y", "z")]


def test_oov_bits_dominate_in_distribution_shift(spark, sf_dir):
    """Scoring a disjoint-domain doc must cost more bits per bigram than
    rescoring training-domain text — the filter signal the operator
    exists for."""
    d = (_docs(spark, [(99, "zq wx zq wx zq")])
         .unionByName(_docs(spark, [(98, "the of the of the")])))
    train = _docs(spark, [(0, "the of the of the and the of")])
    rows = {r["doc_id"]: r for r in perplexity_scores(d, train).collect()}
    assert rows[99]["oov_bigrams"] == rows[99]["n_bigrams"]  # all-OOV
    assert rows[99]["ppl_bits"] > rows[98]["ppl_bits"]


def test_dsir_prefers_target_like_docs(spark):
    """A raw doc written in the target's idiom must out-rank one written
    against it — the selection signal DSIR exists for."""
    target = _docs(spark, [(0, "the cat sat on the mat"),
                           (2, "the dog sat on the rug")])
    raw = _docs(spark, [(1, "the cat sat on the rug"),   # target-like
                        (3, "zq wx qk jv zz yy"),        # alien
                        (5, "solo")])                    # degenerate
    scored = {r["doc_id"]: r for r in
              dsir_logratio_bits(raw, target).collect()}
    assert set(scored) == {1, 3, 5}
    assert scored[1]["logratio_bits"] > scored[3]["logratio_bits"]
    assert (scored[5]["n_bigrams"], scored[5]["bits_target"],
            scored[5]["bits_raw"], scored[5]["logratio_bits"]) == (0, 0, 0, 0)
    top1 = dsir_select(raw, target, n=1).collect()
    assert [r["doc_id"] for r in top1] == [1]


def test_dsir_select_orders_deterministically(spark):
    """Equal-ratio docs tie-break on doc_id ascending."""
    target = _docs(spark, [(0, "a b a b")])
    raw = _docs(spark, [(9, "a b"), (7, "a b")])
    got = [r["doc_id"] for r in dsir_select(raw, target, n=2).collect()]
    assert got == [7, 9]


def test_kmeans_partitions_all_vectors(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = kmeans_int(emb, k=4, n_iter=2)
    n = emb.count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n
    cl = [r["cluster"] for r in out.select("cluster").distinct().collect()]
    assert set(cl) <= {0, 1, 2, 3}
    assert len(cl) >= 2  # sf0.001 embeddings aren't one blob
    assert out.agg(F.min("dist2")).first()[0] >= 0


def test_kmeans_rerun_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = sorted((r["vec_id"], r["cluster"], r["dist2"])
               for r in kmeans_int(emb, k=3, n_iter=2).collect())
    b = sorted((r["vec_id"], r["cluster"], r["dist2"])
               for r in kmeans_int(emb.repartition(7), k=3,
                                   n_iter=2).collect())
    assert a == b  # layout-invariant (md5 seeds, integer math)


def test_cluster_sample_respects_quota(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = cluster_balanced_sample(emb, k=4, n_iter=2, per_cluster=5)
    sizes = {r["cluster"]: r["n"] for r in
             out.groupBy("cluster").agg(F.count("*").alias("n")).collect()}
    assert sizes and all(v <= 5 for v in sizes.values())
    # sampled rows keep their kmeans assignment
    full = {(r["vec_id"], r["cluster"])
            for r in kmeans_int(emb, k=4, n_iter=2).collect()}
    assert {(r["vec_id"], r["cluster"]) for r in out.collect()} <= full


def test_semantic_dedup_kmeans_cells_prune_planted_copies(spark, sf_dir):
    """refine_iters>0 swaps md5-anchor cells for kmeans cells.  A
    1.01-scaled copy quantizes identically to its original UP TO an
    occasional 1-ulp floor flip, and Lloyd-refined cells are tight
    enough that such a flip can land copy and original on opposite
    sides of a near-tie boundary — so the invariant is high recall,
    not exactness (the correctness gate is the oracle parity; this is
    the LSH-style recall bar every banded tier here gets)."""
    from ethereum2_etl_airflow_spark.operators.dedup import semantic_dedup
    from ethereum2_etl_airflow_spark.plans.checks_extension import (
        _emb_corpus)

    corpus = _emb_corpus(spark, sf_dir).drop("label")
    out = semantic_dedup(corpus, n_cells=8, threshold_millis=950,
                         refine_iters=2)
    survivors = {r["vec_id"] for r in out.collect()}
    n_orig = corpus.count() // 2
    leaked = {s for s in survivors if s >= 1000000}
    assert len(leaked) <= max(1, int(0.02 * n_orig)), leaked
    assert len(survivors) <= n_orig + len(leaked)


def test_stupid_backoff_hand_corpus(spark):
    """Hit bits = floor(log2(c1 div c2)); backoff = exactly 1 bit +
    add-one unigram bits — hand-checked on a 5-token training corpus."""
    from ethereum2_etl_airflow_spark.operators.lm import stupid_backoff_bits

    # train "a b a b a": c1 a:3 b:2, N=5, V=2; bigrams ab:2 ba:2
    train = _docs(spark, [(0, "a b a b a")])
    # score "a b c": (a,b) hit -> floor(log2(3 div 2)) = 0;
    # (b,c) backoff -> 1 + floor(log2((5+2) div (0+1))) = 1 + 2 = 3
    out = stupid_backoff_bits(_docs(spark, [(1, "a b c")]), train).collect()
    r = out[0]
    assert (r["n_bigrams"], r["backoff_hits"], r["sb_bits"]) == (2, 1, 3)
    # backoff to a SEEN unigram costs fewer bits: (c, a) unseen bigram,
    # backoff unigram a: 1 + floor(log2(7 div 4)) = 1
    out2 = stupid_backoff_bits(_docs(spark, [(2, "c a")]), train).collect()
    assert (out2[0]["backoff_hits"], out2[0]["sb_bits"]) == (1, 1)


def test_ivf_exact_tracks_bruteforce(spark, sf_dir):
    """X73: the integer-cell IVF tier's recall vs the exact cosine tier
    — the same tracking bar the float-KMeans and LSH tiers get."""
    from ethereum2_etl_airflow_spark.operators.similarity import (
        ann_ivf_exact_topk, topk_cosine_bruteforce)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qids = [0, 1, 2, 3, 4]
    exact = {(r["query_id"], r["vec_id"])
             for r in topk_cosine_bruteforce(emb, qids, k=10).collect()}
    approx = {(r["query_id"], r["vec_id"])
              for r in ann_ivf_exact_topk(emb, qids, k=10, n_cells=8,
                                          n_probe=2, n_iter=2).collect()}
    assert exact
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"ivf-exact recall {recall:.2f}"
    # probing MORE cells can only improve recall (monotone contract)
    wide = {(r["query_id"], r["vec_id"])
            for r in ann_ivf_exact_topk(emb, qids, k=10, n_cells=8,
                                        n_probe=8, n_iter=2).collect()}
    assert wide == exact  # probing all cells IS the exact search


def test_source_divergence_directional_signal(spark):
    """A source whose text matches another's idiom diverges less FROM it
    than an alien source does; self-pairs are excluded; every ordered
    pair appears."""
    from ethereum2_etl_airflow_spark.operators.lm import (
        source_unigram_divergence)

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat", "a"),
         (2, "the dog sat on the rug", "b"),
         (3, "zq wx qk jv zz yy", "c")],
        "doc_id bigint, text string, source string")
    rows = {(r["source_a"], r["source_b"]): r
            for r in source_unigram_divergence(docs).collect()}
    assert set(rows) == {(x, y) for x in "abc" for y in "abc" if x != y}
    # a models b's text far better than c does (shared idiom)
    assert rows[("b", "a")]["xent_bits"] < rows[("b", "c")]["xent_bits"]
    assert rows[("a", "c")]["div_bits"] > rows[("a", "b")]["div_bits"]


def test_source_divergence_max_vocab_caps_join(spark):
    from ethereum2_etl_airflow_spark.operators.lm import (
        source_unigram_divergence)

    docs = spark.createDataFrame(
        [(1, "x x x y", "a"), (2, "x z", "b")],
        "doc_id bigint, text string, source string")
    # top-1 vocabulary is {x}; sums must then only cover x occurrences
    out = {(r["source_a"], r["source_b"]): r["n_tokens_a"]
           for r in source_unigram_divergence(docs,
                                              max_vocab=1).collect()}
    assert out == {("a", "b"): 3, ("b", "a"): 1}


def test_kmeans_assign_no_drift(spark, sf_dir):
    """Incremental contract: a history vector re-assigned as a batch
    member gets EXACTLY its original cluster and distance (cells come
    from history only, so re-arrival is a no-op)."""
    from ethereum2_etl_airflow_spark.operators.clustering import (
        kmeans_assign, kmeans_int)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = {r["vec_id"]: (r["cluster"], r["dist2"])
            for r in kmeans_int(emb, k=3, n_iter=2).collect()}
    # re-present the same vectors as an arriving batch (shifted ids)
    from pyspark.sql import functions as F2
    batch = emb.select((F2.col("vec_id") + 5000).alias("vec_id"),
                       "embedding")
    got = {r["vec_id"] - 5000: (r["cluster"], r["dist2"])
           for r in kmeans_assign(batch, emb, k=3, n_iter=2).collect()}
    assert got == base


def test_winnowing_guarantee_and_density(spark):
    """The winnowing theorem: two documents sharing a run of >= w+k-1
    tokens MUST share a fingerprint; short docs yield none; selection
    is sparse (well under one fp per shingle)."""
    from ethereum2_etl_airflow_spark.operators.text import (
        winnow_fingerprints)

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [(1, "one two " + shared + " three four"),
         (2, "five six seven " + shared + " eight"),
         (3, "completely different words everywhere here nine ten more"),
         (4, "tiny doc")],  # < k tokens -> no shingles -> no fps
        "doc_id bigint, text string")
    out = winnow_fingerprints(docs, k=4, w=4)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    # guarantee: 8 shared tokens >= w+k-1 = 7 -> docs 1 and 2 overlap
    assert by_doc[1] & by_doc[2]
    assert 4 not in by_doc
    assert not (by_doc[3] & (by_doc[1] | by_doc[2]))
    # density: #fps <= #windows, and far below #shingles on long text
    n_tokens = 12
    assert len(by_doc[1]) <= n_tokens - 4 - 4 + 2


def test_pair_set_metrics_identities(spark):
    from ethereum2_etl_airflow_spark.operators.dedup import pair_set_metrics

    mk = lambda rows: spark.createDataFrame(rows, "id_a bigint, id_b bigint")
    pred = mk([(1, 2), (1, 2), (3, 4), (5, 6)])   # dup row collapses
    truth = mk([(1, 2), (3, 4), (7, 8)])
    r = pair_set_metrics(pred, truth).collect()[0]
    assert (r["n_pred"], r["n_truth"], r["n_hit"],
            r["n_fp"], r["n_fn"]) == (3, 3, 2, 1, 1)
    # identical sets: perfect score; empty pred: all misses
    r2 = pair_set_metrics(truth, truth).collect()[0]
    assert (r2["n_hit"], r2["n_fp"], r2["n_fn"]) == (3, 0, 0)
    r3 = pair_set_metrics(mk([]), truth).collect()[0]
    assert (r3["n_pred"], r3["n_hit"], r3["n_fn"]) == (0, 0, 3)


def test_ivf_index_serving_bit_identical_and_partition_pruned(
        spark, sf_dir, tmp_path):
    """X88: the stored-index serve path returns BIT-IDENTICAL rows
    (incl. cosine doubles) to the in-session ann_ivf_exact_topk with
    the same build params, and its cells scan carries a dynamic
    partition-pruning filter on the cluster partition column — a
    serving query reads only the probed cells' directories."""
    from ethereum2_etl_airflow_spark.operators.similarity import (
        ann_ivf_exact_topk, build_ivf_index, query_ivf_index)
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_cells=8, n_iter=2)
    qids = [0, 1, 2, 3, 4]
    served = query_ivf_index(spark, path, qids, k=10, n_probe=2)
    direct = ann_ivf_exact_topk(emb, qids, k=10, n_cells=8, n_probe=2,
                                n_iter=2)
    assert sorted(map(tuple, served.collect())) == \
        sorted(map(tuple, direct.collect()))
    plan = served._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:1200]


def test_ivf_index_external_query_vectors(spark, sf_dir, tmp_path):
    """Round-11 (VERDICT item 2): serving accepts LITERAL query vectors
    — no corpus membership, and the query lookup touches zero index
    files.  An external vector equal to an in-corpus embedding must
    serve bit-identically to the id mode (same quantizer, same
    decimal-exact normalization), and the plan must scan the cells
    table exactly once (the DPP-pruned scoring scan; the id mode scans
    it twice — lookup + scoring)."""
    import pytest

    from ethereum2_etl_airflow_spark.operators.similarity import (
        build_ivf_index, query_ivf_index)
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb, path, n_cells=8, n_iter=2)
    qids = [0, 3, 7]
    vecs = {int(r["vec_id"]): [float(x) for x in r["embedding"]]
            for r in emb.where(F.col("vec_id").isin(qids)).collect()}
    by_id = query_ivf_index(spark, path, qids, k=10, n_probe=2)
    by_vec = query_ivf_index(spark, path, k=10, n_probe=2,
                             query_vectors=vecs)
    assert sorted(map(tuple, by_vec.collect())) == \
        sorted(map(tuple, by_id.collect()))
    # lookup-scan audit: the cells parquet is the ONLY file source in a
    # serve plan (centroids collect driver-side), so FileScan count ==
    # cells-scan count: ONE in vector mode (scoring only), TWO in id
    # mode (lookup + scoring)
    def n_cells_scans(df):
        plan = df._jdf.queryExecution().executedPlan().toString()
        # post-execution AQE plans print Final + Initial sections —
        # count the final one only (scans would double otherwise)
        return plan.split("== Initial Plan ==")[0].count("Scan parquet")
    assert n_cells_scans(by_vec) == 1, "vector mode must not scan " \
        "cells for the query lookup"
    assert n_cells_scans(by_id) >= 2  # lookup scan(s) + scoring scan
    # exactly one of ids/vectors
    with pytest.raises(ValueError):
        query_ivf_index(spark, path, qids, query_vectors=vecs)
    with pytest.raises(ValueError):
        query_ivf_index(spark, path)


def test_append_ivf_index_frozen_codebook(spark, sf_dir, tmp_path):
    """X92: appending with the stored centroids is bit-identical to a
    build that fit on the ORIGINAL corpus but wrote the union — the
    frozen-codebook contract; serving over the appended index keeps
    the DPP plan shape and the centroid artifact is untouched."""
    import pytest

    from ethereum2_etl_airflow_spark.operators.similarity import (
        append_ivf_index, build_ivf_index, query_ivf_index)
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    firsts = emb.where(F.col("vec_id") % 2 == 0)
    seconds = (emb.where(F.col("vec_id") % 2 == 1)
               .select((F.col("vec_id") + 500000).alias("vec_id"),
                       "embedding"))
    inc = str(tmp_path / "inc")
    build_ivf_index(firsts, inc, n_cells=4, n_iter=2)
    before = sorted(map(tuple,
                        spark.read.parquet(inc + "/centroids").collect()))
    append_ivf_index(seconds, inc)
    after = sorted(map(tuple,
                       spark.read.parquet(inc + "/centroids").collect()))
    assert before == after  # codebook untouched
    # manual reconstruction: same centroids, union corpus — cells must
    # be row-identical (vec_id, q, cluster, nv)
    manual = str(tmp_path / "manual")
    build_ivf_index(firsts, manual, n_cells=4, n_iter=2)
    append_ivf_index(emb.where(F.col("vec_id") % 2 == 1)
                     .select((F.col("vec_id") + 500000).alias("vec_id"),
                             "embedding"), manual)
    inc_cells = sorted(map(tuple, spark.read.parquet(
        inc + "/cells").select("vec_id", "cluster", "q", "nv").collect()))
    man_cells = sorted(map(tuple, spark.read.parquet(
        manual + "/cells").select("vec_id", "cluster", "q",
                                  "nv").collect()))
    assert inc_cells == man_cells
    # serving still partition-prunes and sees appended rows
    qid = int(firsts.limit(1).collect()[0]["vec_id"])
    served = query_ivf_index(spark, inc, [qid], k=5, n_probe=4)
    rows = served.collect()
    assert rows, "probing every cell must return results"
    assert "dynamicpruning" in served._jdf.queryExecution() \
        .executedPlan().toString().lower()
    # appended ids are servable results too (n_probe=4 covers all cells)
    all_ids = {r["vec_id"] for r in rows}
    assert any(v >= 500000 for v in all_ids) or len(rows) == 5
    # an index whose centroid table is empty refuses appends
    empty = str(tmp_path / "empty")
    build_ivf_index(emb.where("vec_id < 0"), empty, n_cells=4, n_iter=2)
    with pytest.raises(ValueError, match="centroid"):
        append_ivf_index(seconds, empty)


def test_compact_ivf_index_is_logical_noop(spark, sf_dir, tmp_path):
    """X93: compaction rewrites cell files (fewer per cell after many
    appends) without changing rows, partition layout, or serving."""
    from ethereum2_etl_airflow_spark.operators.similarity import (
        append_ivf_index, build_ivf_index, compact_ivf_index,
        ivf_index_stats, query_ivf_index)
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    path = str(tmp_path / "ivf")
    build_ivf_index(emb.where("vec_id % 4 = 0"), path,
                    n_cells=4, n_iter=2)
    # three appends → ≥4 file generations per touched cell
    for m in (1, 2, 3):
        append_ivf_index(
            emb.where(f"vec_id % 4 = {m}")
            .select((F.col("vec_id") + m * 100000).alias("vec_id"),
                    "embedding"), path)
    files_before = {r["cluster"]: r["n_files"]
                    for r in ivf_index_stats(spark, path).collect()}
    rows_before = sorted(map(tuple, spark.read.parquet(
        path + "/cells").select("vec_id", "cluster", "q",
                                "nv").collect()))
    qid = int(emb.where("vec_id % 4 = 0").limit(1)
              .collect()[0]["vec_id"])
    served_before = sorted(map(tuple, query_ivf_index(
        spark, path, [qid], k=5, n_probe=4).collect()))
    compact_ivf_index(spark, path)
    files_after = {r["cluster"]: r["n_files"]
                   for r in ivf_index_stats(spark, path).collect()}
    rows_after = sorted(map(tuple, spark.read.parquet(
        path + "/cells").select("vec_id", "cluster", "q",
                                "nv").collect()))
    served_after = sorted(map(tuple, query_ivf_index(
        spark, path, [qid], k=5, n_probe=4).collect()))
    assert rows_after == rows_before          # logical no-op
    assert served_after == served_before      # serving bit-identical
    assert sum(files_after.values()) < sum(files_before.values())
    assert max(files_after.values()) <= 2     # small index → ~1/cell


def test_driver_probe_selection_matches_probe_sort_sql(spark):
    """Round-12: ann_ivf_exact_topk now selects each query's probes
    DRIVER-SIDE (exact Python-int L2, (d, rank) tie order) instead of
    evaluating ``_probe_sort_sql`` in-plan.  Pin the equivalence: for
    adversarial q/centroid pairs (exact ties included), the Python
    selection must equal ``slice(array_sort(...), 1, n_probe)``."""
    from pyspark.sql import functions as F

    from ethereum2_etl_airflow_spark.operators.clustering import (
        _probe_sort_sql)

    cents = [[0, 0], [3, 4], [4, 3], [0, 5], [5, 0]]  # d-ties by design
    qs = [(0, [0, 0]), (1, [3, 4]), (2, [2, 2]), (3, [-1, 7])]
    n_probe = 3
    df = spark.createDataFrame(
        [(i, [int(x) for x in q]) for i, q in qs], "id long, q array<long>")
    in_plan = {
        r["id"]: [p["r"] for p in r["ps"]]
        for r in df.select(
            "id", F.expr(f"slice({_probe_sort_sql(cents)}, 1, "
                         f"{n_probe})").alias("ps")).collect()}
    for i, q in qs:
        ds = sorted((sum((a - c) * (a - c) for a, c in zip(q, cq)), rank)
                    for rank, cq in enumerate(cents))
        assert [r for _d, r in ds[:n_probe]] == in_plan[i], f"query {i}"
