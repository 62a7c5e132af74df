"""Curation-operator invariants the SQL oracle can't express: layout
invariance, cap exactness under repartitioning, planted-PII redaction,
packing contiguity, quantization range."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.operators import curation as C
from ethereum2_etl_airflow_spark.sources.testdata import load_table


def test_pii_scrub_planted(spark):
    rows = [
        (1, "mail me at alice.smith+x@example.co.uk today"),
        (2, "server 192.168.0.1 and card 1234567890123456"),
        (3, "clean text, nothing to redact"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in C.pii_scrub(df).collect()}
    assert out[1]["n_emails"] == 1 and "<EMAIL>" in out[1]["clean"]
    assert "alice" not in out[1]["clean"]
    assert out[2]["n_ips"] == 1 and out[2]["n_longnums"] == 1
    assert "<IP>" in out[2]["clean"] and "<NUM>" in out[2]["clean"]
    assert out[3]["clean"] == rows[2][1]
    assert (out[3]["n_emails"], out[3]["n_ips"], out[3]["n_longnums"]) == (0, 0, 0)


def test_cap_per_key_exact_and_layout_invariant(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    cap = 7
    ref = {(r["source"], r["doc_id"])
           for r in (d.withColumn(
               "rn", F.row_number().over(
                   __import__("pyspark.sql.window", fromlist=["Window"])
                   .Window.partitionBy("source").orderBy("doc_id")))
               .where(F.col("rn") <= cap).drop("rn")).collect()}
    for nparts in (1, 13):
        got = {(r["source"], r["doc_id"])
               for r in C.cap_per_key(d.repartition(nparts), "source",
                                      "doc_id", cap).collect()}
        assert got == ref
    per_key = (C.cap_per_key(d, "source", "doc_id", cap)
               .groupBy("source").count().collect())
    assert all(r["count"] <= cap for r in per_key)


def test_pack_offsets_contiguous_and_layout_invariant(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    ref = C.pack_offsets(d, budget=512).orderBy("lang", "doc_id").collect()
    # contiguity: within each lang, next start = prev start + prev n_tok
    by_lang: dict = {}
    for r in ref:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rows in by_lang.items():
        assert rows[0]["start_off"] == 0
        for a, b in zip(rows, rows[1:]):
            assert b["start_off"] == a["start_off"] + a["n_tok"]
        for r in rows:
            assert r["first_block"] == r["start_off"] // 512
            assert r["last_block"] >= r["first_block"]
    # layout invariance: a different input partitioning → identical offsets
    again = (C.pack_offsets(d.repartition(11), budget=512)
             .orderBy("lang", "doc_id").collect())
    assert again == ref


def test_assign_folds_range_and_determinism(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    f1 = {r["doc_id"]: r["fold"] for r in C.assign_folds(d, k=5).collect()}
    assert set(f1.values()) <= set(range(5))
    f2 = {r["doc_id"]: r["fold"]
          for r in C.assign_folds(d.repartition(9), k=5).collect()}
    assert f1 == f2


def test_quantize_embeddings_range(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = C.quantize_embeddings(e)
    stats = q.agg(F.min("q").alias("lo"), F.max("q").alias("hi"),
                  F.count("*").alias("n")).collect()[0]
    assert -127 <= stats["lo"] and stats["hi"] <= 127
    n_vec = e.count()
    assert stats["n"] == n_vec * 64
    # every non-zero vector has at least one component at ±127 or -128?
    # no: floor(-1*127) = -127; the max-|x| component hits exactly ±127
    # only when positive; negative extreme floors to -127. Check the
    # per-vector max |q| is >= 126 (the scale anchor survived).
    m = (q.groupBy("vec_id").agg(F.max(F.abs("q")).alias("mq"))
         .agg(F.min("mq")).collect()[0][0])
    assert m >= 126


def test_latest_by_key_partial_agg_plan(spark, sf_dir):
    from ethereum2_etl_airflow_spark.operators.load import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    latest = latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    # one row per key, and it is the (ts, event_id)-max row
    ref = {(r["user_id"], r["event_id"])
           for r in ev.groupBy("user_id")
           .agg(F.max(F.struct("ts", "event_id")).alias("m"))
           .select("user_id", F.col("m.event_id").alias("event_id"))
           .collect()}
    got = {(r["user_id"], r["event_id"]) for r in latest.collect()}
    assert got == ref
    # the scale contract: aggregate with a map-side partial combine
    # (struct max plans as SortAggregate), never a per-key Window sort
    plan = latest._jdf.queryExecution().executedPlan().toString()
    assert "partial_max" in plan and "Window" not in plan


def test_incremental_new_docs_disjoint_from_history(spark, sf_dir):
    from ethereum2_etl_airflow_spark.operators.dedup import (
        incremental_new_docs)
    from ethereum2_etl_airflow_spark.operators.text import fingerprint

    d = load_table(spark, sf_dir, "documents")
    history = d.where(F.col("doc_id") % 2 == 0)
    batch = d.where(F.col("doc_id") % 2 == 1)
    new = incremental_new_docs(batch, history)
    hist_fps = {r["fp"] for r in
                history.select(fingerprint("text").alias("fp")).collect()}
    rows = new.collect()
    assert all(r["fp"] not in hist_fps for r in rows)
    # one row per fingerprint, and ids come from the batch side
    fps = [r["fp"] for r in rows]
    assert len(fps) == len(set(fps))
    assert all(r["doc_id"] % 2 == 1 for r in rows)


def test_sample_frames_stride_and_bounds(spark):
    from ethereum2_etl_airflow_spark.operators.multimodal import (
        attach_binary_payload, sample_frames)

    rows = [(1, "x" * 1000), (2, "y" * 250), (3, "z" * 50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    media = attach_binary_payload(docs)
    out = sample_frames(media, target=4, frame_bytes=100).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 10 frames, stride ceil(10/4)=3 → idx 0,3,6,9
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 3, 6, 9]
    assert all(r["frame_off"] == r["frame_idx"] * 100 for r in by_doc[1])
    assert all(len(r["frame"]) == 100 for r in by_doc[1])
    # doc 2: 2 frames < target → every frame sampled
    assert sorted(r["frame_idx"] for r in by_doc[2]) == [0, 1]
    # doc 3: payload shorter than one frame → no rows
    assert 3 not in by_doc


def test_heavy_hitters_topk_bounded(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    hh = C.heavy_hitters(d, k=10)
    rows = hh.collect()
    assert len(rows) == 10
    ns = [r["n"] for r in rows]
    assert ns == sorted(ns, reverse=True)
    plan = hh._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_compact_files_reduces_file_count(spark, tmp_path):
    from ethereum2_etl_airflow_spark.operators.load import compact_files

    src = str(tmp_path / "frag")
    # 20 tiny fragments (an hourly sink's worth of appends)
    for i in range(20):
        (spark.range(i * 100, (i + 1) * 100)
         .coalesce(1).write.mode("append").parquet(src))
    import glob
    assert len(glob.glob(f"{src}/*.parquet")) >= 20

    dest = str(tmp_path / "compact")
    n = compact_files(spark, src, dest, target_bytes=1 << 30)
    assert n == 1
    # content preserved exactly
    assert (spark.read.parquet(dest).count()
            == spark.read.parquet(src).count() == 2000)
    got = {r["id"] for r in spark.read.parquet(dest).collect()}
    assert got == set(range(2000))


def test_zorder_by_disjoint_file_ranges(spark, sf_dir, tmp_path):
    """Z-ordered write layout: each output file covers a disjoint
    Z-curve segment (that disjointness is what min/max pruning needs)."""
    from ethereum2_etl_airflow_spark.functions.layout import (
        zorder_by, zorder_key)

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    dest = str(tmp_path / "zord")
    zorder_by(d, "n_chars", "doc_id", bits=16).write.parquet(dest)

    per_file = (spark.read.parquet(dest)
                .withColumn("f", F.input_file_name())
                .groupBy("f").agg(F.min("zkey").alias("lo"),
                                  F.max("zkey").alias("hi"))
                .collect())
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, "file z-ranges overlap"

    # key formula matches a python reference interleave
    def morton(a, b):
        out = 0
        for i in range(16):
            out |= ((a >> i) & 1) << (2 * i)
            out |= ((b >> i) & 1) << (2 * i + 1)
        return out

    sample = (d.limit(20)
              .select("doc_id", "n_chars",
                      zorder_key(F.col("n_chars"), F.col("doc_id") % 65536)
                      .alias("zkey")).collect())
    for r in sample:
        assert r["zkey"] == morton(r["n_chars"], r["doc_id"] % 65536)


def test_contamination_score_consistent_with_pairs(spark, sf_dir):
    """A doc flagged by contamination_pairs (>=2 shared shingles with
    some bench doc) must have n_hit >= 2 in contamination_score."""
    from ethereum2_etl_airflow_spark.operators.dedup import (
        contamination_pairs, contamination_score)

    d = load_table(spark, sf_dir, "documents")
    train = d.where(F.col("doc_id") % 97 != 0)
    bench = d.where(F.col("doc_id") % 97 == 0)
    flagged = {r["train_id"] for r in
               contamination_pairs(train, bench, min_shared=2).collect()}
    scores = {r["doc_id"]: (r["n_hit"], r["n_shingles"])
              for r in contamination_score(train, bench).collect()}
    for t in flagged:
        assert scores[t][0] >= 2
    # every train doc scored, hits never exceed totals
    assert all(h <= n for h, n in scores.values())


def test_shuffle_deterministic_layout_and_permutation(spark, sf_dir):
    """Same seed → same total order regardless of input layout; new
    seed → different permutation; output partitions cover disjoint key
    ranges (file-concatenation order IS the shuffle order)."""
    from ethereum2_etl_airflow_spark.operators.sampling import (
        shuffle_deterministic)

    docs = load_table(spark, sf_dir, "documents")
    a = shuffle_deterministic(docs, "s1")
    b = shuffle_deterministic(docs.repartition(7), "s1")
    order_a = [r["doc_id"] for r in a.orderBy("shuffle_key").collect()]
    order_b = [r["doc_id"] for r in b.orderBy("shuffle_key").collect()]
    assert order_a == order_b  # layout-invariant
    c = [r["doc_id"] for r in shuffle_deterministic(docs, "s2")
         .orderBy("shuffle_key").collect()]
    assert c != order_a        # seed is a fresh permutation
    # range layout: per-partition [min,max] key spans don't overlap
    spans = (a.select("shuffle_key", F.spark_partition_id().alias("pid"))
             .groupBy("pid").agg(F.min("shuffle_key").alias("lo"),
                                 F.max("shuffle_key").alias("hi"))
             .orderBy("lo").collect())
    for prev, cur in zip(spans, spans[1:]):
        assert prev["hi"] <= cur["lo"]


def test_weighted_mix_rates_and_edges(spark, sf_dir):
    """Weight 1.0 keeps the whole group, unlisted groups drop, and a
    fractional weight lands near its target rate."""
    from ethereum2_etl_airflow_spark.operators.sampling import weighted_mix

    docs = load_table(spark, sf_dir, "documents")
    out = weighted_mix(docs, {"de": 1.0, "en": 0.5}, group_col="lang")
    by_lang = {r["lang"]: r["n"] for r in
               out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    tot = {r["lang"]: r["n"] for r in
           docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert by_lang["de"] == tot["de"]               # full keep
    assert set(by_lang) == {"de", "en"}             # zh/fr/es dropped
    assert 0.25 * tot["en"] < by_lang["en"] < 0.75 * tot["en"]
    import pytest as _pytest
    with _pytest.raises(ValueError):
        weighted_mix(docs, {"en": 1.5}, group_col="lang")


def test_sample_exact_n_is_prefix_of_larger_sample(spark, sf_dir):
    """Determinism + nesting: the n=50 sample is exactly the first 50 of
    the n=200 sample (hash order is a fixed global ranking)."""
    from ethereum2_etl_airflow_spark.operators.sampling import sample_exact_n

    docs = load_table(spark, sf_dir, "documents")
    s50 = [r["doc_id"] for r in
           sample_exact_n(docs, 50).orderBy("sample_key").collect()]
    s200 = [r["doc_id"] for r in
            sample_exact_n(docs, 200).orderBy("sample_key").collect()]
    assert len(s50) == 50 and len(s200) == 200
    assert s200[:50] == s50


def test_scd2_intervals_tile_the_timeline(spark):
    """Per key: intervals are contiguous (valid_to == next valid_from),
    exactly one open current row, and an as-of probe at any boundary
    resolves to exactly one version."""
    from ethereum2_etl_airflow_spark.operators.load import scd2_intervals

    rows = [(1, 10, "a", "2024-01-01 00:00:00"),
            (1, 11, "b", "2024-01-02 00:00:00"),
            (1, 12, "c", "2024-01-05 00:00:00"),
            (2, 20, "x", "2024-01-03 00:00:00")]
    df = (spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts_s string")
        .select("user_id", "event_id", "event_type",
                F.to_timestamp("ts_s").alias("ts")))
    out = scd2_intervals(df, ["user_id"], ["ts", "event_id"], "ts")
    u1 = sorted([r for r in out.collect() if r["user_id"] == 1],
                key=lambda r: r["valid_from"])
    assert [r["event_id"] for r in u1] == [10, 11, 12]
    assert u1[0]["valid_to"] == u1[1]["valid_from"]
    assert u1[1]["valid_to"] == u1[2]["valid_from"]
    assert [r["is_current"] for r in u1] == [False, False, True]
    # as-of probe: 2024-01-03 lands inside version 11's interval
    asof = out.where(
        (F.col("user_id") == 1)
        & (F.col("valid_from") <= "2024-01-03")
        & (F.col("valid_to").isNull() | (F.col("valid_to") > "2024-01-03")))
    assert [r["event_id"] for r in asof.collect()] == [11]


def test_cohort_retention_week0_is_full(spark, sf_dir):
    from ethereum2_etl_airflow_spark.operators.curation import cohort_retention
    from ethereum2_etl_airflow_spark.sources.testdata import load_table

    ev = load_table(spark, sf_dir, "events")
    m = cohort_retention(ev).collect()
    assert m
    by = {(r["cohort_week"], r["week_offset"]): r for r in m}
    # every user is by definition active in their own cohort week
    for (wk, off), r in by.items():
        if off == 0:
            assert r["n_active"] == r["n_cohort"]
            assert r["retention"] == 1.0
        assert 0 < r["n_active"] <= r["n_cohort"]


def test_chunk_sliding_boundaries(spark):
    from ethereum2_etl_airflow_spark.operators.curation import chunk_sliding

    rows = [(1, ""),                        # 0 tokens -> no chunks
            (2, " ".join(f"t{i}" for i in range(32))),   # exactly window
            (3, " ".join(f"t{i}" for i in range(33))),   # window+1 -> 2 chunks
            (4, "one two")]                 # shorter than window
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_sliding(df, window=32, stride=24).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert 1 not in by_doc
    assert len(by_doc[2]) == 1 and by_doc[2][0]["n_tokens"] == 32
    assert len(by_doc[3]) == 2
    assert by_doc[3][1]["start"] == 24 and by_doc[3][1]["n_tokens"] == 9
    # overlap: chunk 1 of doc 3 starts at token 24, within chunk 0's span
    assert by_doc[3][0]["chunk_text"].split()[24] == \
        by_doc[3][1]["chunk_text"].split()[0]
    assert len(by_doc[4]) == 1 and by_doc[4][0]["n_tokens"] == 2


def test_weighted_median_null_and_nan_weights(spark):
    """NULL values / NULL weights carry no weight: the kernel drops
    them instead of letting a NaN poison the cumsum (which used to
    raise IndexError and kill the task); an all-NULL group yields NULL."""
    rows = [("g1", 1.0, 1.0), ("g1", 2.0, None), ("g1", 3.0, 1.0),
            ("g2", None, 5.0), ("g2", 7.0, 1.0),
            ("g3", 9.0, None), ("g3", None, 1.0)]
    df = spark.createDataFrame(rows, "k string, v double, w double")
    out = {r["k"]: r["weighted_median"]
           for r in C.weighted_median(df, "k", "v", "w").collect()}
    assert out["g1"] == 1.0        # weights (1, 1) over v (1, 3) -> lower med
    assert out["g2"] == 7.0        # the only fully-non-null row
    assert out["g3"] is None       # no usable (v, w) pair at all


def test_ensure_parallelism_tiny_frame_gate(spark, sf_dir):
    """Round-11 gate: a default-width call must return a tiny
    (plan-stats ≤64 KiB) frame UNTOUCHED — no exchange, no .rdd width
    probe (which executes multi-stage upstreams) — while explicit
    min_partitions bypasses the gate and still spreads."""
    from ethereum2_etl_airflow_spark.functions.layout import (
        ensure_parallelism, plan_bytes)

    docs = load_table(spark, sf_dir, "documents")
    tiny = docs.select("doc_id").orderBy("doc_id").limit(16)
    assert plan_bytes(tiny) is not None and plan_bytes(tiny) <= (1 << 16)
    out = ensure_parallelism(tiny)
    assert out is tiny  # identity: the gate returned it untouched
    # explicit width bypasses the gate: the result is a repartition
    forced = ensure_parallelism(tiny, min_partitions=4)
    assert forced is not tiny
    assert forced.rdd.getNumPartitions() == 4
    # values are unaffected either way (layout-only contract)
    assert sorted(r["doc_id"] for r in out.collect()) == \
        sorted(r["doc_id"] for r in forced.collect())
