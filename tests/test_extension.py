"""Extension operators (SURVEY §2.9): semantic assertions beyond the
oracle parity harness — planted duplicates are found, LSH approximations
track the exact tier, the multimodal stub behaves."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.operators import dedup as D
from ethereum2_etl_airflow_spark.operators import multimodal as M
from ethereum2_etl_airflow_spark.operators import similarity as S
from ethereum2_etl_airflow_spark.operators import text as X
from ethereum2_etl_airflow_spark.plans.checks_extension import (
    _dup_corpus, _emb_corpus, _neardup_corpus,
)
from ethereum2_etl_airflow_spark.sources.testdata import load_table


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return load_table(spark, sf_dir, "documents").cache()


def test_dedup_exact_collapses_planted_dups(spark, sf_dir):
    corpus = _dup_corpus(spark, sf_dir)
    n_docs = corpus.count() // 2
    out = D.dedup_exact(corpus)
    assert out.count() == n_docs  # each planted pair collapsed
    assert out.agg(F.max("n_copies")).first()[0] == 2
    # survivor is always the original (min id)
    assert out.agg(F.max("doc_id")).first()[0] < 1000000


def test_ngram_jaccard_finds_planted_neardups(spark, sf_dir):
    corpus = _neardup_corpus(spark, sf_dir)
    pairs = D.ngram_jaccard_pairs(corpus, threshold_tenths=6).collect()
    planted = {(r["id_a"], r["id_b"]) for r in pairs
               if r["id_b"] == r["id_a"] + 1000000}
    n_variants = corpus.where(F.col("doc_id") >= 1000000).count()
    # nearly all truncated variants must pair with their original
    assert len(planted) >= int(0.9 * n_variants)


def test_minhash_tracks_exact_jaccard(spark, sf_dir):
    corpus = _neardup_corpus(spark, sf_dir)
    exact = {(r["id_a"], r["id_b"])
             for r in D.ngram_jaccard_pairs(corpus, 6).collect()
             if r["id_b"] == r["id_a"] + 1000000}
    approx = {(r["id_a"], r["id_b"])
              for r in D.minhash_near_dups(corpus, 0.4).collect()}
    # banded LSH recall over the planted pairs
    assert exact, "fixture produced no exact pairs"
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.8, f"minhash recall {recall:.2f}"


def test_simhash_planted_variants_are_close(spark, sf_dir):
    corpus = _neardup_corpus(spark, sf_dir)
    sigs = D.simhash_signature(corpus)
    cands = D.simhash_candidates(sigs)
    planted = cands.where(F.col("id_b") == F.col("id_a") + 1000000)
    # truncated variants share most token mass → small Hamming distance
    assert planted.count() > 0
    assert planted.agg(F.min("hamming")).first()[0] <= 3


def test_embed_neardup_finds_scaled_copies(spark, sf_dir):
    corpus = _emb_corpus(spark, sf_dir)
    n = corpus.count() // 2
    pairs = D.cosine_near_dup_pairs(corpus, "label", 999)
    planted = pairs.where(F.col("id_b") == F.col("id_a") + 1000000)
    assert planted.count() == n  # every scaled copy found
    # and scores are ~1.0
    assert planted.agg(F.min("cosine")).first()[0] > 0.9999


def test_ann_lsh_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2]
    exact = S.topk_cosine_bruteforce(emb, qids, k=10).collect()
    approx = S.ann_lsh_candidates(emb, qids, k=10).collect()
    ex = {(r["query_id"], r["vec_id"]) for r in exact}
    ap = {(r["query_id"], r["vec_id"]) for r in approx}
    recall = len(ex & ap) / len(ex)
    # generous-radius LSH on a small corpus should track the exact tier
    assert recall >= 0.7, f"ANN recall {recall:.2f}"


def test_lang_id_deterministic_priority(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is here",),   # en stopwords
         ("der hund und die katze ist da",),  # de stopwords
         ("xyzzy qwerty",)],                  # nothing
        "text string")
    out = [r[0] for r in df.select(X.lang_id(F.col("text"))).collect()]
    assert out == ["en", "de", "und"]


def test_multimodal_stub_features(spark, docs):
    media = M.attach_binary_payload(docs.limit(50))
    feats = M.extract_features(media).collect()
    assert len(feats) == 50
    by_id = {r["doc_id"]: r for r in feats}
    row = docs.limit(50).where(F.col("doc_id") == feats[0]["doc_id"]).first()
    raw = row["text"].encode()
    got = by_id[row["doc_id"]]
    assert got["n_bytes"] == len(raw)
    assert got["head_hex"] == raw[:16].hex()
    assert got["feature_sum"] == sum(raw[:256])


def test_multimodal_real_codec_is_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_stub(b"\x89PNG", "image/png")


def test_streaming_hourly_equals_batch(spark, sf_dir):
    from ethereum2_etl_airflow_spark.plans.checks_extension import q_stream_hourly

    ev = load_table(spark, sf_dir, "events")
    batch = {r["hour_start"]: (r["n"], r["start_block"], r["end_block"])
             for r in ev.groupBy(
                 F.date_trunc("hour", "ts").cast("timestamp_ntz")
                 .alias("hour_start"))
             .agg(F.count("*").alias("n"),
                  F.min("event_id").alias("start_block"),
                  F.max("event_id").alias("end_block")).collect()}
    stream = {r["hour_start"]: (r["n"], r["start_block"], r["end_block"])
              for r in q_stream_hourly(spark, sf_dir).collect()}
    assert stream == batch


def test_read_media_dir_binaryfile_source(spark, tmp_path):
    """X5 ingest: binaryFile source → MEDIA_SCHEMA → stubbed decode."""
    import os

    from ethereum2_etl_airflow_spark.operators.multimodal import (
        extract_features, read_media_dir,
    )

    d = tmp_path / "media"
    os.makedirs(d)
    payloads = {f"f{i}.bin": bytes(range(i, i + 40)) for i in range(3)}
    for name, data in payloads.items():
        (d / name).write_bytes(data)
    media = read_media_dir(spark, str(d), glob="*.bin")
    assert media.count() == 3
    assert media.schema["payload"].dataType.typeName() == "binary"
    feats = extract_features(media).collect()
    sizes = sorted(r["n_bytes"] for r in feats)
    assert sizes == [40, 40, 40]
    heads = {r["head_hex"] for r in feats}
    assert bytes(range(0, 16)).hex() in heads
