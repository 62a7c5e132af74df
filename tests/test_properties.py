"""Property-based tests (hypothesis): the distributed implementations
must agree with trivially-correct driver-side references on arbitrary
small inputs — catching edge cases fixed fixtures don't reach."""

from __future__ import annotations

from datetime import datetime, timedelta, timezone

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.functions import chaintime as ct
from ethereum2_etl_airflow_spark.functions.asof import asof_join

# one Spark round-trip per example is expensive — keep examples few and
# inputs small; the point is shape coverage, not volume
SET = settings(max_examples=12, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@SET
@given(st.lists(
    st.tuples(st.integers(0, 3),              # key
              st.integers(0, 50),             # probe ts (seconds)
              ),
    min_size=1, max_size=12),
    st.lists(
    st.tuples(st.integers(0, 3),
              st.integers(0, 50),
              st.integers(0, 99)),            # ref value
    min_size=0, max_size=12))
def test_asof_join_matches_bruteforce(spark, left_rows, right_rows):
    left = spark.createDataFrame(
        [(k, i, t) for i, (k, t) in enumerate(left_rows)],
        "k long, row_id long, t long") \
        .select("k", "row_id", F.timestamp_seconds("t").alias("ts"))
    if right_rows:
        right = spark.createDataFrame(
            [(k, t, v) for (k, t, v) in right_rows], "k long, t long, v long") \
            .select("k", F.timestamp_seconds("t").alias("rts"), "v")
    else:
        right = spark.createDataFrame([], "k long, rts timestamp, v long")

    got = {r["row_id"]: r["asof_v"]
           for r in asof_join(left, right, "k", "ts", "rts").collect()}

    # brute force: per probe, max-(ts, then v) reference at-or-before.
    # mirror the operator's tie rule: among equal rts candidates the
    # union-marker keeps the last-encountered payload, which after the
    # (ts, tag) sort is ordering-dependent — so only compare when the
    # winning timestamp is unique, and otherwise assert membership.
    for i, (k, t) in enumerate(left_rows):
        cands = [(rt, v) for (rk, rt, v) in right_rows if rk == k and rt <= t]
        if not cands:
            assert got[i] is None
            continue
        best_ts = max(rt for rt, _ in cands)
        vals = {v for rt, v in cands if rt == best_ts}
        assert got[i] in vals


@SET
@given(st.integers(86_400, 10_000_000))  # past the partial genesis day
def test_chaintime_slot_roundtrip(_spark_unused, offset):
    ts = ct.GENESIS_UNIX + offset
    slot = (ts - ct.GENESIS_UNIX) // ct.SECONDS_PER_SLOT
    d = datetime.fromtimestamp(ts, tz=timezone.utc)
    lo, hi = ct.block_range_for_date(d)
    assert lo <= slot <= hi
    # the day range is exactly one day of slots
    assert hi - lo + 1 == 86400 // ct.SECONDS_PER_SLOT
    elo, ehi = ct.epoch_range_for_date(d)
    assert elo == lo // ct.SLOTS_PER_EPOCH and ehi == hi // ct.SLOTS_PER_EPOCH


# fixture passthrough for hypothesis (session fixture can't be injected
# into @given directly)
import pytest  # noqa: E402


@pytest.fixture()
def _spark_unused():
    return None


@SET
@given(st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]),   # group
              st.integers(0, 30)),                 # token count
    min_size=0, max_size=25),
    st.integers(1, 7))
def test_pack_offsets_matches_bruteforce(spark, rows, budget):
    from ethereum2_etl_airflow_spark.operators.curation import pack_offsets

    data = [(g, i, "w " * n) for i, (g, n) in enumerate(rows)]
    if not data:
        return
    df = spark.createDataFrame(data, "lang string, doc_id long, text string")
    got = {r["doc_id"]: (r["start_off"], r["first_block"], r["last_block"])
           for r in pack_offsets(df, budget=budget).collect()}

    # brute force: cumulative offsets per group in doc_id order
    run: dict = {}
    for g, i, text in sorted(data, key=lambda t: (t[0], t[1])):
        n_tok = len(text.split())
        start = run.get(g, 0)
        run[g] = start + n_tok
        first = start // budget
        last = (start + max(n_tok, 1) - 1) // budget
        assert got[i] == (start, first, last), (i, got[i], (start, first, last))


@SET
@given(st.lists(
    st.tuples(st.sampled_from(["x", "y"]),        # key
              st.integers(0, 99)),                 # order value
    min_size=0, max_size=25),
    st.integers(1, 5))
def test_cap_per_key_matches_bruteforce(spark, rows, cap):
    from ethereum2_etl_airflow_spark.operators.curation import cap_per_key

    # unique order values per key to keep the expected set well-defined
    seen: set = set()
    data = []
    for i, (k, v) in enumerate(rows):
        if (k, v) not in seen:
            seen.add((k, v))
            data.append((k, v))
    if not data:
        return
    df = spark.createDataFrame(data, "k string, v long")
    got = {(r["k"], r["v"]) for r in cap_per_key(df, "k", "v", cap).collect()}

    expect: set = set()
    by_key: dict = {}
    for k, v in data:
        by_key.setdefault(k, []).append(v)
    for k, vs in by_key.items():
        for v in sorted(vs)[:cap]:
            expect.add((k, v))
    assert got == expect


@SET
@given(st.lists(st.text(alphabet="ab ", min_size=6, max_size=40),
                min_size=2, max_size=8))
def test_minhash_exact_matches_bruteforce_bands(spark, texts):
    """Portable-hash MinHash: the banded bucket join must produce exactly
    the pairs whose md5-derived signatures share >= 1 band — computed
    here by brute force over all pairs."""
    import hashlib

    from ethereum2_etl_airflow_spark.operators.dedup import (
        minhash_exact_pairs)

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["id_a"], r["id_b"]): r["n_shared_bands"]
           for r in minhash_exact_pairs(df).collect()}

    # driver-side reference: same tokenizer, same hash family — the
    # one-hash-many-slices form (h_s = 8-hex-char slice s%4 of
    # md5((s div 4) || '|' || shingle), round-11)
    import re

    def sig(text):
        toks = re.findall(r"[a-z0-9]+", text.lower())
        shs = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if not shs:
            return None
        return [min(hashlib.md5(f"{s // 4}|{sh}".encode()).hexdigest()
                    [8 * (s % 4):8 * (s % 4) + 8]
                    for sh in shs) for s in range(8)]

    sigs = {i: sig(t) for i, t in rows}
    exp = {}
    for a in range(len(rows)):
        for b in range(a + 1, len(rows)):
            sa, sb = sigs[a], sigs[b]
            if sa is None or sb is None:
                continue
            shared = sum(1 for band in range(4)
                         if sa[2 * band:2 * band + 2]
                         == sb[2 * band:2 * band + 2])
            if shared:
                exp[(a, b)] = shared
    assert got == exp


@SET
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=1, max_size=8),
       st.integers(2, 6), st.integers(1, 6))
def test_chunk_sliding_covers_every_token_once_per_stride(
        spark, texts, window, stride):
    """Every token of every document appears in at least one chunk, the
    first chunk starts at 0, starts advance by exactly the stride, and
    chunk text is the exact token slice."""
    from ethereum2_etl_airflow_spark.operators.curation import (
        chunk_sliding)

    stride = min(stride, window)
    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    out = chunk_sliding(df, window=window, stride=stride).collect()
    toks = {i: [t for t in txt.lower().split() if t]
            for i, txt in enumerate(texts)}
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, tk in toks.items():
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if not tk:
            assert not chunks
            continue
        assert chunks[0]["start"] == 0
        covered = set()
        for c in chunks:
            assert c["start"] == c["chunk_id"] * stride
            words = c["chunk_text"].split()
            assert words == tk[c["start"]:c["start"] + window]
            covered.update(range(c["start"], c["start"] + len(words)))
        assert covered == set(range(len(tk)))


@SET
@given(st.lists(st.integers(0, 10_000), min_size=1, max_size=40),
       st.lists(st.integers(0, 10_000), min_size=0, max_size=40))
def test_bloom_semi_join_equals_plain_semi_join(spark, big, small):
    from ethereum2_etl_airflow_spark.functions.bloom import bloom_semi_join

    bdf = spark.createDataFrame([(x,) for x in big], "k long")
    sdf = (spark.createDataFrame([(x,) for x in small], "k long")
           if small else spark.createDataFrame([], "k long"))
    got = sorted(r["k"] for r in
                 bloom_semi_join(bdf, sdf, "k", m_bits=1 << 12).collect())
    want = sorted(r["k"] for r in
                  bdf.join(sdf, "k", "left_semi").collect())
    assert got == want


@SET
@given(st.lists(st.text(alphabet="abc ", min_size=1, max_size=20),
                min_size=1, max_size=10))
def test_cms_estimate_at_least_exact_count(spark, texts):
    from collections import Counter

    from ethereum2_etl_airflow_spark.operators.quality import (
        cms_build, cms_estimate)

    df = spark.createDataFrame(list(enumerate(texts)),
                               "doc_id long, text string")
    exact = Counter(t for txt in texts for t in txt.lower().split() if t)
    if not exact:
        return
    sketch = cms_build(df)
    probes = spark.createDataFrame([(t,) for t in exact], "t string")
    est = {r["t"]: r["n_est"]
           for r in cms_estimate(sketch, probes).collect()}
    for t, n in exact.items():
        assert est[t] >= n        # CMS never underestimates


@SET
@given(st.lists(st.text(
    alphabet="abc 0", min_size=0, max_size=40), min_size=1, max_size=8),
    st.integers(1, 8))
def test_bpe_train_matches_reference_on_arbitrary_text(spark, texts,
                                                       n_merges):
    """The distributed BPE trainer must agree EXACTLY (order, content,
    early stop) with the textbook driver-side trainer on arbitrary
    corpora — including empty docs, single chars, and all-dup tokens."""
    import re

    from ethereum2_etl_airflow_spark.operators.tokenizer import bpe_train
    from test_extension import _reference_bpe

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    wf: dict = {}
    for t in texts:
        for w in re.findall("[a-z0-9]+", t.lower()):
            wf[w] = wf.get(w, 0) + 1
    assert bpe_train(docs, n_merges=n_merges) == _reference_bpe(wf, n_merges)


@SET
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=30),
                min_size=1, max_size=6))
def test_bpe_encode_roundtrip_property(spark, texts):
    """Encoding never loses characters: pieces concatenate back to the
    tokenized character stream for any corpus and any learned merges."""
    import re

    from ethereum2_etl_airflow_spark.operators.tokenizer import (
        bpe_encode, bpe_train)

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges = bpe_train(docs, n_merges=4)
    for r in bpe_encode(docs, merges).collect():
        words = re.findall("[a-z0-9]+", texts[r["doc_id"]].lower())
        assert "".join(r["pieces"]) == "".join(words)
        assert r["n_tokens"] == len(words)


@SET
@given(st.lists(st.integers(0, 1000), min_size=1, max_size=40,
                unique=True),
       st.integers(0, 10), st.integers(0, 10))
def test_bernoulli_keep_monotone_in_score(spark, ids, s_lo, s_hi):
    """Derandomized sampling is MONOTONE: raising every document's score
    can only grow the kept set (the md5 threshold test is pointwise
    monotone in the score) — the property that makes score tuning safe
    to reason about."""
    from ethereum2_etl_airflow_spark.operators.scoring import (
        bernoulli_keep)

    lo, hi = sorted((s_lo, s_hi))
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    keep_lo = {r["doc_id"] for r in
               bernoulli_keep(docs, F.lit(lo / 10.0)).collect()}
    keep_hi = {r["doc_id"] for r in
               bernoulli_keep(docs, F.lit(hi / 10.0)).collect()}
    assert keep_lo <= keep_hi


@SET
@given(st.lists(st.text(alphabet="abcd ", min_size=0, max_size=60),
                min_size=2, max_size=8))
def test_repeated_spans_duplicated_doc_fully_flagged(spark, texts):
    """Planting an exact duplicate of a document makes EVERY one of its
    spans corpus-repeated — repeated_span_hits must report 100% for
    both copies (when they have any spans at all)."""
    from ethereum2_etl_airflow_spark.operators.dedup import (
        repeated_span_hits)

    n = len(texts)
    rows = [(i, t) for i, t in enumerate(texts)] + [(n, texts[0])]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hits = {r["doc_id"]: r
            for r in repeated_span_hits(docs, n=3, min_docs=2).collect()}
    for d in (0, n):
        if d in hits:                      # docs with >= 3 tokens only
            assert hits[d]["n_repeated"] == hits[d]["n_spans"]
            assert hits[d]["repeated_pct"] == 100


@given(st.integers(1, 6), st.integers(1, 6), st.integers(0, 5),
       st.integers(0, 10**9))
def test_y4m_roundtrip_property(w, h, n, seed):
    """make_y4m -> _decode_y4m is lossless for any dims/frames/seed:
    header fields, frame count, and every luma byte round-trip."""
    from ethereum2_etl_airflow_spark.operators.multimodal import (
        _decode_y4m, make_y4m)

    clip = make_y4m(w, h, n, seed=seed)
    gw, gh, frames = _decode_y4m(clip)
    assert (gw, gh, len(frames)) == (w, h, n)
    for t, fr in enumerate(frames):
        assert list(fr) == [(x + 3 * y + 7 * t + seed) % 256
                            for y in range(h) for x in range(w)]


@given(st.integers(0, 255))
def test_mulaw_expand_matches_table_properties(u):
    """The µ-law expansion is bounded (|s| <= 32124), odd-symmetric
    under the sign bit (expand(u ^ 0x80) == -expand(u)), and the two
    silence codes decode to exactly 0."""
    from ethereum2_etl_airflow_spark.operators.multimodal import (
        _mulaw_expand)

    s = _mulaw_expand(u)
    assert -32124 <= s <= 32124
    assert _mulaw_expand(u ^ 0x80) == -s
    if u in (0x7F, 0xFF):
        assert s == 0


@SET
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=1, max_size=6),
       st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=1, max_size=6))
def test_lm_bits_match_python_reference(spark, train_texts, score_texts):
    """The distributed bigram-LM bit-cost equals a trivially-correct
    pure-Python scorer on arbitrary tiny corpora (add-one smoothing,
    floor-log2 bits, fixed-point mass)."""
    import math
    import re
    from collections import Counter

    from ethereum2_etl_airflow_spark.operators.lm import (
        PROB_SCALE, perplexity_scores)

    tok = lambda s: re.findall(r"[a-z0-9]+", (s or "").lower())
    uni, bi = Counter(), Counter()
    for t in train_texts:
        ws = tok(t)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    v = max(len(uni), 1)

    def ref(text):
        ws = tok(text)
        n = oov = bits = fp = 0
        for a, b in zip(ws, ws[1:]):
            c2, c1 = bi.get((a, b), 0), uni.get(a, 0)
            n += 1
            oov += c2 == 0
            bits += int(math.log2((c1 + v) // (c2 + 1))) \
                if (c1 + v) // (c2 + 1) >= 1 else 0
            fp += ((c2 + 1) * PROB_SCALE) // (c1 + v)
        return (n, oov, bits, fp)

    train = spark.createDataFrame(
        [(i, t) for i, t in enumerate(train_texts)],
        "doc_id long, text string")
    corpus = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(score_texts)],
        "doc_id long, text string")
    got = {r["doc_id"] - 100: (r["n_bigrams"], r["oov_bigrams"],
                               r["ppl_bits"], r["probmass_fp"])
           for r in perplexity_scores(corpus, train).collect()}
    want = {i: ref(t) for i, t in enumerate(score_texts)}
    assert got == want


@SET
@given(st.lists(st.integers(0, 6), min_size=0, max_size=30),
       st.integers(2, 4), st.integers(2, 4))
def test_winnowing_matches_python_reference(spark, token_ids, k, w):
    """Distributed winnowing selects exactly the fingerprints the
    textbook per-document algorithm selects (min per window over
    k-gram hashes), for arbitrary k/w and token streams."""
    import hashlib

    from ethereum2_etl_airflow_spark.operators.text import (
        winnow_fingerprints)

    words = [f"w{t}" for t in token_ids]

    def h(gram: str) -> int:
        return int(hashlib.md5(gram.encode()).hexdigest()[:8], 16)

    hs = [h(" ".join(words[i:i + k]))
          for i in range(len(words) - k + 1)]
    want = {min(hs[j:j + w]) for j in range(len(hs) - w + 1)}

    docs = spark.createDataFrame([(1, " ".join(words))],
                                 "doc_id long, text string")
    got = {r["fp"] for r in winnow_fingerprints(docs, k=k, w=w).collect()}
    assert got == want


@SET
@given(st.lists(st.tuples(st.text(alphabet="ab ", min_size=0, max_size=30),
                          st.integers(0, 2)),
                min_size=2, max_size=8))
def test_sparse_cosine_strategies_equal_on_arbitrary_corpora(spark, rows):
    """The round-9 strategy contract beyond the fixture check: the
    blocked-GEMM default and the inverted-index path return the
    IDENTICAL pair set with bit-identical integer dot AND double cosine
    on arbitrary corpora — including empty texts, single-token docs,
    duplicate texts and single-doc blocks."""
    from ethereum2_etl_airflow_spark.operators.similarity import (
        sparse_cosine_pairs)

    docs = spark.createDataFrame(
        [(i, t, f"b{b}") for i, (t, b) in enumerate(rows)],
        "doc_id long, text string, source string")
    gemm = {(r["id_a"], r["id_b"], r["dot"], r["cosine"]) for r in
            sparse_cosine_pairs(docs, threshold_millis=200).collect()}
    idx = {(r["id_a"], r["id_b"], r["dot"], r["cosine"]) for r in
           sparse_cosine_pairs(docs, threshold_millis=200,
                               strategy="index").collect()}
    assert gemm == idx


@SET
@given(st.lists(st.text(alphabet="ab ", min_size=0, max_size=40),
                min_size=1, max_size=6),
       st.integers(2, 5))
def test_best_passages_matches_bruteforce(spark, texts, w):
    """best_passages must agree with a trivial driver-side scan of every
    window on arbitrary texts and window sizes: same earliest-max
    offset, same hit count, same joined passage."""
    import re

    from ethereum2_etl_airflow_spark.operators.text import best_passages

    qterms = ["a", "ab"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    ranking = spark.createDataFrame(
        [(1, i) for i in range(len(texts))], "query_id long, doc_id long")
    got = {r["doc_id"]: (r["offset"], r["n_hits"], r["passage"])
           for r in best_passages(docs, ranking, {1: qterms},
                                  w=w).collect()}

    for i, t in enumerate(texts):
        toks = re.findall(r"[a-z0-9]+", t.lower())
        nw = max(len(toks) - w + 1, 1)
        scores = [sum(1 for x in toks[j:j + w] if x in qterms)
                  for j in range(nw)]
        best = max(scores)
        off = scores.index(best) + 1
        exp = (off, best, " ".join(toks[off - 1:off - 1 + w]))
        assert got[i] == exp, (t, w, got[i], exp)
