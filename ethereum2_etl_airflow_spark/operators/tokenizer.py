"""Distributed BPE tokenizer training + application — the tokenizer
HALF of a pretraining pipeline (`operators/text.py` counts tokens with
a fixed regex; this module LEARNS the vocabulary).

Textbook byte-pair encoding (Sennrich et al., ACL 2016), distributed
the way it actually scales:

- Training never touches the corpus after one pass: the corpus
  collapses to a DISTINCT (word, freq) table (vocabulary-bounded —
  millions of rows for a 100 TB corpus, not trillions), and every merge
  round runs over that table alone.
- Each round is: adjacent-pair counts (one explode + one map-side-
  combining groupBy), a 1-ROW collect of the argmax pair (bounded
  driver state, like the binning cutpoints precedent), and a narrow
  ``aggregate``-lambda rewrite of the symbol arrays.  ``localCheckpoint``
  per round bounds lineage exactly like
  :func:`..operators.graph.pagerank_int`.
- Encoding broadcasts the learned merge list and applies it in an
  Arrow-batched ``mapInPandas`` kernel with per-batch word memoization
  — the corpus-sized stage is one narrow Python pass, no shuffle.

Determinism: the argmax pair breaks ties by (count desc, a asc, b asc),
so training is reproducible on any engine/partitioning; the pytest
suite asserts EXACT equality with a pure-Python reference BPE trainer.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, functions as F

__all__ = ["word_freqs", "bpe_pair_counts", "bpe_train", "bpe_encode"]


def word_freqs(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, freq) over the corpus — BPE's sufficient statistic.  One
    explode + one combining groupBy; everything downstream is bounded
    by |vocab|, not |corpus|."""
    from .text import tokens

    return (docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count("*").alias("freq")))


_CHARS = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"

_PAIRS = ("CASE WHEN size(syms) < 2 THEN array() ELSE "
          "transform(sequence(0, size(syms) - 2), "
          "i -> struct(syms[i] AS a, syms[i + 1] AS b)) END")


def _with_syms(words: DataFrame) -> DataFrame:
    return words.select("word", "freq", F.expr(_CHARS).alias("syms"))


def bpe_pair_counts(words_or_docs: DataFrame,
                    text_col: str = "text") -> DataFrame:
    """Frequency-weighted adjacent symbol-pair counts at round 0
    (symbols = characters) — the statistic each BPE round maximizes.
    Accepts a documents table (computes :func:`word_freqs` first) or a
    pre-split (word, freq, syms) table."""
    df = words_or_docs
    if "syms" not in df.columns:
        if "freq" not in df.columns:
            df = word_freqs(df, text_col)
        df = _with_syms(df)
    return (df.select("freq", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").cast("long").alias("cnt")))


def _sql_quote(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(a: str, b: str) -> str:
    """Left-to-right non-overlapping replacement of adjacent (a, b)
    with a||b, as a pure ``aggregate`` lambda over the symbol array —
    the textbook merge semantics, zero Python in the plan."""
    qa, qb = _sql_quote(a), _sql_quote(b),
    qab = _sql_quote(a + b)
    return f"""aggregate(
      syms,
      named_struct('acc', cast(array() as array<string>),
                   'pend', cast(null as string)),
      (st, x) -> CASE
        WHEN st.pend IS NULL THEN named_struct('acc', st.acc, 'pend', x)
        WHEN st.pend = {qa} AND x = {qb} THEN
          named_struct('acc', concat(st.acc, array({qab})),
                       'pend', cast(null as string))
        ELSE named_struct('acc', concat(st.acc, array(st.pend)), 'pend', x)
      END,
      st -> CASE WHEN st.pend IS NULL THEN st.acc
                 ELSE concat(st.acc, array(st.pend)) END)"""


def bpe_train(docs: DataFrame, n_merges: int = 20,
              text_col: str = "text") -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from the corpus; returns the
    rank-ordered merge list [(a, b), ...].

    Driver state is exactly n_merges 1-row collects (the per-round
    argmax) — bounded and documented; all counting and rewriting stays
    distributed.  Stops early when no pair repeats."""
    syms = _with_syms(word_freqs(docs, text_col)) \
        .localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = (bpe_pair_counts(syms)
                .orderBy(F.col("cnt").desc(), "a", "b").limit(1).collect())
        if not best or best[0]["cnt"] < 2:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        syms = (syms.select("word", "freq",
                            F.expr(_merge_expr(a, b)).alias("syms"))
                .localCheckpoint(eager=True))
        # free the previous round's checkpoint blocks (see
        # operators.graph._release_round_blocks)
        from .graph import _release_round_blocks

        _release_round_blocks()
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Apply a learned merge list to the corpus: (id, n_tokens,
    n_pieces, pieces) per document, where ``pieces`` concatenates the
    BPE segmentation of every token.

    The merge list broadcasts with the serialized kernel; distinct
    words within an Arrow batch are encoded once (memo dict), so the
    per-batch cost tracks unique words, not token occurrences.  The
    output id column keeps ``id_col``'s name and input type (string
    ids work).  ``encode_word`` is the textbook O(L²)-per-unique-word
    scan — the memo makes it irrelevant at natural-language word
    lengths; if encode ever dominates (long agglutinative tokens, no
    pre-split), the heap/linked-list merge is the O(L log L) upgrade."""
    import pandas as pd

    from pyspark.sql import types as T

    from .text import WORD_RE

    import re

    word_re = re.compile(WORD_RE)
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(w: str) -> list[str]:
        syms = list(w)
        # textbook encode: repeatedly merge the lowest-rank adjacent
        # pair until none applies (equivalent to replaying merges in
        # rank order)
        while len(syms) > 1:
            best_rank, best_i = None, None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_i = r, i
            if best_i is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        return syms

    # id field named after id_col and typed from the input schema, so a
    # renamed or string id column round-trips instead of breaking on a
    # hardcoded doc_id:LongType + int() cast
    schema = T.StructType([
        T.StructField(id_col, docs.schema[id_col].dataType),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("n_pieces", T.IntegerType()),
        T.StructField("pieces", T.ArrayType(T.StringType())),
    ])

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        memo: dict[str, list[str]] = {}
        for pdf in batches:
            out = []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                words = word_re.findall((text or "").lower())
                pieces: list[str] = []
                for w in words:
                    enc = memo.get(w)
                    if enc is None:
                        enc = memo[w] = encode_word(w)
                    pieces.extend(enc)
                out.append((doc_id, len(words), len(pieces), pieces))
            yield pd.DataFrame(out, columns=[f.name for f in schema.fields])

    return docs.select(id_col, text_col).mapInPandas(run, schema=schema)
