"""Declarative data-quality expectations — the deequ/Great-Expectations
category re-expressed as ONE Spark aggregate.

The reference's verify stage (`/root/reference/dags/ethereum2etl_airflow/
build_load_dag.py:109-132` + `verify/sqls/*.sql`) hard-codes four
assertion queries, each its own scan.  This operator generalizes the
category: a constraint list compiles into a single map-side-combining
aggregate — one scan however many constraints — and the verdicts come
back as rows, so a verify DAG task can assert on them or persist them as
a quality report table.

Every metric is an exact integer count (violations), so the report is
bit-identical cross-engine and SQL-oracle-checkable.

Constraint specs (name, kind, params):

- ``("c", "not_null", col)``            — col IS NOT NULL violations
- ``("c", "unique", col)``              — rows minus distinct values
- ``("c", "range", col, lo, hi)``       — col outside [lo, hi]
- ``("c", "in_set", col, values)``      — col not in the accepted set
- ``("c", "matches", col, regex)``      — col not rlike regex
- ``("c", "min_rows", n)``              — dataset has < n rows

Scale shape: conditional-count aggregates all partial-combine map-side;
``unique`` adds a count(distinct) (Spark expands to one extra exchange);
the final unpivot to rows is over a single aggregate row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["run_expectations", "cms_build", "cms_build_tokens",
           "cms_build_counts", "cms_estimate",
           "mdq_sample", "mdq_quantiles", "mdq_bucket_registers",
           "hll_portable_registers", "hll_portable_estimate"]


def run_expectations(df: DataFrame, specs: list[tuple]) -> DataFrame:
    """(constraint, violations, passed) — one row per spec, computed in
    a single pass over ``df`` (plus Spark's distinct-expansion for any
    ``unique`` specs).

    NULL semantics (matches Great Expectations' default): ``range``,
    ``in_set`` and ``matches`` evaluate only non-NULL values — a NULL
    makes the predicate NULL and ``count_if`` skips it, so an all-NULL
    column satisfies those constraints.  Completeness is its own
    dimension: pair them with a ``not_null`` spec on the same column
    when NULLs should fail."""
    if not specs:
        raise ValueError("run_expectations: specs list is empty — "
                         "at least one constraint is required")
    aggs = []
    names = []
    for spec in specs:
        name, kind = spec[0], spec[1]
        names.append(name)
        if kind == "not_null":
            col = spec[2]
            aggs.append(F.count_if(F.col(col).isNull()))
        elif kind == "unique":
            col = spec[2]
            aggs.append(F.count(F.col(col))
                        - F.countDistinct(F.col(col)))
        elif kind == "range":
            col, lo, hi = spec[2], spec[3], spec[4]
            aggs.append(F.count_if(~F.col(col).between(lo, hi)))
        elif kind == "in_set":
            col, values = spec[2], spec[3]
            aggs.append(F.count_if(~F.col(col).isin(list(values))))
        elif kind == "matches":
            col, pat = spec[2], spec[3]
            aggs.append(F.count_if(~F.col(col).rlike(pat)))
        elif kind == "min_rows":
            n = spec[2]
            aggs.append(F.when(F.count(F.lit(1)) >= n, F.lit(0))
                        .otherwise(n - F.count(F.lit(1))))
        else:
            raise ValueError(f"unknown constraint kind: {kind}")
    one = df.agg(*[a.cast("long").alias(f"v{i}")
                   for i, a in enumerate(aggs)])
    rows = F.array(*[
        F.struct(F.lit(n).alias("constraint"),
                 F.col(f"v{i}").alias("violations"))
        for i, n in enumerate(names)])
    return (one.select(F.explode(rows).alias("r"))
            .select("r.constraint", "r.violations",
                    (F.col("r.violations") == 0).alias("passed")))


def _cms_bucket_array(col, d: int, w: int):
    """The CMS hash family, in ONE place so build / weighted-build /
    estimate can never drift: an array of ``d`` bucket indices, where
    bucket j is hex slice ``j mod 4`` of digest ``md5((j div 4) | col)``
    taken mod ``w``.  The digests are let-bound
    (:func:`..functions.let.bind`) so each md5 evaluates once per row
    however many slices read it."""
    from ..functions.let import bind

    n_md5 = (d + 3) // 4

    def mk(hs):
        return F.array(*[
            F.pmod(F.conv(F.substring(F.element_at(hs, j // 4 + 1),
                                      1 + 8 * (j % 4), 8),
                          16, 10).cast("long"), F.lit(w))
            for j in range(d)])

    return bind(F.array(*[F.md5(F.concat(F.lit(f"{m}|"), col))
                          for m in range(n_md5)]), mk)


def cms_build(docs: DataFrame, text_col: str = "text",
              d: int = 4, w: int = 1024) -> DataFrame:
    """Count-Min sketch over the corpus token stream — the mergeable
    frequency summary for streaming heavy-hitter tracking: ``d`` hash
    rows × ``w`` counters, stored as a (row, bucket, c) DataFrame of at
    most d·w rows (a constant, however big the corpus).  Shards'
    sketches merge by summing counters — the property that makes CMS
    THE distributed frequency sketch.

    The hash family is md5-derived and SLICED (row j's bucket is hex
    slice ``j mod 4`` of digest ``md5((j div 4) || '|' || tok)`` —
    one-hash-many-slices, the :func:`~.dedup.minhash_exact_pairs`
    idiom: d=4 rows cost ONE md5 per token instead of four, round-11),
    so the sketch — and every estimate off it — is bit-identical
    cross-engine: unlike native-hash sketches (HLL++, rows-only by
    nature) this one is fully SQL-oracle-checkable.  Distinct slices
    of a cryptographic digest are independent uniform 32-bit values —
    exactly the per-row pairwise-independence CMS needs.

    Scale shape: explode tokens × d flat hash projections (codegen) →
    ONE map-side-combining groupBy on (row, bucket): hot tokens combine
    before the exchange and the shuffle carries ≤ d·w rows per map
    task."""
    from .text import tokens

    tok = docs.select(F.explode(tokens(F.col(text_col))).alias("t"))
    return cms_build_tokens(tok, d=d, w=w)


def cms_build_tokens(tok: DataFrame, tok_col: str = "t",
                     d: int = 4, w: int = 1024) -> DataFrame:
    """:func:`cms_build` over an ALREADY-tokenized stream — the shape a
    pipeline that computed the token stream for other consumers (exact
    counts, probes, n-gram stats) uses, so the corpus is tokenized
    once and shared (round-11; the cms_estimate check's three separate
    tokenize passes collapsed onto one cached stream)."""
    rows = tok.select(
        F.posexplode(_cms_bucket_array(F.col(tok_col), d, w))
        .alias("row", "bucket"))
    return (rows.groupBy("row", "bucket")
            .agg(F.count("*").alias("c")))


def cms_build_counts(counts: DataFrame, tok_col: str = "t",
                     cnt_col: str = "n", d: int = 4,
                     w: int = 1024) -> DataFrame:
    """:func:`cms_build` from a PRE-AGGREGATED ``(token, count)`` table:
    ``sketch[j][h_j(t)] = Σ_{t hashing there} count(t)`` — by definition
    the same sketch :func:`cms_build_tokens` builds from the raw stream,
    but the hash family is evaluated once per DISTINCT token instead of
    once per occurrence.  When a pipeline already holds exact counts
    (the usual case: the CMS rides next to a groupBy the consumer needed
    anyway), this drops the sketch's hash work from O(|stream|·d) to
    O(|vocab|·d) and adds no exchange — the counts table is already
    vocab-keyed, and the (row, bucket) groupBy combines map-side to
    ≤ d·w rows (round-11; cut the cms_estimate check's second
    full-stream fan-out)."""
    rows = counts.select(
        F.col(cnt_col).cast("long").alias("__n"),
        F.posexplode(_cms_bucket_array(F.col(tok_col), d, w))
        .alias("row", "bucket"))
    return (rows.groupBy("row", "bucket")
            .agg(F.sum("__n").alias("c")))


def cms_estimate(sketch: DataFrame, probes: DataFrame,
                 probe_col: str = "t", d: int = 4,
                 w: int = 1024, assume_distinct: bool = False) -> DataFrame:
    """Point-frequency estimates from a :func:`cms_build` sketch:
    ``est(t) = min_j sketch[j][h_j(t)]`` — never underestimates, and
    deterministic given the md5 family.  The probe side fans out d rows
    per probe and joins the (≤ d·w row) sketch — broadcast by size.
    Pass ``assume_distinct=True`` when the probe table is already
    unique on ``probe_col`` (a counts/vocab table): the dedup exchange
    is pure overhead there."""
    pr = probes.select(F.col(probe_col).alias("t"))
    if not assume_distinct:
        pr = pr.distinct()
    fan = pr.select("t", F.posexplode(_cms_bucket_array(F.col("t"), d, w))
                    .alias("row", "bucket"))
    return (fan.join(F.broadcast(sketch), ["row", "bucket"], "left")
            .groupBy("t")
            .agg(F.min(F.coalesce("c", F.lit(0))).alias("n_est")))


def hll_portable_registers(df: DataFrame, col: str,
                           b: int = 8) -> DataFrame:
    """HyperLogLog registers with a portable hash — the cross-engine
    twin of the native HLL++ sketch (which is rows-only-checkable by
    nature): register index = low ``b`` bits of the 32-bit md5 prefix,
    rho = leading-zero count of the remaining 24 bits + 1 (computed via
    ``bin()`` string length — no float log anywhere).  Returns at most
    2^b (j, rho) rows; shards merge by max(rho) per register, the HLL
    mergeability contract.

    Scale shape: one map-side-combining groupBy over ≤ 2^b keys."""
    m = 1 << b
    h = F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 8),
               16, 10).cast("long")
    j = F.pmod(h, F.lit(m))
    w = (h / m).cast("long")
    rho = F.when(w == 0, F.lit(25)).otherwise(
        F.lit(25) - F.length(F.bin(w))).cast("int")
    return (df.where(F.col(col).isNotNull())
            .select(j.alias("j"), rho.alias("rho"))
            .groupBy("j").agg(F.max("rho").alias("rho")))


def hll_portable_estimate(registers: DataFrame, b: int = 8) -> DataFrame:
    """Raw HLL estimate from :func:`hll_portable_registers`:
    ``E = alpha_m * m^2 / sum(2^-M[j])`` with empty registers counted
    at 2^0.  Every term is a dyadic rational and the running sum stays
    inside the double mantissa, so the estimate is bit-identical on any
    engine.  The small-range LinearCounting correction needs ln() and
    is left to consumers (n_zero is surfaced for it)."""
    m = 1 << b
    alpha = 0.7213 / (1 + 1.079 / m)
    # coalesce: SUM over zero rows is NULL — an empty register table
    # must still yield the well-defined all-registers-empty estimate
    # alpha * m^2 / m, not NULL
    agg = registers.agg(
        F.coalesce(F.sum(F.pow(F.lit(2.0), -F.col("rho"))),
                   F.lit(0.0)).alias("s_used"),
        F.count("*").alias("n_used"))
    return agg.select(
        (F.lit(m) - F.col("n_used")).cast("long").alias("n_zero"),
        (F.lit(alpha) * m * m
         / (F.col("s_used") + (F.lit(m) - F.col("n_used"))))
        .alias("est_raw"))


def mdq_sample(df: DataFrame, col: str, n: int = 256,
               id_col: str = "doc_id") -> DataFrame:
    """md5-reservoir quantile sketch, build side: the ``n`` rows whose
    ``md5(id)`` sorts smallest, carrying their value — a uniform sample
    whose MEMBERSHIP is a pure function of the ids present, so the
    sketch is deterministic under any partitioning, any engine, any
    run (the portability property KLL/t-digest lack, which is why those
    are rows-only wherever they appear and this one is value-checked).

    Mergeable: the sketch of a union is the n md5-smallest of the
    union of sketches — shards build locally, merge by re-taking the
    n smallest (associative + commutative + idempotent).

    Scale shape: TakeOrdered (per-partition heap + driver merge of
    n·P candidate rows) — never a global sort; the sketch itself is a
    constant-size table."""
    key = F.md5(F.col(id_col).cast("string"))
    return (df.where(F.col(col).isNotNull())
            .select(key.alias("rk"), F.col(col).cast("double").alias("v"))
            .orderBy("rk").limit(n))


def mdq_quantiles(sample: DataFrame, qs: list[float]) -> DataFrame:
    """Quantile estimates off an :func:`mdq_sample` sketch: for each q,
    the value at rank ``ceil(q * m)`` (1-based, clamped) in the value
    order of the m sampled rows — ``percentile_disc`` over the sample.
    Sampling error is the usual order-statistic bound (~1/sqrt(n) in
    rank space); the ESTIMATE is exactly reproducible cross-engine
    because the sample is."""
    from pyspark.sql import Window

    m_cnt = F.count("*").over(Window.partitionBy())
    ranked = sample.select(
        "v", F.row_number().over(Window.orderBy("v", "rk")).alias("r"),
        m_cnt.alias("m"))
    targets = F.array(*[F.lit(float(q)) for q in qs])
    tgt = (ranked.limit(1).select(F.explode(targets).alias("q"))
           .select("q"))
    return (tgt.join(ranked, F.col("r") ==
                     F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("m"))))
            .select("q", F.col("v").alias("value"))
            .orderBy("q"))


def mdq_bucket_registers(df: DataFrame, col: str, n_buckets: int = 64,
                         id_col: str = "doc_id") -> DataFrame:
    """Streaming-friendly form of the md5-reservoir quantile sketch:
    ``n_buckets`` registers, each holding the (md5-minimal id's) value
    within its bucket — a bottom-1-per-bucket uniform sample.  Unlike
    :func:`mdq_sample`'s global TakeOrdered (not expressible as a
    streaming aggregation), this is ONE ``min(struct(rk, v))`` groupBy,
    so Structured Streaming maintains it in complete mode with
    constant state (≤ n_buckets rows), and merge-by-min makes streamed
    registers equal batch ones exactly — same contract as the CMS and
    portable-HLL registers."""
    key = F.md5(F.col(id_col).cast("string"))
    b = F.conv(F.substring(key, 1, 8), 16, 10).cast("long") % n_buckets
    return (df.where(F.col(col).isNotNull())
            .select(b.alias("bucket"), key.alias("rk"),
                    F.col(col).cast("double").alias("v"))
            .groupBy("bucket")
            .agg(F.min(F.struct("rk", "v")).alias("m"))
            .select("bucket", F.col("m.rk").alias("rk"),
                    F.col("m.v").alias("v")))
