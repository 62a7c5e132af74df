"""Curation-operator check queries (the :mod:`..operators.curation`
surface): PII scrubbing, heavy hitters, per-domain caps, sequence
packing, k-fold splits, term salience, int8 quantization.

Every check here is fully SQL-expressible, so every entry carries a
DuckDB oracle — integer/string outputs only (or FLOOR-quantized ints),
no float-drift surface anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators import curation as C
from ..sources.testdata import load_table

__all__ = ["CURATION_CHECKS"]


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "embeddings")


# --- PII scrubbing --------------------------------------------------------

def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.pii_scrub(_docs(spark, sf_dir)).orderBy("doc_id")


# same patterns, same sequential semantics ('g' = replace all), counts on
# the progressively-scrubbed text exactly as the operator does
ORACLE_PII_SCRUB = r"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS n_emails,
         regexp_replace(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
             '<EMAIL>', 'g') AS t1
  FROM documents),
s2 AS (
  SELECT doc_id, n_emails,
         len(regexp_extract_all(t1,
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ips,
         regexp_replace(t1, '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
             '<IP>', 'g') AS t2
  FROM s1)
SELECT doc_id, n_emails, n_ips,
       len(regexp_extract_all(t2, '\b\d{9,}\b')) AS n_longnums,
       regexp_replace(t2, '\b\d{9,}\b', '<NUM>', 'g') AS clean
FROM s2 ORDER BY doc_id
"""


# --- heavy hitters --------------------------------------------------------

def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    return C.heavy_hitters(_docs(spark, sf_dir), k=50)


ORACLE_HEAVY_HITTERS = """
SELECT token, COUNT(*) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
      FROM documents)
GROUP BY token ORDER BY n DESC, token LIMIT 50
"""


# --- per-domain cap -------------------------------------------------------

def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    capped = C.cap_per_key(
        _docs(spark, sf_dir).select("doc_id", "source"),
        key_col="source", order_col="doc_id", cap=30)
    return capped.orderBy("source", "doc_id")


ORACLE_DOMAIN_CAP = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_id) AS rn
  FROM documents)
WHERE rn <= 30 ORDER BY source, doc_id
"""


# --- sequence packing -----------------------------------------------------

PACK_BUDGET = 2048


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (C.pack_offsets(_docs(spark, sf_dir), budget=PACK_BUDGET)
            .orderBy("lang", "doc_id"))


ORACLE_PACK_CHUNKS = rf"""
SELECT lang, doc_id, n_tok, start_off,
       CAST(FLOOR(start_off / {PACK_BUDGET}) AS BIGINT) AS first_block,
       CAST(FLOOR((start_off + greatest(n_tok, 1) - 1) / {PACK_BUDGET})
            AS BIGINT) AS last_block
FROM (
  SELECT lang, doc_id,
         CAST(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_tok,
         CAST(COALESCE(SUM(len(regexp_extract_all(text,
              '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
              OVER (PARTITION BY lang ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS start_off
  FROM documents)
ORDER BY lang, doc_id
"""


# --- k-fold assignment ----------------------------------------------------

def q_split_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (C.assign_folds(_docs(spark, sf_dir).select("doc_id"), k=5)
            .orderBy("doc_id"))


ORACLE_SPLIT_FOLDS = """
SELECT doc_id, CAST(
    ((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
   + (strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1)) % 5
   AS INT) AS fold
FROM documents ORDER BY doc_id
"""


# --- term salience --------------------------------------------------------

def q_term_salience(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (C.term_salience(_docs(spark, sf_dir), m=5)
            .orderBy("doc_id", "rank"))


ORACLE_TERM_SALIENCE = """
WITH tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id,
               unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents)
  GROUP BY doc_id, token),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
scored AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfreq.df,
         CAST(FLOOR(tf.tf * 1000000 / dfreq.df) AS BIGINT) AS salience
  FROM tf JOIN dfreq USING (token))
SELECT doc_id, rank, token, tf, df, salience FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                               ORDER BY salience DESC, token) AS rank
  FROM scored)
WHERE rank <= 5 ORDER BY doc_id, rank
"""


# --- int8 embedding quantization ------------------------------------------

def q_emb_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (C.quantize_embeddings(_emb(spark, sf_dir))
            .orderBy("vec_id", "pos"))


# pos is 0-based in Spark's posexplode; DuckDB's range index i is 1-based.
# float32 → DOUBLE widening is exact on both engines, so the double
# multiply/divide/floor chain is bit-identical.
ORACLE_EMB_QUANTIZE = """
SELECT vec_id, i - 1 AS pos,
       CASE WHEN m = 0 THEN 0
            ELSE CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 127.0 / m) AS INT)
       END AS q
FROM (SELECT vec_id, embedding,
             list_max(list_transform(embedding,
                      x -> abs(CAST(x AS DOUBLE)))) AS m
      FROM embeddings), range(1, 65) t(i)
ORDER BY vec_id, pos
"""


# --- CDC latest-by-key merge ----------------------------------------------

def q_merge_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.load import latest_by_key

    ev = load_table(spark, sf_dir, "events")
    return (latest_by_key(ev, ["user_id"], ["ts", "event_id"])
            .select("user_id", "event_id", "ts", "event_type", "value")
            .orderBy("user_id"))


ORACLE_MERGE_LATEST = """
SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events)
WHERE rn = 1 ORDER BY user_id
"""


# --- incremental dedup ----------------------------------------------------

def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import incremental_new_docs

    d = _docs(spark, sf_dir)
    history = d.where(F.col("doc_id") % 2 == 0)
    batch = d.where(F.col("doc_id") % 2 == 1)
    return incremental_new_docs(batch, history).orderBy("doc_id")


ORACLE_DEDUP_INCREMENTAL = r"""
WITH fp AS (
  SELECT doc_id,
         sha256(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
  FROM documents),
batch AS (
  SELECT fp, MIN(doc_id) AS doc_id FROM fp WHERE doc_id % 2 = 1 GROUP BY fp)
SELECT fp, doc_id FROM batch
WHERE fp NOT IN (SELECT fp FROM fp WHERE doc_id % 2 = 0)
ORDER BY doc_id
"""


# --- quantile binning -----------------------------------------------------

def q_bin_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (C.bin_by_quantile(_docs(spark, sf_dir), "n_chars", bins=4)
            .orderBy("doc_id"))


ORACLE_BIN_QUANTILE = """
WITH cuts AS (
  SELECT CAST(percentile_disc(0.25) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS c1,
         CAST(percentile_disc(0.5)  WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS c2,
         CAST(percentile_disc(0.75) WITHIN GROUP (ORDER BY n_chars) AS BIGINT) AS c3
  FROM documents)
SELECT doc_id, n_chars,
       1 + CAST(n_chars > c1 AS INT) + CAST(n_chars > c2 AS INT)
         + CAST(n_chars > c3 AS INT) AS bin
FROM documents, cuts ORDER BY doc_id
"""


# --- P99 outliers ---------------------------------------------------------

def q_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return C.outliers_p99(ev).orderBy("event_id")


ORACLE_OUTLIERS = """
WITH cuts AS (
  SELECT event_type,
         percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
  FROM events GROUP BY event_type)
SELECT event_id, e.event_type, value, p99
FROM events e JOIN cuts USING (event_type)
WHERE value > p99 ORDER BY event_id
"""


# --- funnel ---------------------------------------------------------------

def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return C.funnel(ev).orderBy("user_id")


ORACLE_FUNNEL = """
WITH first AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events
  WHERE event_type = 'click' GROUP BY user_id),
conv AS (
  SELECT e.user_id, MIN(e.ts) AS conv_ts
  FROM events e JOIN first f ON e.user_id = f.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= f.first_ts
  GROUP BY e.user_id)
SELECT f.user_id, CAST(first_ts AS TIMESTAMP) AS first_ts,
       CAST(conv_ts AS TIMESTAMP) AS conv_ts
FROM first f LEFT JOIN conv c ON f.user_id = c.user_id
ORDER BY f.user_id
"""


# --- per-user trend stats (exact integer regression moments) --------------

def q_trend_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user OLS moments over (time, value), all BIGINT-exact: x is
    seconds since the user's first event (centering keeps Σx² inside
    int64 — raw epoch seconds squared would overflow), y is value-millis.
    Consumers derive slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²) driver-
    side; the engine emits only the exact integer moments so the oracle
    hash can't drift.  Two partial-aggregating groupBys + one join, all
    keyed by user — uniform shuffles."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.unix_timestamp(F.col("ts").cast("timestamp")).alias("xs"),
        F.floor(F.col("value") * 1000).cast("long").alias("y"))
    x0 = base.groupBy("user_id").agg(F.min("xs").alias("x0"))
    c = (base.join(x0, "user_id")
         .withColumn("x", F.col("xs") - F.col("x0")))
    return (c.groupBy("user_id")
            .agg(F.count("*").alias("n"),
                 F.sum("x").alias("sum_x"),
                 F.sum("y").alias("sum_y"),
                 F.sum(F.col("x") * F.col("y")).alias("sum_xy"),
                 F.sum(F.col("x") * F.col("x")).alias("sum_x2"))
            .orderBy("user_id"))


ORACLE_TREND_STATS = """
WITH base AS (
  SELECT user_id,
         CAST(FLOOR(EPOCH(ts)) AS BIGINT) AS xs,
         CAST(FLOOR(value * 1000) AS BIGINT) AS y
  FROM events),
x0 AS (SELECT user_id, MIN(xs) AS x0 FROM base GROUP BY user_id),
c AS (SELECT base.user_id, xs - x0 AS x, y
      FROM base JOIN x0 ON base.user_id = x0.user_id)
SELECT user_id, COUNT(*) AS n,
       CAST(SUM(x) AS BIGINT) AS sum_x,
       CAST(SUM(y) AS BIGINT) AS sum_y,
       CAST(SUM(x * y) AS BIGINT) AS sum_xy,
       CAST(SUM(x * x) AS BIGINT) AS sum_x2
FROM c GROUP BY user_id ORDER BY user_id
"""


# --- contamination score --------------------------------------------------

def q_contamination_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bench-overlap fraction (integer n_hit / n_shingles);
    bench set = doc_id % 97 == 0, same split as `decontaminate`."""
    from ..operators.dedup import contamination_score

    d = _docs(spark, sf_dir)
    return (contamination_score(d.where(F.col("doc_id") % 97 != 0),
                                d.where(F.col("doc_id") % 97 == 0))
            .orderBy("doc_id"))


ORACLE_CONTAMINATION_SCORE = """
WITH sh AS (
  SELECT DISTINCT doc_id, UNNEST(
    CASE WHEN len(regexp_extract_all(lower(text), '[a-z0-9]+')) >= 3 THEN
      list_transform(
        range(1, len(regexp_extract_all(lower(text), '[a-z0-9]+')) - 1),
        i -> regexp_extract_all(lower(text), '[a-z0-9]+')[i] || ' '
          || regexp_extract_all(lower(text), '[a-z0-9]+')[i+1] || ' '
          || regexp_extract_all(lower(text), '[a-z0-9]+')[i+2])
    ELSE [] END) AS sh
  FROM documents),
t AS (SELECT * FROM sh WHERE doc_id % 97 != 0),
b AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0)
SELECT t.doc_id,
       COUNT(*) AS n_shingles,
       CAST(COUNT(CASE WHEN b.sh IS NOT NULL THEN 1 END) AS BIGINT) AS n_hit
FROM t LEFT JOIN b ON t.sh = b.sh
GROUP BY t.doc_id ORDER BY t.doc_id
"""


# --- Z-order layout key ---------------------------------------------------

def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton key over (n_chars, doc_id) low 16 bits — the 2-D
    clustering key a Z-ordered write layout sorts by (pure shift/mask
    math, engine-identical)."""
    from ..functions.layout import zorder_key

    d = _docs(spark, sf_dir)
    return (d.select("doc_id", "n_chars",
                     zorder_key(F.col("n_chars"),
                                F.col("doc_id") % 65536).alias("zkey"))
            .orderBy("doc_id"))


def _zorder_sql_terms() -> str:
    terms = []
    for i in range(16):
        terms.append(f"(((n_chars >> {i}) & 1) << {2 * i})")
        terms.append(f"((((doc_id % 65536) >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


ORACLE_ZORDER = f"""
SELECT doc_id, n_chars, CAST({_zorder_sql_terms()} AS BIGINT) AS zkey
FROM documents ORDER BY doc_id
"""


# --- winsorization (grouped-map surface) ----------------------------------

def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    from ..operators.curation import winsorize

    return winsorize(ev).orderBy("event_id")


ORACLE_WINSORIZE = """
WITH thr AS (
  SELECT event_type,
         percentile_disc(0.99) WITHIN GROUP (ORDER BY value) AS p99
  FROM events GROUP BY event_type)
SELECT event_id, e.event_type, value, LEAST(value, p99) AS clipped
FROM events e JOIN thr USING (event_type)
ORDER BY event_id
"""


# --- deterministic global shuffle -----------------------------------------

def q_shuffle_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded md5 shuffle: the (doc, key) assignment IS the permutation
    (total order by key); the range-partitioned layout is asserted in
    tests/test_plans.py."""
    from ..operators.sampling import shuffle_deterministic

    out = shuffle_deterministic(_docs(spark, sf_dir), seed="s42")
    return out.select("doc_id", "shuffle_key").orderBy("shuffle_key")


ORACLE_SHUFFLE_DET = """
SELECT doc_id, md5('s42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
FROM documents ORDER BY shuffle_key
"""


# --- weighted dataset mixing ----------------------------------------------

def q_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language mixture: en 50 %, de 100 %, fr 10 %, zh 0 (absent
    from the weights map), es ~31.4 % — exercises the full-keep
    sentinel, a fractional threshold, and the drop-unlisted default."""
    from ..operators.sampling import weighted_mix

    out = weighted_mix(_docs(spark, sf_dir),
                       {"en": 0.5, "de": 1.0, "fr": 0.1, "es": 0.314},
                       group_col="lang", seed="mix")
    return out.select("doc_id", "lang").orderBy("doc_id")


ORACLE_MIX_WEIGHTED = """
SELECT doc_id, lang FROM documents
WHERE substr(md5('mix:' || CAST(doc_id AS VARCHAR)), 1, 4)
      < CASE lang WHEN 'en' THEN '8000' WHEN 'de' THEN 'g'
                  WHEN 'fr' THEN '1999' WHEN 'es' THEN '5062'
                  ELSE '' END
ORDER BY doc_id
"""


# --- exact-n deterministic sample ------------------------------------------

def q_sample_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import sample_exact_n

    return (sample_exact_n(_docs(spark, sf_dir), n=200)
            .select("doc_id", "sample_key").orderBy("sample_key"))


ORACLE_SAMPLE_EXACT_N = """
SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_key
FROM documents ORDER BY sample_key, doc_id LIMIT 200
"""


# --- SCD2 interval history --------------------------------------------------

def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.load import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    out = scd2_intervals(ev, ["user_id"], ["ts", "event_id"], "ts")
    return (out.select("user_id", "event_id", "event_type",
                       "valid_from", "valid_to", "is_current")
            .orderBy("user_id", "valid_from", "event_id"))


ORACLE_SCD2_INTERVALS = """
SELECT user_id, event_id, event_type,
       CAST(ts AS TIMESTAMP) AS valid_from,
       CAST(LEAD(ts) OVER w AS TIMESTAMP) AS valid_to,
       (LEAD(ts) OVER w IS NULL) AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, valid_from, event_id
"""


CURATION_CHECKS: dict[str, tuple] = {
    "shuffle_det": (q_shuffle_det, ORACLE_SHUFFLE_DET),
    "mix_weighted": (q_mix_weighted, ORACLE_MIX_WEIGHTED),
    "sample_exact_n": (q_sample_exact_n, ORACLE_SAMPLE_EXACT_N),
    "scd2_intervals": (q_scd2_intervals, ORACLE_SCD2_INTERVALS),
    "winsorize": (q_winsorize, ORACLE_WINSORIZE),
    "merge_latest": (q_merge_latest, ORACLE_MERGE_LATEST),
    "dedup_incremental": (q_dedup_incremental, ORACLE_DEDUP_INCREMENTAL),
    "bin_quantile": (q_bin_quantile, ORACLE_BIN_QUANTILE),
    "outliers": (q_outliers, ORACLE_OUTLIERS),
    "funnel": (q_funnel, ORACLE_FUNNEL),
    "contamination_score": (q_contamination_score, ORACLE_CONTAMINATION_SCORE),
    "zorder": (q_zorder, ORACLE_ZORDER),
    "trend_stats": (q_trend_stats, ORACLE_TREND_STATS),
    "pii_scrub": (q_pii_scrub, ORACLE_PII_SCRUB),
    "heavy_hitters": (q_heavy_hitters, ORACLE_HEAVY_HITTERS),
    "domain_cap": (q_domain_cap, ORACLE_DOMAIN_CAP),
    "pack_chunks": (q_pack_chunks, ORACLE_PACK_CHUNKS),
    "split_folds": (q_split_folds, ORACLE_SPLIT_FOLDS),
    "term_salience": (q_term_salience, ORACLE_TERM_SALIENCE),
    "emb_quantize": (q_emb_quantize, ORACLE_EMB_QUANTIZE),
}


# --- date-spine gap detection ---------------------------------------------

def q_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality gap detection over a generated date spine: one month
    of days materialized from nothing (sequence + explode — row
    generation without a source table), left-joined to daily order
    counts so silent zero-days surface as 0 rather than vanishing.
    Scale: the spine is tiny and broadcasts; the daily agg partial-
    aggregates the fact side before its one shuffle."""
    o = load_table(spark, sf_dir, "orders")
    spine = spark.sql("""
        SELECT explode(sequence(TIMESTAMP'1995-01-01',
                                TIMESTAMP'1995-01-31',
                                INTERVAL 1 DAY)) AS day
    """).select(F.col("day").cast("timestamp_ntz").alias("day"))
    daily = (o.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
             .agg(F.count("*").alias("n")))
    return (F.broadcast(spine).join(daily, "day", "left")
            .select("day", F.coalesce(F.col("n"), F.lit(0)).alias("n_orders"))
            .orderBy("day"))


ORACLE_GAP_DAYS = """
WITH spine AS (
  SELECT CAST(d AS TIMESTAMP) AS day
  FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '1995-01-31',
                       INTERVAL 1 DAY) t(d)),
daily AS (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                 COUNT(*) AS n
          FROM orders GROUP BY 1)
SELECT s.day, COALESCE(d.n, 0) AS n_orders
FROM spine s LEFT JOIN daily d ON s.day = d.day
ORDER BY s.day
"""


# --- dataset profiling ----------------------------------------------------

def q_profile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass dataset profile (the 'dataset card' numbers): row count,
    per-column distinct cardinalities, null counts, value range and
    total text volume — all in a single aggregate, so the profile costs
    one scan regardless of how many stats it carries.  Exact distincts
    expand per-column; at 100 TB swap them for hll sketches
    (see hll_union) without changing the shape."""
    d = load_table(spark, sf_dir, "documents")
    return d.agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.count(F.when(F.col("text").isNull(), 1)).alias("n_null_text"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        F.sum("n_chars").alias("total_chars"))


ORACLE_PROFILE_STATS = """
SELECT COUNT(*) AS n_docs,
       COUNT(DISTINCT lang) AS n_langs,
       COUNT(DISTINCT source) AS n_sources,
       COUNT(CASE WHEN text IS NULL THEN 1 END) AS n_null_text,
       MIN(n_chars) AS min_chars,
       MAX(n_chars) AS max_chars,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
"""


CURATION_CHECKS.update({
    "gap_days": (q_gap_days, ORACLE_GAP_DAYS),
    "profile_stats": (q_profile_stats, ORACLE_PROFILE_STATS),
})


# --- LOCF gap-fill (time-series interpolation) ----------------------------

def q_locf_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward over an hourly spine: per user,
    one day of hours generated from nothing, hourly observations (MAX
    within the hour — a fully order-free reduction, so no timestamp
    tie can diverge between engines) left-joined on, and missing hours
    filled by `last(ignorenulls)` over an ordered per-user window — the
    hypertable `locf()` / pandas `ffill` shape.  Scale: the spine is
    |users|×24 (broadcast-built), the fill is one shuffle on user_id +
    an in-partition sort; no state beyond the frame."""
    ev = (load_table(spark, sf_dir, "events")
          .where((F.col("user_id") < 20)
                 & (F.col("ts") < F.lit("2024-01-02").cast("timestamp_ntz"))))
    users = ev.select("user_id").distinct()
    hours = spark.sql("""
        SELECT explode(sequence(TIMESTAMP'2024-01-01',
                                TIMESTAMP'2024-01-01 23:00:00',
                                INTERVAL 1 HOUR)) AS hour
    """).select(F.col("hour").cast("timestamp_ntz").alias("hour"))
    spine = users.crossJoin(F.broadcast(hours))
    obs = (ev.groupBy("user_id",
                      F.date_trunc("hour", F.col("ts")).alias("hour"))
           .agg(F.max("value").alias("v")))
    w = (Window.partitionBy("user_id").orderBy("hour")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (spine.join(obs, ["user_id", "hour"], "left")
            .select("user_id", "hour",
                    F.last("v", ignorenulls=True).over(w).alias("filled"))
            .orderBy("user_id", "hour"))


ORACLE_LOCF_FILL = """
WITH u AS (SELECT DISTINCT user_id FROM events
           WHERE user_id < 20 AND ts < TIMESTAMP '2024-01-02'),
spine AS (
  SELECT u.user_id, CAST(h AS TIMESTAMP) AS hour
  FROM u, generate_series(TIMESTAMP '2024-01-01',
                          TIMESTAMP '2024-01-01 23:00:00',
                          INTERVAL 1 HOUR) t(h)),
obs AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour,
         MAX(value) AS v
  FROM events WHERE user_id < 20 AND ts < TIMESTAMP '2024-01-02'
  GROUP BY 1, 2)
SELECT s.user_id, s.hour,
       last_value(o.v IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.hour) AS filled
FROM spine s LEFT JOIN obs o ON o.user_id = s.user_id AND o.hour = s.hour
ORDER BY s.user_id, s.hour
"""


# --- map construction / access functions ----------------------------------

def q_map_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: per source, a lang→count map built with
    map_from_entries, then queried with element_at / map_keys / size.
    Only scalar projections of the map are emitted (map column layouts
    are engine-specific; the scalars are not).  The oracle replicates
    the semantics directly — it checks the map pipeline's answers, not
    its representation."""
    d = load_table(spark, sf_dir, "documents")
    per = d.groupBy("source", "lang").agg(F.count("*").alias("n"))
    m = (per.groupBy("source")
         .agg(F.map_from_entries(F.collect_list(F.struct("lang", "n")))
              .alias("lang_map")))
    return (m.select(
        "source",
        F.coalesce(F.element_at(F.col("lang_map"), "en"), F.lit(0))
        .alias("n_en"),
        F.size("lang_map").cast("bigint").alias("n_langs"),
        F.array_join(F.array_sort(F.map_keys("lang_map")), ",")
        .alias("langs_sorted"))
        .orderBy("source"))


ORACLE_MAP_FNS = """
SELECT source,
       CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS n_en,
       COUNT(DISTINCT lang) AS n_langs,
       string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs_sorted
FROM documents
GROUP BY source
ORDER BY source
"""


CURATION_CHECKS.update({
    "locf_fill": (q_locf_fill, ORACLE_LOCF_FILL),
    "map_fns": (q_map_fns, ORACLE_MAP_FNS),
})


# --- table version reconciliation -----------------------------------------

def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy audit between two synthetic versions of orders:
    v2 drops urgent orders (removed), bumps totalprice on 'P'-status
    rows (changed) and appends offset-keyed copies (added).  The
    operator classifies by content digest; the oracle classifies by
    direct column comparison — identical counts up to hash collision."""
    old = load_table(spark, sf_dir, "orders")
    new = (old.where(F.col("o_orderpriority") != "1-URGENT")
           .withColumn("o_totalprice",
                       F.when(F.col("o_orderstatus") == "P",
                              F.col("o_totalprice") + 1)
                       .otherwise(F.col("o_totalprice")))
           .unionByName(
               old.where(F.col("o_orderkey") < 50)
               .withColumn("o_orderkey",
                           F.col("o_orderkey") + F.lit(100_000_000))))
    return C.table_diff(old, new, ["o_orderkey"],
                        ["o_totalprice", "o_orderstatus"])


ORACLE_TABLE_DIFF = """
WITH newv AS (
  SELECT o_orderkey,
         CASE WHEN o_orderstatus = 'P' THEN o_totalprice + 1
              ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE o_orderpriority <> '1-URGENT'
  UNION ALL
  SELECT o_orderkey + 100000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey < 50),
j AS (
  SELECT o.o_orderkey AS ko, n.o_orderkey AS kn,
         (o.o_totalprice IS DISTINCT FROM n.o_totalprice
          OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus) AS diff
  FROM orders o FULL OUTER JOIN newv n ON o.o_orderkey = n.o_orderkey)
SELECT COUNT(CASE WHEN ko IS NULL THEN 1 END) AS n_added,
       COUNT(CASE WHEN kn IS NULL THEN 1 END) AS n_removed,
       COUNT(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL AND diff
                  THEN 1 END) AS n_changed,
       COUNT(CASE WHEN ko IS NOT NULL AND kn IS NOT NULL AND NOT diff
                  THEN 1 END) AS n_same
FROM j
"""


CURATION_CHECKS.update({
    "table_diff": (q_table_diff, ORACLE_TABLE_DIFF),
})


# --- weekly cohort retention matrix ---------------------------------------

def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (C.cohort_retention(ev)
            .orderBy("cohort_week", "week_offset"))


ORACLE_COHORT_RETENTION = """
WITH first AS (
  SELECT user_id AS uid,
         CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id),
active AS (
  SELECT DISTINCT user_id AS uid,
         CAST(date_trunc('week', ts) AS DATE) AS week
  FROM events),
cells AS (
  SELECT cohort_week,
         CAST((week - cohort_week) // 7 AS BIGINT) AS week_offset,
         CAST(COUNT(DISTINCT a.uid) AS BIGINT) AS n_active
  FROM active a JOIN first f USING (uid)
  GROUP BY cohort_week, week_offset),
sizes AS (SELECT cohort_week, CAST(COUNT(*) AS BIGINT) AS n_cohort
          FROM first GROUP BY cohort_week)
SELECT CAST(cohort_week AS VARCHAR) AS cohort_week, week_offset, n_active,
       n_cohort,
       CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
FROM cells JOIN sizes USING (cohort_week)
ORDER BY cohort_week, week_offset
"""


CURATION_CHECKS.update({
    "cohort_retention": (q_cohort_retention, ORACLE_COHORT_RETENTION),
})


# --- sliding-window chunking (RAG / embedding chunker) --------------------

def q_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (C.chunk_sliding(_docs(spark, sf_dir), window=32, stride=24)
            .orderBy("doc_id", "chunk_id"))


ORACLE_CHUNK_SLIDING = """
WITH tk AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS t,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n
  FROM documents),
base AS (
  SELECT doc_id, t, n,
         CASE WHEN n <= 0 THEN 0
              ELSE 1 + (GREATEST(n - 32, 0) + 23) // 24 END AS nch
  FROM tk),
ch AS (
  SELECT doc_id, t, n, UNNEST(range(nch)) AS i FROM base)
SELECT doc_id, CAST(i AS BIGINT) AS chunk_id,
       CAST(i * 24 AS BIGINT) AS start,
       CAST(LEAST(32, n - i * 24) AS BIGINT) AS n_tokens,
       array_to_string(t[i * 24 + 1 : i * 24 + 32], ' ') AS chunk_text
FROM ch ORDER BY doc_id, chunk_id
"""


CURATION_CHECKS.update({
    "chunk_sliding": (q_chunk_sliding, ORACLE_CHUNK_SLIDING),
})


# --- SCD2 as-of snapshot (time-travel read over interval history) ---------

def q_scd2_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction: the state of each user's latest
    event AS OF T, read straight off the SCD2 validity intervals —
    the query pattern interval histories exist to serve.  A narrow
    filter over the interval table; no extra shuffle beyond SCD2
    itself."""
    from ..operators.load import scd2_intervals

    ev = load_table(spark, sf_dir, "events")
    iv = scd2_intervals(ev, ["user_id"], ["ts", "event_id"], "ts")
    t = F.lit("2024-01-15 00:00:00").cast("timestamp")
    return (iv.where((F.col("valid_from") <= t)
                     & (F.col("valid_to").isNull()
                        | (F.col("valid_to") > t)))
            .select("user_id", "event_id", "event_type", "valid_from")
            .orderBy("user_id"))


ORACLE_SCD2_ASOF = """
SELECT user_id, event_id, event_type,
       CAST(ts AS TIMESTAMP) AS valid_from
FROM (
  SELECT user_id, event_id, event_type, ts,
         LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS valid_to
  FROM events)
WHERE CAST(ts AS TIMESTAMP) <= TIMESTAMP '2024-01-15 00:00:00'
  AND (valid_to IS NULL
       OR CAST(valid_to AS TIMESTAMP) > TIMESTAMP '2024-01-15 00:00:00')
ORDER BY user_id
"""


CURATION_CHECKS.update({
    "scd2_asof": (q_scd2_asof, ORACLE_SCD2_ASOF),
})


# --- URL decomposition (web-crawl curation keys) --------------------------

def q_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesized crawl URLs (deterministic from documents) decomposed
    with Spark's parse_url builtin; the oracle re-derives host/path/
    query with generic URL-grammar regexps, so the check pins Spark's
    parser to the grammar rather than to itself."""
    d = _docs(spark, sf_dir)
    url = F.concat(F.lit("https://"), F.col("source"),
                   F.lit(".example.com/"), F.col("lang"), F.lit("/doc/"),
                   F.col("doc_id").cast("string"), F.lit("?ref="),
                   F.col("source"), F.lit("&x=1"))
    return (C.url_features(d.select("doc_id", url.alias("url")))
            .orderBy("doc_id"))


ORACLE_URL_PARSE = r"""
WITH u AS (
  SELECT doc_id,
         'https://' || source || '.example.com/' || lang || '/doc/'
           || CAST(doc_id AS VARCHAR) || '?ref=' || source || '&x=1' AS url
  FROM documents)
SELECT doc_id, url,
       regexp_extract(url, '^[a-z]+://([^/?#]+)', 1) AS host,
       regexp_extract(regexp_extract(url, '^[a-z]+://([^/?#]+)', 1),
                      '([^.]+\.[^.]+)$', 1) AS domain,
       regexp_extract(url, '^[a-z]+://[^/?#]+([^?#]*)', 1) AS path,
       regexp_extract(url, '[?&]ref=([^&#]*)', 1) AS ref
FROM u ORDER BY doc_id
"""


CURATION_CHECKS.update({
    "url_parse": (q_url_parse, ORACLE_URL_PARSE),
})


# --- k-step ordered funnel ------------------------------------------------

def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (C.funnel_steps(ev, ["click", "view", "purchase"])
            .select("user_id",
                    F.col("ts1").cast("timestamp").alias("ts1"),
                    F.col("ts2").cast("timestamp").alias("ts2"),
                    F.col("ts3").cast("timestamp").alias("ts3"),
                    "depth")
            .orderBy("user_id"))


ORACLE_FUNNEL_STEPS = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS ts1 FROM events
  WHERE event_type = 'click' GROUP BY user_id),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS ts2 FROM events e
  JOIN s1 ON s1.user_id = e.user_id AND e.ts >= s1.ts1
  WHERE e.event_type = 'view' GROUP BY e.user_id),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS ts3 FROM events e
  JOIN s2 ON s2.user_id = e.user_id AND e.ts >= s2.ts2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id)
SELECT s1.user_id,
       CAST(ts1 AS TIMESTAMP) AS ts1,
       CAST(ts2 AS TIMESTAMP) AS ts2,
       CAST(ts3 AS TIMESTAMP) AS ts3,
       CAST(CASE WHEN ts1 IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN ts2 IS NOT NULL THEN 1 ELSE 0 END
          + CASE WHEN ts3 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS depth
FROM s1 LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
ORDER BY s1.user_id
"""


CURATION_CHECKS.update({
    "funnel_steps": (q_funnel_steps, ORACLE_FUNNEL_STEPS),
})


# --- time-series downsample (OHLC-style resample) -------------------------

def q_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 6-hour downsample with open/high/low/close semantics:
    first and last value by (ts, event_id) order via min_by/max_by over
    a struct key — ONE map-side-combining aggregate, no per-bucket sort
    window (the arg-min/arg-max trick from merge_latest, applied to
    resampling).  Values surface as exact millis."""
    ev = load_table(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 1000).cast("long")
    key = F.struct(F.col("ts"), F.col("event_id"))
    return (
        ev.groupBy(
            "user_id",
            F.timestamp_seconds(
                (F.unix_timestamp(F.col("ts").cast("timestamp"))
                 / 21600).cast("long") * 21600)
            .cast("timestamp_ntz").alias("bucket"))
        .agg(F.count("*").alias("n"),
             F.min_by(v, key).alias("open_millis"),
             F.max(v).alias("high_millis"),
             F.min(v).alias("low_millis"),
             F.max_by(v, key).alias("close_millis"))
        .orderBy("user_id", "bucket"))


ORACLE_RESAMPLE_OHLC = """
SELECT user_id,
       CAST(to_timestamp(CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) * 21600) AS TIMESTAMP)
         AS bucket,
       COUNT(*) AS n,
       CAST(arg_min(CAST(FLOOR(value * 1000) AS BIGINT),
                    strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                      || lpad(CAST(event_id AS VARCHAR), 12, '0'))
            AS BIGINT) AS open_millis,
       CAST(MAX(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
         AS high_millis,
       CAST(MIN(CAST(FLOOR(value * 1000) AS BIGINT)) AS BIGINT)
         AS low_millis,
       CAST(arg_max(CAST(FLOOR(value * 1000) AS BIGINT),
                    strftime(ts, '%Y-%m-%d %H:%M:%S.%f')
                      || lpad(CAST(event_id AS VARCHAR), 12, '0'))
            AS BIGINT) AS close_millis
FROM events
GROUP BY user_id, bucket ORDER BY user_id, bucket
"""


CURATION_CHECKS.update({
    "resample_ohlc": (q_resample_ohlc, ORACLE_RESAMPLE_OHLC),
})


# --- group-constrained folds (GroupKFold) ---------------------------------

def q_split_group_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GroupKFold: the fold comes from md5(source), so every document
    of a source lands in the SAME fold — the leakage guard when near
    -duplicates cluster within sources.  Same engine-portable md5-mod
    family as assign_folds; stateless narrow map."""
    d = _docs(spark, sf_dir)
    return (d.select("doc_id", "source",
                     C.fold_expr(F.col("source"), 5).alias("fold"))
            .orderBy("doc_id"))


ORACLE_SPLIT_GROUP_FOLDS = """
SELECT doc_id, source, CAST(
    ((strpos('0123456789abcdef', substr(md5(source), 1, 1)) - 1) * 16
   + (strpos('0123456789abcdef', substr(md5(source), 2, 1)) - 1)) % 5
   AS INT) AS fold
FROM documents ORDER BY doc_id
"""


# --- sqrt-proportional mixing quotas (largest-remainder rounding) ---------

def q_mix_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token quotas for a 100k-token training mix,
    proportional to sqrt(source token count) — the sub-linear
    upsampling rule used to keep big crawls from drowning small
    high-quality sources.  Integer-exact: weights are isqrt-scaled
    BIGINTs, shares are allocated by floor division with
    largest-remainder rounding so the quotas sum EXACTLY to the budget;
    the remainder ranking is a window over |sources| rows (bounded by
    the source catalog)."""
    from ..operators.curation import hamilton_quota
    from ..operators.text import token_count

    d = _docs(spark, sf_dir)
    src = (d.groupBy("source")
           .agg(F.sum(token_count("text")).alias("n_tok")))
    # integer sqrt via FLOOR(SQRT(double)): exact for n < 2^52 and
    # identical cross-engine (IEEE sqrt is correctly rounded); the
    # apportionment itself is the shared hamilton_quota core (round-11
    # refactor — this check's unchanged oracle pins the extraction)
    w = src.select("source", "n_tok",
                   F.floor(F.sqrt(F.col("n_tok").cast("double")))
                   .cast("long").alias("wt"))
    return (hamilton_quota(w, 100_000, "source", "wt")
            .select("source", "n_tok", "quota")
            .orderBy("source"))


ORACLE_MIX_QUOTA = """
WITH src AS (
  SELECT source,
         CAST(SUM(len(regexp_extract_all(lower(text), '[a-z0-9]+')))
              AS BIGINT) AS n_tok
  FROM documents GROUP BY source),
w AS (SELECT source, n_tok,
             CAST(FLOOR(SQRT(CAST(n_tok AS DOUBLE))) AS BIGINT) AS wt
      FROM src),
tot AS (SELECT SUM(wt) AS wsum FROM w),
base AS (
  SELECT source, n_tok, wt,
         (100000 * wt) // wsum AS base,
         (100000 * wt) % wsum AS rem
  FROM w, tot),
ranked AS (
  SELECT *, row_number() OVER (ORDER BY rem DESC, source) AS rnk,
         100000 - SUM(base) OVER () AS need
  FROM base)
SELECT source, n_tok,
       CAST(base + CASE WHEN rnk <= need THEN 1 ELSE 0 END AS BIGINT)
         AS quota
FROM ranked ORDER BY source
"""


# --- duplication histogram (dedup report metric) --------------------------

def q_dup_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-size histogram over exact-content fingerprints of the
    planted-duplicate corpus: how many content clusters exist at each
    copy count — the headline chart of every dedup report.  Two
    map-side-combining groupBys (fingerprint → size, size → count)."""
    from ..operators.text import fingerprint
    from .checks_extension import _dup_corpus

    c = _dup_corpus(spark, sf_dir)
    sizes = (c.select(fingerprint("text").alias("fp"))
             .groupBy("fp").agg(F.count("*").alias("n_copies")))
    return (sizes.groupBy("n_copies")
            .agg(F.count("*").alias("n_clusters"))
            .orderBy("n_copies"))


ORACLE_DUP_HISTOGRAM = """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, upper(text) || '  ' FROM documents),
fp AS (
  SELECT sha256(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS f,
         COUNT(*) AS n_copies
  FROM corpus GROUP BY f)
SELECT CAST(n_copies AS BIGINT) AS n_copies,
       CAST(COUNT(*) AS BIGINT) AS n_clusters
FROM fp GROUP BY n_copies ORDER BY n_copies
"""


CURATION_CHECKS.update({
    "split_group_folds": (q_split_group_folds, ORACLE_SPLIT_GROUP_FOLDS),
    "mix_quota": (q_mix_quota, ORACLE_MIX_QUOTA),
    "dup_histogram": (q_dup_histogram, ORACLE_DUP_HISTOGRAM),
})
