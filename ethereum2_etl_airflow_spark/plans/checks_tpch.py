"""The remaining TPC-H query *shapes* (Q2..Q22), adapted to the driver's
TPC-H-ish testdata schema, each with a DuckDB oracle.

Q1/Q3/Q6/Q13 live in :mod:`checks_relational`; this module completes the
family so every classic analytic shape — correlated-min supplier pick,
EXISTS/NOT-EXISTS lateness, multi-way region joins, case-sum market
share, share-of-total HAVING, conditional counts, scalar-max view,
NOT-IN distinct counting, correlated-average filter, HAVING-IN big
orders, disjunctive multi-predicate join, nested IN, double-negated
self-join, and anti-join-with-scalar-threshold — has an oracle-checked
representative.  The reference itself has no joins at all (SURVEY §2.8);
its delegated engine (BigQuery) offers all of these to consumers.

Adaptations forced by the driver schema (no ``partsupp``, no
``l_commitdate``/``l_receiptdate``/``l_shipmode``/``c_phone``):

- supply cost  → min ``l_extendedprice`` per (part, supplier) pair (Q2);
- lateness     → ``l_shipdate > o_orderdate + INTERVAL n DAYS`` (Q4, Q21);
- ship mode    → ``l_returnflag`` as the category axis (Q12);
- country code → ``substr(c_name, 17, 2)`` (Q22);
- part value   → lineitem revenue instead of supplycost·availqty (Q9, Q11).

Determinism rules (same as checks_relational): money sums route through
DECIMAL(18,2) (order-independent addition) and surface as DOUBLE; ratios
are emitted as (numerator, denominator) pairs rather than divided, so no
cross-engine float-division rounding can flip a hash; every ORDER BY
carries a unique tie-breaker before any LIMIT; conditional counts are
CAST(... AS BIGINT) in the oracle because DuckDB's SUM(int) is HUGEINT.

Scale notes are inline per query (broadcast choices, shuffle keys, what
AQE does at 1000 executors).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.testdata import load_table

__all__ = ["TPCH_CHECKS"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _rev_dec() -> F.Column:
    """Revenue term extendedprice·(1−discount) in exact decimal."""
    return (F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1).cast("decimal(18,2)")
               - F.col("l_discount").cast("decimal(18,2)")))


_REV_SQL = ("CAST(l_extendedprice AS DECIMAL(18,2))"
            " * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))")


def _ts(lit: str) -> F.Column:
    return F.lit(lit).cast("timestamp_ntz")


# --- Q2 shape: minimum-cost supplier per part -----------------------------

def q_q2_mincost(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-MIN supplier pick, rewritten as a two-phase min-join:
    per-(part, supplier) min price, then per-part global min, then an
    equality join back — the scalable plan for Q2's correlated subquery
    (one shuffle on l_partkey; part + supplier/nation/region dims
    broadcast).  Ties (two suppliers at the same min price) are kept,
    as in TPC-H.  At 1000 executors the pair aggregation map-side
    combines; nothing is driver-bound."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("price"))
    parts = (_t(spark, sf_dir, "part")
             .where(F.col("p_size").isin(5, 10, 15) & (F.col("p_type") == "LARGE"))
             .select("p_partkey"))
    eu = (_t(spark, sf_dir, "supplier")
          .join(F.broadcast(_t(spark, sf_dir, "nation")),
                F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(_t(spark, sf_dir, "region")
                            .where(F.col("r_name") == "EUROPE")),
                F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    pairs = (li.join(F.broadcast(parts), li["l_partkey"] == parts["p_partkey"])
             .join(F.broadcast(eu), li["l_suppkey"] == eu["s_suppkey"])
             .groupBy("l_partkey", "s_suppkey", "s_name", "s_acctbal", "n_name")
             .agg(F.min("price").alias("minp")))
    best = pairs.groupBy("l_partkey").agg(F.min("minp").alias("bestp"))
    return (pairs.join(best, "l_partkey")
            .where(F.col("minp") == F.col("bestp"))
            .select(F.col("s_acctbal"), F.col("s_name"), F.col("n_name"),
                    F.col("l_partkey").alias("p_partkey"), F.col("s_suppkey"),
                    F.col("minp").cast("double").alias("supply_cost"))
            .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name",
                     "p_partkey", "s_suppkey")
            .limit(100))


ORACLE_Q2 = """
WITH pairs AS (
  SELECT l.l_partkey, s.s_suppkey, s.s_name, s.s_acctbal, n.n_name,
         MIN(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS minp
  FROM lineitem l
  JOIN part p ON p.p_partkey = l.l_partkey
             AND p.p_size IN (5,10,15) AND p.p_type = 'LARGE'
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'EUROPE'
  GROUP BY 1,2,3,4,5)
SELECT s_acctbal, s_name, n_name, l_partkey AS p_partkey, s_suppkey,
       CAST(minp AS DOUBLE) AS supply_cost
FROM pairs p1
WHERE minp = (SELECT MIN(minp) FROM pairs p2 WHERE p2.l_partkey = p1.l_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey, s_suppkey
LIMIT 100
"""


# --- Q4 shape: order-priority checking (EXISTS) ---------------------------

def q_q4_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS over a correlated lateness predicate → LEFT SEMI join with
    a non-equi conjunct (shipdate > orderdate + 30 days).  The date range
    filter on orders pushes to parquet; the semi join shuffles both
    sides on orderkey (AQE broadcasts the filtered orders side when it
    fits).  Output is 5 rows."""
    o = (_t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= _ts("1996-07-01"))
                & (F.col("o_orderdate") < _ts("1996-10-01"))))
    li = _t(spark, sf_dir, "lineitem")
    return (o.join(li, (li["l_orderkey"] == o["o_orderkey"])
                   & (li["l_shipdate"] > o["o_orderdate"] + F.expr("INTERVAL 30 DAYS")),
                   "left_semi")
            .groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


ORACLE_Q4 = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate < TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 30 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --- Q5 shape: local-supplier volume (6-way join) -------------------------

def q_q5_local(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-way join with the 'local' same-nation constraint
    (c_nationkey = s_nationkey).  customer/supplier/nation/region all
    broadcast; the only big shuffle is lineitem ⋈ orders on orderkey.
    Catalyst pushes the year filter into the orders scan."""
    c = _t(spark, sf_dir, "customer")
    o = (_t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1997-01-01"))))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(s), (li["l_suppkey"] == s["s_suppkey"])
                  & (c["c_nationkey"] == s["s_nationkey"]))
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .groupBy("n_name")
            .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), "n_name"))


ORACLE_Q5 = f"""
SELECT n.n_name, CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n.n_name
ORDER BY revenue DESC, n_name
"""


# --- Q7 shape: volume shipping between two nations ------------------------

def q_q7_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bidirectional nation-pair filter ((A,B) or (B,A)) over a 6-way
    join, grouped by (supp_nation, cust_nation, year).  Both nation dims
    broadcast; the disjunctive pair predicate stays in codegen.  Year
    is surfaced as INTEGER in both engines."""
    li = (_t(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= _ts("1995-01-01"))
                 & (F.col("l_shipdate") <= _ts("1996-12-31"))))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    pair = (((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")))
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(F.broadcast(n1), s["s_nationkey"] == F.col("sn_key"))
            .join(F.broadcast(n2), c["c_nationkey"] == F.col("cn_key"))
            .where(pair)
            .groupBy("supp_nation", "cust_nation",
                     F.year("l_shipdate").alias("l_year"))
            .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


ORACLE_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01' AND TIMESTAMP '1996-12-31'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""


# --- Q8 shape: market share (case-sum ratio) ------------------------------

def q_q8_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-share numerator/denominator per year: the CASE-sum over a
    7-way join.  The ratio is deliberately NOT divided — (num, den) pairs
    hash identically across engines; a float division would not.  All
    dims broadcast; single shuffle on orderkey then one on year."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey"),
        F.col("n_name").alias("cust_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    vol = (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
           .join(o, li["l_orderkey"] == o["o_orderkey"])
           .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
           .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
           .join(F.broadcast(n1), c["c_nationkey"] == F.col("cn_key"))
           .join(F.broadcast(r), F.col("n_regionkey") == r["r_regionkey"])
           .join(F.broadcast(n2), s["s_nationkey"] == F.col("sn_key"))
           .select(F.year("o_orderdate").alias("o_year"),
                   _rev_dec().alias("vol"), F.col("supp_nation")))
    return (vol.groupBy("o_year")
            .agg(F.sum(F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))
                       .otherwise(F.lit(0))).cast("double").alias("mkt_num"),
                 F.sum("vol").cast("double").alias("mkt_den"))
            .orderBy("o_year"))


ORACLE_Q8 = f"""
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
         {_REV_SQL} AS vol, n2.n_name AS supp_nation
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
  JOIN region r ON n1.n_regionkey = r.r_regionkey AND r.r_name = 'AMERICA'
  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END) AS DOUBLE)
           AS mkt_num,
       CAST(SUM(vol) AS DOUBLE) AS mkt_den
FROM vol GROUP BY o_year ORDER BY o_year
"""


# --- Q9 shape: product-type profit ----------------------------------------

def q_q9_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit by supplier nation and order year over parts whose name
    contains a token (the LIKE '%red%' scan — NOT pushdown-able, a
    deliberate full-column-scan shape).  No partsupp in the driver
    schema, so profit = revenue.  part/supplier/nation broadcast; the
    lineitem⋈orders shuffle dominates and AQE coalesces after it."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_name").contains("red"))
    s = _t(spark, sf_dir, "supplier")
    o = _t(spark, sf_dir, "orders")
    n = _t(spark, sf_dir, "nation")
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
            .join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .groupBy(F.col("n_name").alias("nation"),
                     F.year("o_orderdate").alias("o_year"))
            .agg(F.sum(_rev_dec()).cast("double").alias("sum_profit"))
            .orderBy("nation", F.col("o_year").desc()))


ORACLE_Q9 = f"""
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
GROUP BY 1, 2
ORDER BY nation, o_year DESC
"""


# --- Q10 shape: returned-item top customers -------------------------------

def q_q10_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by returned-revenue in a quarter.  The ORDER BY
    revenue DESC LIMIT 20 compiles to TakeOrderedAndProject — per-
    partition heaps, no global sort; c_custkey breaks revenue ties so
    the 20-row cut is deterministic."""
    c = _t(spark, sf_dir, "customer")
    o = (_t(spark, sf_dir, "orders")
         .where((F.col("o_orderdate") >= _ts("1996-10-01"))
                & (F.col("o_orderdate") < _ts("1997-01-01"))))
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = _t(spark, sf_dir, "nation")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.sum(_rev_dec()).cast("double").alias("revenue"))
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20))


ORACLE_Q10 = f"""
SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1996-10-01'
  AND o.o_orderdate < TIMESTAMP '1997-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --- Q11 shape: share-of-total HAVING -------------------------------------

def q_q11_important(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Groups whose value exceeds a fraction of the grand total (Q11's
    HAVING > scalar subquery).  The comparison is kept in exact decimal
    — val·1000 > total — so no float rounding can flip a row across
    engines.  The per-part aggregate is the only shuffle; the 1-row
    total broadcasts back."""
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = (_t(spark, sf_dir, "nation")
         .where(F.col("n_name").isin("NATION_3", "NATION_7")))
    pv = (li.join(F.broadcast(s.join(F.broadcast(n),
                                     s["s_nationkey"] == n["n_nationkey"])
                              .select("s_suppkey")),
                  li["l_suppkey"] == F.col("s_suppkey"))
          .groupBy("l_partkey")
          .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("val")))
    total = pv.agg(F.sum("val").alias("grand_total"))
    return (pv.join(F.broadcast(total))
            .where(F.col("val") * F.lit(1000) > F.col("grand_total"))
            .select("l_partkey", F.col("val").cast("double").alias("part_value"))
            .orderBy(F.col("part_value").desc(), "l_partkey"))


ORACLE_Q11 = """
WITH pv AS (
  SELECT l.l_partkey, SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS val
  FROM lineitem l
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
                AND n.n_name IN ('NATION_3','NATION_7')
  GROUP BY 1)
SELECT l_partkey, CAST(val AS DOUBLE) AS part_value
FROM pv WHERE val * 1000 > (SELECT SUM(val) FROM pv)
ORDER BY part_value DESC, l_partkey
"""


# --- Q12 shape: conditional priority counts per category ------------------

def q_q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q12's CASE-based conditional counts (high/low priority) per
    category, with l_returnflag standing in for the absent l_shipmode.
    Counts stay BIGINT in both engines (DuckDB's SUM(int) is HUGEINT —
    cast in the oracle).  One shuffle on orderkey, one on the 3-value
    category key."""
    li = (_t(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= _ts("1996-01-01"))
                 & (F.col("l_shipdate") < _ts("1997-01-01"))))
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"))
            .orderBy("l_returnflag"))


ORACLE_Q12 = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


# --- Q14 shape: promo-revenue ratio ---------------------------------------

def q_q14_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo vs total revenue for one ship-month, as a (num, den) pair
    (the division left to the consumer — exactness over prettiness).
    part broadcasts; single-row output."""
    li = (_t(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= _ts("1996-03-01"))
                 & (F.col("l_shipdate") < _ts("1996-04-01"))))
    p = _t(spark, sf_dir, "part")
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .agg(F.sum(F.when(F.col("p_type") == "PROMO", _rev_dec())
                       .otherwise(F.lit(0))).cast("double").alias("promo_revenue"),
                 F.sum(_rev_dec()).cast("double").alias("total_revenue")))


ORACLE_Q14 = f"""
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV_SQL} ELSE 0 END)
            AS DOUBLE) AS promo_revenue,
       CAST(SUM({_REV_SQL}) AS DOUBLE) AS total_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01'
  AND l_shipdate < TIMESTAMP '1996-04-01'
"""


# --- Q15 shape: top supplier (scalar MAX over a view) ---------------------

def q_q15_topsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier(s) whose quarterly revenue equals the global MAX —
    Q15's view + scalar subquery, as an aggregate + broadcast-back
    equality join on exact decimal (safe '=' — no float compare).
    One shuffle on suppkey; the 1-row max broadcasts."""
    li = (_t(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= _ts("1996-01-01"))
                 & (F.col("l_shipdate") < _ts("1996-04-01"))))
    rev = (li.groupBy("l_suppkey")
           .agg(F.sum(_rev_dec()).alias("total_rev")))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    s = _t(spark, sf_dir, "supplier")
    return (rev.join(F.broadcast(mx))
            .where(F.col("total_rev") == F.col("max_rev"))
            .join(F.broadcast(s), F.col("l_suppkey") == s["s_suppkey"])
            .select("s_suppkey", "s_name",
                    F.col("total_rev").cast("double").alias("total_revenue"))
            .orderBy("s_suppkey"))


ORACLE_Q15 = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1)
SELECT s.s_suppkey, s.s_name, CAST(rev.total_rev AS DOUBLE) AS total_revenue
FROM rev JOIN supplier s ON rev.l_suppkey = s.s_suppkey
WHERE rev.total_rev = (SELECT MAX(total_rev) FROM rev)
ORDER BY s_suppkey
"""


# --- Q16 shape: supplier-count distribution with NOT IN -------------------

def q_q16_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT supplier) per part attribute triple, excluding a
    NOT-IN supplier set (negative balance as the 'complaints' proxy).
    NOT IN on a non-null key is a left-anti join.  countDistinct
    expands to a two-phase partial/final aggregate — no single-point
    distinct.  part broadcasts; the excluded-supplier set broadcasts."""
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .where((F.col("p_brand") != "Brand#5")
                & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)))
    bad = (_t(spark, sf_dir, "supplier")
           .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"],
                  "left_anti")
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"))


ORACLE_Q16 = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1,5,9,13,17,21,25,29)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# --- Q17 shape: small-quantity correlated average -------------------------

def q_q17_smallqty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lines below 20% of their part's average quantity (Q17's
    correlated AVG), as a per-part aggregate joined back.  l_quantity
    is integral-valued, so the double AVG is exact (integer sum / count
    — order-independent) and 0.2·avg compares identically in both
    engines.  Brand filter broadcasts; one shuffle on partkey."""
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23")
         .select("p_partkey"))
    branded = li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
    avgq = (li.groupBy(F.col("l_partkey").alias("ap_key"))
            .agg(F.avg("l_quantity").alias("avg_qty")))
    return (branded.join(avgq, branded["l_partkey"] == F.col("ap_key"))
            .where(F.col("l_quantity") < F.lit(0.2) * F.col("avg_qty"))
            .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
                 .cast("double").alias("total_extprice"),
                 F.count("*").alias("line_count")))


ORACLE_Q17 = """
SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
           AS total_extprice,
       COUNT(*) AS line_count
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = 'Brand#23'
WHERE l.l_quantity < 0.2 * (SELECT AVG(l2.l_quantity) FROM lineitem l2
                            WHERE l2.l_partkey = l.l_partkey)
"""


# --- Q18 shape: large-volume orders (HAVING + IN) -------------------------

def q_q18_bigorders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds a threshold (Q18's
    HAVING SUM > N feeding an IN), joined back to customer detail.
    The qualifying-order set is tiny after the HAVING, so AQE
    broadcasts it into the orders join.  sum_qty is an exact integer-
    valued double (order-independent)."""
    li = _t(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 250))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (o.join(big, o["o_orderkey"] == big["l_orderkey"])
            .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
            .select("c_name", "c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice", "sum_qty")
            .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
            .limit(100))


ORACLE_Q18 = """
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(o.o_orderdate AS TIMESTAMP) AS o_orderdate, o.o_totalprice,
       t.sum_qty
FROM orders o
JOIN (SELECT l_orderkey, SUM(l_quantity) AS sum_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 250) t
  ON o.o_orderkey = t.l_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o.o_totalprice DESC, o.o_orderkey
LIMIT 100
"""


# --- Q19 shape: disjunctive multi-predicate join --------------------------

def q_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three OR'd (brand, size-range, quantity-range) branches over the
    part join — the classic disjunctive-predicate shape the optimizer
    must keep as a residual filter on a single broadcast join (not three
    scans).  Single-row output."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30)))
    return (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .where(cond)
            .agg(F.sum(_rev_dec()).cast("double").alias("revenue"),
                 F.count("*").alias("line_count")))


ORACLE_Q19 = f"""
SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue, COUNT(*) AS line_count
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
"""


# --- Q20 shape: nested IN subqueries --------------------------------------

def q_q20_potential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers appearing in a HAVING-filtered (supplier, part) volume
    subquery, restricted to a region — Q20's nested-IN chain as two
    semi joins.  The part name filter broadcasts into the volume agg;
    the qualifying-supplier set is tiny and broadcasts into the
    supplier scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = (_t(spark, sf_dir, "part")
         .where(F.col("p_name").startswith("red")).select("p_partkey"))
    qual = (li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
            .groupBy("l_suppkey", "l_partkey")
            .agg(F.sum("l_quantity").alias("qty"))
            .where(F.col("qty") > 50)
            .select("l_suppkey").distinct())
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    return (s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
            .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
            .join(qual, s["s_suppkey"] == qual["l_suppkey"], "left_semi")
            .select("s_suppkey", "s_name")
            .orderBy("s_suppkey"))


ORACLE_Q20 = """
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON n.n_nationkey = s.s_nationkey
JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
WHERE s.s_suppkey IN (
  SELECT l_suppkey FROM lineitem
  JOIN part ON p_partkey = l_partkey AND p_name LIKE 'red%'
  GROUP BY l_suppkey, l_partkey HAVING SUM(l_quantity) > 50)
ORDER BY s_suppkey
"""


# --- Q21 shape: suppliers who kept orders waiting -------------------------

def q_q21_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21's EXISTS / NOT EXISTS double self-join: late lines (shipdate
    > orderdate + 60d) in finished multi-supplier orders where NO other
    supplier was late.  Expressed as semi then anti self-joins — all
    three legs shuffle on l_orderkey, so at scale they co-partition
    into one exchange reused across the stage."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    late = (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .where(F.col("l_shipdate")
                   > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
            .select("l_orderkey", "l_suppkey"))
    l2 = li.select(F.col("l_orderkey").alias("ok2"),
                   F.col("l_suppkey").alias("sk2"))
    l3 = late.select(F.col("l_orderkey").alias("ok3"),
                     F.col("l_suppkey").alias("sk3"))
    cand = late.join(l2, (late["l_orderkey"] == l2["ok2"])
                     & (late["l_suppkey"] != l2["sk2"]), "left_semi")
    sole = cand.join(l3, (cand["l_orderkey"] == l3["ok3"])
                     & (cand["l_suppkey"] != l3["sk3"]), "left_anti")
    s = _t(spark, sf_dir, "supplier")
    return (sole.join(F.broadcast(s), sole["l_suppkey"] == s["s_suppkey"])
            .groupBy("s_name")
            .agg(F.count("*").alias("numwait"))
            .orderBy(F.col("numwait").desc(), "s_name")
            .limit(100))


ORACLE_Q21 = """
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""


# --- Q22 shape: global sales opportunity ----------------------------------

def q_q22_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no recent orders, grouped by
    'country code' (substr of c_name — the driver schema has no phone).
    The scalar AVG threshold is computed as exact-decimal SUM ÷ COUNT in
    DOUBLE (both engines divide the same two exact numbers); NOT EXISTS
    is a left-anti join against the date-filtered orders scan."""
    c = _t(spark, sf_dir, "customer")
    thr = (c.where(F.col("c_acctbal") > 0)
           .agg((F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double") / F.count("*")).alias("avg_bal")))
    recent = (_t(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") >= _ts("1999-01-01"))
              .select("o_custkey"))
    return (c.join(F.broadcast(thr))
            .where(F.col("c_acctbal") > F.col("avg_bal"))
            .join(recent, c["c_custkey"] == recent["o_custkey"], "left_anti")
            .groupBy(F.substring("c_name", 17, 2).alias("cntrycode"))
            .agg(F.count("*").alias("numcust"),
                 F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
                 .cast("double").alias("totacctbal"))
            .orderBy("cntrycode"))


ORACLE_Q22 = """
SELECT substr(c_name, 17, 2) AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
FROM customer c
WHERE c.c_acctbal > (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,2)))
                                 AS DOUBLE) / COUNT(*)
                     FROM customer c2 WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
ORDER BY cntrycode
"""


TPCH_CHECKS: dict[str, tuple] = {
    "q2_mincost": (q_q2_mincost, ORACLE_Q2),
    "q4_priority": (q_q4_priority, ORACLE_Q4),
    "q5_local": (q_q5_local, ORACLE_Q5),
    "q7_volume": (q_q7_volume, ORACLE_Q7),
    "q8_share": (q_q8_share, ORACLE_Q8),
    "q9_profit": (q_q9_profit, ORACLE_Q9),
    "q10_returns": (q_q10_returns, ORACLE_Q10),
    "q11_important": (q_q11_important, ORACLE_Q11),
    "q12_shipmode": (q_q12_shipmode, ORACLE_Q12),
    "q14_promo": (q_q14_promo, ORACLE_Q14),
    "q15_topsupp": (q_q15_topsupp, ORACLE_Q15),
    "q16_partsupp": (q_q16_partsupp, ORACLE_Q16),
    "q17_smallqty": (q_q17_smallqty, ORACLE_Q17),
    "q18_bigorders": (q_q18_bigorders, ORACLE_Q18),
    "q19_disjunct": (q_q19_disjunct, ORACLE_Q19),
    "q20_potential": (q_q20_potential, ORACLE_Q20),
    "q21_waiting": (q_q21_waiting, ORACLE_Q21),
    "q22_global": (q_q22_global, ORACLE_Q22),
}
