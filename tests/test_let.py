"""The let-binding combinator (functions/let.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ethereum2_etl_airflow_spark.functions.let import bind


def test_bind_value_identity(spark):
    df = spark.createDataFrame([("a b c d",), ("x",)], "text string")
    toks = F.split("text", " ")
    naive = df.select(
        F.concat_ws("|", F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(1))))
        .alias("out"))
    bound = df.select(
        bind(toks, lambda t: F.concat_ws(
            "|", F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(1)))))
        .alias("out"))
    assert naive.collect() == bound.collect()


def test_bind_scalar_and_nested(spark):
    df = spark.createDataFrame([(3.0,), (4.0,)], "x double")
    # nested bindings: y = x*x, z = y+1, out = z*y
    out = df.select(
        bind(F.col("x") * F.col("x"),
             lambda y: bind(y + 1, lambda z: z * y)).alias("out"))
    assert [r["out"] for r in out.collect()] == [90.0, 272.0]


def test_bind_evaluates_once(spark):
    """The whole point: an N-reference builder over a bound expression
    evaluates it once per row.  Proxy: a rand()-based expression bound
    and referenced twice must agree with itself."""
    df = spark.range(100)
    out = df.select(
        bind(F.rand(seed=7), lambda r: (r - r)).alias("zero"))
    assert all(r["zero"] == 0.0 for r in out.collect())