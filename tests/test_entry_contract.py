"""Driver-contract sanity: the shapes __spark_entry__ promises."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry


def test_registry_shapes():
    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert len(qs) >= 50
    # every oracle belongs to a registered query
    assert set(oracles) <= set(qs)
    # a meaningful majority is oracle-checked (rows-only is the exception)
    assert len(oracles) >= 0.8 * len(qs)
    for name, fn in qs.items():
        assert callable(fn), name
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"
    for name, sql in oracles.items():
        assert isinstance(sql, str) and "SELECT" in sql.upper(), name


def test_oracles_are_duckdb_runnable():
    """Every oracle parses and runs in DuckDB against the sf0.001 views
    (the cheapest full syntax check)."""
    import duckdb

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'/root/testdata/sf0.001/{t}.parquet'")
    for name, sql in entry.oracle_sql().items():
        try:
            con.execute(sql).fetchall()
        except Exception as ex:  # pragma: no cover
            raise AssertionError(f"oracle {name} failed in duckdb: {ex}") from ex


def test_entry_returns_flagship(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns == ["doc_id", "chunk_id", "start", "n_tokens",
                          "chunk_text", "fold"]
    # the pipeline's dedup stage kept only original-id survivors
    assert all(r["doc_id"] < 1_000_000 for r in rows)
