"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf=0.01 and compares
against ``oracle_sql()`` in DuckDB: row count, column names, and
order-insensitive exact value comparison (columns sorted by name, rows
sorted by all columns).  Floats are compared bit-exactly — the registry's
determinism rules are designed to survive that.

Usage: python tools/parity.py [--sf-dir DIR] [names...]

Bench-scale value-hash mode (round-10 verdict item 3): the driver's
gate runs at sf=0.01 and the bench at sf=0.1 checks only n_errors, so
a scale-dependent wrong answer (overflow, cap truncation,
width-sensitive dedup) could pass both.  ``--rotate N --rotation-key
rK`` runs a deterministic N-check subset of the oracle-checked
registry at the given --sf-dir (use /root/testdata/sf0.1): the subset
is the first N names under md5(key+name) order, so each round rotates
through the registry without cherry-picking and any name can be
audited by re-running with the same key.

    python tools/parity.py --sf-dir /root/testdata/sf0.1 \\
        --rotate 40 --rotation-key r10
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def normalize(df):
    """pandas frame → (colnames, sorted row tuples with canonical values)."""
    import pandas as pd

    cols = sorted(df.columns)
    df = df[cols]

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return None
        if isinstance(v, float):
            return float(v)
        if hasattr(v, "isoformat"):  # date/datetime (tz-naive by contract)
            try:
                if getattr(v, "tzinfo", None) is not None:
                    v = v.tz_convert("UTC").tz_localize(None) if hasattr(v, "tz_convert") else v
            except Exception:
                pass
            return v.isoformat()
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(canon(x) for x in v)
        try:
            import numpy as np
            if isinstance(v, np.generic):
                return canon(v.item())
        except ImportError:
            pass
        return v

    rows = [tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return cols, rows


def update_survey_header() -> str:
    """Regenerate the SURVEY.md §8 header sentence from the live
    registry (round-9 verdict item: the header drifted from 62 to 227+
    checks across rounds because it was hand-maintained)."""
    import re

    import __spark_entry__ as entrymod

    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    sent = (f"oracle by nature).  {len(qs)} registered checks: "
            f"{len(os_)} oracle-checked, {len(qs) - len(os_)} rows-only.")
    path = os.path.join(REPO, "SURVEY.md")
    with open(path) as fh:
        text = fh.read()
    new = re.sub(r"oracle by nature\)\.  \d+ registered checks: \d+ "
                 r"oracle-checked, \d+ rows-only\.", sent, text, count=1)
    with open(path, "w") as fh:
        fh.write(new)
    return sent


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--update-survey", action="store_true",
                    help="rewrite the SURVEY.md §8 header from the "
                         "registry and exit")
    ap.add_argument("--rotate", type=int, default=0,
                    help="run only the first N oracle-checked names "
                         "under md5(rotation-key + name) order — the "
                         "deterministic per-round bench-scale subset")
    ap.add_argument("--rotation-key", default="r0",
                    help="round tag seeding the --rotate selection")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    if args.update_survey:
        print(update_survey_header())
        return 0

    import duckdb

    import __spark_entry__ as entrymod
    from ethereum2_etl_airflow_spark.session import build_session
    from ethereum2_etl_airflow_spark.sources.testdata import TABLES

    spark = build_session(app_name="parity", master="local[8]",
                          shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{args.sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.rotate:
        import hashlib

        names = sorted(
            (n for n in qs if n in oracles),
            key=lambda n: hashlib.md5(
                (args.rotation_key + n).encode()).hexdigest(),
        )[:args.rotate]
        print(f"rotation {args.rotation_key}: {len(names)} of "
              f"{len(oracles)} oracle-checked names at {args.sf_dir}")
    else:
        names = args.names or sorted(qs)
    n_pass = n_fail = n_rowsonly = 0
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            spdf = sdf.toPandas()
        except Exception as ex:
            print(f"FAIL  {name}: spark raised: {str(ex).splitlines()[0][:140]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(spdf)} rows (rows-only, {time.time()-t0:.1f}s)")
            n_rowsonly += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            print(f"FAIL  {name}: duckdb raised: {str(ex).splitlines()[0][:140]}")
            n_fail += 1
            continue
        sc, sr = normalize(spdf)
        oc, orows = normalize(odf)
        if sc != oc:
            print(f"FAIL  {name}: columns {sc} != {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orows):
            print(f"FAIL  {name}: rowcount {len(sr)} != {len(orows)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orows) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)} differing rows; first: spark={bad[0][0]} oracle={bad[0][1]}")
            n_fail += 1
            continue
        print(f"PASS  {name}: {len(sr)} rows ({time.time()-t0:.1f}s)")
        n_pass += 1

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
