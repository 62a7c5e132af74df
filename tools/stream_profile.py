"""Micro-batch duration breakdown for the streaming checks (guide §1).

Usage: python tools/stream_profile.py [--sf-dir DIR] [--reps 2] name...

Monkey-patches ``streaming.run_bounded`` to capture each run's
``recentProgress`` and prints, per rep: total wall, number of
micro-batches, and the engine's own durationMs breakdown
(addBatch / getBatch / latestOffset / queryPlanning / walCommit /
commitOffsets / triggerExecution) summed over batches — the numbers
that say whether the wall is planning, state I/O, or real work.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    import ethereum2_etl_airflow_spark.streaming as st
    from ethereum2_etl_airflow_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = build_session(app_name="stream_profile",
                          master=f"local[{cpus}]", shuffle_partitions=8)
    qs = entrymod.queries()
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    captured: list = []
    orig = st.run_bounded

    def spy(df, spark_, mode="append", n=None, prefix="st",
            progress_out=None, est_keys=None, **kw):
        mine: list = []
        out = orig(df, spark_, mode=mode, n=n, prefix=prefix,
                   progress_out=mine, est_keys=est_keys, **kw)
        captured.extend(mine)
        return out

    st.run_bounded = spy
    # the checks import run_bounded lazily via `from ..streaming import
    # run_bounded`, which resolves at call time through the module attr —
    # but some modules bind it at import; patch those too
    for modname in list(sys.modules):
        m = sys.modules[modname]
        if getattr(m, "run_bounded", None) is orig:
            m.run_bounded = spy

    for name in args.names:
        for rep in range(args.reps):
            captured.clear()
            t0 = time.time()
            qs[name](spark, args.sf_dir).write.mode("overwrite") \
                .format("noop").save()
            wall = time.time() - t0
            keys = ("addBatch", "getBatch", "latestOffset",
                    "queryPlanning", "walCommit", "commitOffsets",
                    "triggerExecution")
            agg = {k: 0 for k in keys}
            for p in captured:
                d = p.get("durationMs", {}) if isinstance(p, dict) else {}
                for k in keys:
                    agg[k] += int(d.get(k, 0))
            brk = " ".join(f"{k}={v}" for k, v in agg.items() if v)
            print(f"{name} rep{rep}: wall={wall:.2f}s "
                  f"batches={len(captured)} {brk}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
