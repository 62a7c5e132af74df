"""Per-query warm-timing + job-count profiler (guide §1: measure first).

Usage: python tools/profile_queries.py [--sf-dir DIR] [--reps 3] name...

For each query: one cold run, then ``reps`` warm runs to the noop sink;
prints cold wall, warm min/median, and the number of Spark jobs the
query submits (job-count ≈ barrier count — eager checkpoints, AQE stage
materializations, collect()s all show up here).
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entrymod
    from ethereum2_etl_airflow_spark.session import build_session

    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    spark = build_session(app_name="profile", master=f"local[{cpus}]",
                          shuffle_partitions=8)
    sc = spark.sparkContext
    qs = entrymod.queries()
    # same fixture setup as bench.py so fixture writes don't pollute runs
    try:
        from ethereum2_etl_airflow_spark.plans.checks_extension import (
            ensure_ivf_index, ensure_pq_index, ensure_sessionize_source,
            ensure_stream_join_outer_source)
        from ethereum2_etl_airflow_spark.plans.checks_reference import (
            ensure_avro_staged, ensure_csv_staged, ensure_evolved_staged,
            ensure_ndjson_staged, ensure_orc_staged, ensure_overwrite_sink,
            ensure_partition_staged, ensure_xml_staged)

        for fix in (ensure_sessionize_source, ensure_stream_join_outer_source,
                    ensure_pq_index, ensure_ivf_index, ensure_ndjson_staged,
                    ensure_csv_staged, ensure_orc_staged,
                    ensure_evolved_staged, ensure_partition_staged,
                    ensure_overwrite_sink, ensure_xml_staged,
                    ensure_avro_staged):
            try:
                fix(spark, args.sf_dir)
            except Exception:
                pass
    except Exception:
        pass
    spark.read.parquet(f"{args.sf_dir}/region.parquet").count()

    import gc

    for name in args.names:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        walls: list[float] = []
        n_jobs = 0
        for rep in range(args.reps + 1):
            gc.collect()
            spark.catalog.clearCache()
            group = f"{name}-{rep}"
            sc.setJobGroup(group, name)
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            try:
                df = qs[name](spark, args.sf_dir)
                df.write.mode("overwrite").format("noop").save()
            except Exception as ex:
                print(f"ERR  {name}: {str(ex).splitlines()[0][:140]}")
                break
            walls.append(time.time() - t0)
            try:
                n_jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            except Exception:
                n_jobs = -1
        if walls:
            warm = walls[1:] or walls
            print(f"{name:26s} cold {walls[0]:6.2f}  warm_min "
                  f"{min(warm):6.2f}  warm_med {statistics.median(warm):6.2f}"
                  f"  jobs {n_jobs}")
        sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
