"""Dump the PRE-checkpoint serving-plan fragment of sim_ivf_exact.

The operator returns a ``finalize_release`` checkpoint, so a plain
``.explain()`` of the check shows only the checkpoint scan; this spy
captures the plan of the frame the checkpoint materializes — the
serving join + top-k, the part the round-12 probe-literal change
reshapes.  Usage:

    python tools/ivf_fragment_dump.py plans/r12/sim_ivf_exact_serve_before.txt
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out_path = sys.argv[1]
    import ethereum2_etl_airflow_spark.functions.layout as L
    import ethereum2_etl_airflow_spark.operators.similarity as S
    from ethereum2_etl_airflow_spark.plans.checks_extension import (
        q_sim_ivf_exact)
    from ethereum2_etl_airflow_spark.session import build_session

    spark = build_session(app_name="ivf_dump", master="local[8]",
                          shuffle_partitions=8)
    cap: dict = {}
    orig = L.finalize_release

    def spy(result, *cached):
        cap["plan"] = result._sc._jvm.PythonSQLUtils.explainString(
            result._jdf.queryExecution(), "formatted")
        return orig(result, *cached)

    L.finalize_release = spy
    S.finalize_release = spy
    try:
        q_sim_ivf_exact(spark, "/root/testdata/sf0.1") \
            .write.mode("overwrite").format("noop").save()
    finally:
        L.finalize_release = orig
        S.finalize_release = orig
    with open(out_path, "w") as fh:
        fh.write("== sim_ivf_exact pre-checkpoint serving fragment ==\n")
        fh.write(cap.get("plan", "(not captured)"))
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
