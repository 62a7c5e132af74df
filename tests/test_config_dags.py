"""Config resolution (O13) + DAG-builder shape tests (O1-O15) with a
stubbed Airflow — the real scheduler is an optional dependency."""

from __future__ import annotations

import sys
import types
from datetime import datetime

import pytest

from ethereum2_etl_airflow_spark.config import (
    read_export_config, read_load_config, read_var,
)
from ethereum2_etl_airflow_spark.dags import provider_fallback


def test_read_var_prefix_and_parsing():
    vars = {"eth2_mainnet_provider_uris": "http://a, http://b ,",
            "output_bucket": "gs://fallback",
            "eth2_mainnet_export_max_workers": "7",
            "eth2_mainnet_export_start_date": "2020-12-01"}
    p = "eth2_mainnet_"
    assert read_var(vars, "provider_uris", p, parse="list") == \
        ["http://a", "http://b"]
    assert read_var(vars, "output_bucket", p) == "gs://fallback"  # prefix fallback
    assert read_var(vars, "export_max_workers", p, parse="int") == 7
    assert read_var(vars, "export_start_date", p, parse="date") == \
        datetime(2020, 12, 1)
    assert read_var(vars, "missing", p, default="d") == "d"
    with pytest.raises(ValueError):
        read_var(vars, "missing", p, required=True)


def test_export_config_defaults():
    cfg = read_export_config({
        "eth2_mainnet_provider_uris": "http://node",
        "eth2_mainnet_output_bucket": "gs://bkt"})
    assert cfg.export_max_workers == 5      # README.md:71
    assert cfg.export_max_active_runs == 3  # README.md:70
    assert cfg.export_schedule == "30 * * * *"


def test_load_config_defaults():
    cfg = read_load_config({"eth2_mainnet_output_bucket": "gs://bkt"})
    assert cfg.load_schedule == "0 2 * * *"  # README.md:73
    assert cfg.dataset_name == "crypto_ethereum2"


def test_provider_fallback_order():
    calls = []

    def fn(uri):
        calls.append(uri)
        if uri != "good":
            raise RuntimeError("down")
        return "ok"

    assert provider_fallback(["bad1", "bad2", "good"], fn) == "ok"
    assert calls == ["bad1", "bad2", "good"]
    with pytest.raises(RuntimeError):
        provider_fallback(["bad1"], fn)


@pytest.fixture()
def stub_airflow(monkeypatch):
    """Minimal Airflow stand-in capturing DAG/task wiring."""
    af = types.ModuleType("airflow")
    ops = types.ModuleType("airflow.operators")
    py = types.ModuleType("airflow.operators.python")

    class DAG:
        def __init__(self, dag_id, **kw):
            self.dag_id, self.kw, self.tasks = dag_id, kw, []

    class PythonOperator:
        def __init__(self, task_id, python_callable=None, dag=None, **kw):
            self.task_id, self.python_callable, self.kw = task_id, python_callable, kw
            self.downstream: list[str] = []
            if dag is not None:
                dag.tasks.append(self)

        def __rshift__(self, other):
            self.downstream.append(other.task_id)
            return other

    af.DAG, py.PythonOperator = DAG, PythonOperator
    monkeypatch.setitem(sys.modules, "airflow", af)
    monkeypatch.setitem(sys.modules, "airflow.operators", ops)
    monkeypatch.setitem(sys.modules, "airflow.operators.python", py)
    return af


def test_export_dag_shape(stub_airflow):
    from ethereum2_etl_airflow_spark.dags import build_export_dag

    cfg = read_export_config({
        "eth2_mainnet_provider_uris": "http://a,http://b",
        "eth2_mainnet_output_bucket": "gs://bkt"})
    dag = build_export_dag(cfg)
    assert dag.dag_id == "eth2_mainnet_export_dag"
    assert sorted(t.task_id for t in dag.tasks) == [
        "export_beacon_blocks", "export_beacon_committees",
        "export_beacon_validators"]
    # retry policy from the reference (build_export_dag.py:39-40)
    assert dag.kw["default_args"]["retries"] == 5
    # unwired callback raises clearly
    with pytest.raises(NotImplementedError):
        dag.tasks[0].python_callable(ds="2024-01-01")


def test_export_dag_provider_fallback_wiring(stub_airflow):
    from ethereum2_etl_airflow_spark.dags import build_export_dag

    seen = []

    def export_blocks(uri, ds, hour):
        seen.append((uri, ds, hour))
        if uri.endswith("a"):
            raise RuntimeError("down")
        return "staged"

    cfg = read_export_config({
        "eth2_mainnet_provider_uris": "http://a,http://b",
        "eth2_mainnet_output_bucket": "gs://bkt"})
    dag = build_export_dag(cfg, export_fns={"beacon_blocks": export_blocks})
    blocks = next(t for t in dag.tasks if t.task_id == "export_beacon_blocks")
    assert blocks.python_callable(ds="2024-01-01") == "staged"
    assert [u for u, *_ in seen] == ["http://a", "http://b"]


def test_load_dag_shape_and_wiring(stub_airflow):
    from ethereum2_etl_airflow_spark.dags import build_load_dag

    cfg = read_load_config({"eth2_mainnet_output_bucket": "gs://bkt"})
    dag = build_load_dag(cfg, spark_factory=lambda: None,
                         staging_root="/s", warehouse_root="/w")
    ids = sorted(t.task_id for t in dag.tasks)
    assert ids == ["load_beacon_blocks", "load_beacon_committees",
                   "load_beacon_validators", "send_email",
                   "verify_blocks_count", "verify_blocks_have_latest",
                   "verify_committees_count", "verify_validators_count"]
    loads = {t.task_id: t for t in dag.tasks}
    # load >> verify edges (build_load_dag.py:142-144)
    assert set(loads["load_beacon_blocks"].downstream) == {
        "verify_blocks_count", "verify_blocks_have_latest"}
    # all verifies feed the success email (build_load_dag.py:134-144)
    assert loads["verify_committees_count"].downstream == ["send_email"]
    # catchup only with an end date (build_load_dag.py:60)
    assert dag.kw["catchup"] is False