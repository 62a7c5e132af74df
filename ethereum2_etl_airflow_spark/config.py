"""Pipeline configuration (SURVEY §2.7 O13 — analog of `variables.py:6-64`).

The reference resolves Airflow Variables with a ``{chain}_`` prefix,
required/default handling and date/int/list parsing.  Here the same
semantics live in a plain mapping-backed resolver plus typed dataclasses,
so the engine library is usable with or without Airflow (the DAG builders
feed it from Airflow Variables; tests feed it dicts).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime
from typing import Any, Mapping

__all__ = ["read_var", "ExportConfig", "LoadConfig",
           "read_export_config", "read_load_config"]

_SENTINEL = object()


def read_var(
    vars: Mapping[str, Any],
    name: str,
    prefix: str = "",
    required: bool = False,
    default: Any = _SENTINEL,
    parse: str | None = None,
) -> Any:
    """Prefix-resolving variable reader (`variables.py:55-64`): try
    ``{prefix}{name}`` then ``{name}``; enforce ``required``; parse
    ``date`` / ``int`` / ``list`` (comma-separated, stripped —
    `variables.py:15`, `build_load_dag.py:50`)."""
    val = vars.get(f"{prefix}{name}", vars.get(name, _SENTINEL))
    if val is _SENTINEL or val in (None, ""):
        if required:
            raise ValueError(f"required variable {prefix}{name} is not set")
        val = None if default is _SENTINEL else default
    if val is None or parse is None:
        return val
    if parse == "date":
        return val if isinstance(val, datetime) else datetime.strptime(str(val), "%Y-%m-%d")
    if parse == "int":
        return int(val)
    if parse == "list":
        if isinstance(val, (list, tuple)):
            return list(val)
        return [x.strip() for x in str(val).split(",") if x.strip()]
    raise ValueError(f"unknown parse mode {parse!r}")


@dataclass
class ExportConfig:
    """Export-DAG settings (`variables.py:6-35`; defaults per reference)."""

    chain: str = "eth2_mainnet"
    provider_uris: list[str] = field(default_factory=list)
    output_bucket: str = ""
    export_start_date: datetime | None = None
    export_end_date: datetime | None = None   # integration-test mode end
    export_schedule: str = "30 * * * *"
    export_max_workers: int = 5               # README.md:71
    export_max_active_runs: int = 3           # README.md:70
    export_rate_limit: int | None = None      # variables.py:20-21
    notification_emails: list[str] = field(default_factory=list)


@dataclass
class LoadConfig:
    """Load-DAG settings (`build_load_dag.py:22-65`)."""

    chain: str = "eth2_mainnet"
    output_bucket: str = ""
    destination_dataset_project_id: str = ""
    dataset_name: str = "crypto_ethereum2"
    load_schedule: str = "0 2 * * *"          # README.md:73 daily default
    load_start_date: datetime | None = None
    load_end_date: datetime | None = None     # flips catchup (build_load_dag.py:60)
    notification_emails: list[str] = field(default_factory=list)


def read_export_config(vars: Mapping[str, Any], chain: str = "eth2_mainnet") -> ExportConfig:
    p = f"{chain}_"
    return ExportConfig(
        chain=chain,
        provider_uris=read_var(vars, "provider_uris", p, required=True, parse="list"),
        output_bucket=read_var(vars, "output_bucket", p, required=True),
        export_start_date=read_var(vars, "export_start_date", p, parse="date"),
        export_end_date=read_var(vars, "export_end_date", p, parse="date"),
        export_schedule=read_var(vars, "export_schedule", p, default="30 * * * *"),
        export_max_workers=read_var(vars, "export_max_workers", p, default=5, parse="int"),
        export_max_active_runs=read_var(vars, "export_max_active_runs", p,
                                        default=3, parse="int"),
        export_rate_limit=read_var(vars, "export_rate_limit", p, parse="int"),
        notification_emails=read_var(vars, "notification_emails", p,
                                     default=[], parse="list"),
    )


def read_load_config(vars: Mapping[str, Any], chain: str = "eth2_mainnet") -> LoadConfig:
    p = f"{chain}_"
    return LoadConfig(
        chain=chain,
        output_bucket=read_var(vars, "output_bucket", p, required=True),
        destination_dataset_project_id=read_var(
            vars, "destination_dataset_project_id", p, default=""),
        dataset_name=read_var(vars, "dataset_name", p, default="crypto_ethereum2"),
        load_schedule=read_var(vars, "load_schedule", p, default="0 2 * * *"),
        load_start_date=read_var(vars, "load_start_date", p, parse="date"),
        load_end_date=read_var(vars, "load_end_date", p, parse="date"),
        notification_emails=read_var(vars, "notification_emails", p,
                                     default=[], parse="list"),
    )
