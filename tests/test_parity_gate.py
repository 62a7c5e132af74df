"""The driver-gate replica as a pytest: every registered check must be
parity-green (or rows-only by design) at sf0.01.

The driver samples only ~50 of the registered checks per round, so a
check it never draws could rot silently between rounds if only the
sampled ones were tested.  This test runs ``tools/parity.py`` — the
repo's exact replica of the driver's CORRECTNESS comparison (row count,
column names, order-insensitive exact values) — over the FULL check
registry, making `pytest tests/` the standing evidence for the
never-sampled checks.

Runs in a subprocess: parity builds its own Spark session + DuckDB
connection, and the suite's shared session must not inherit its
configuration.  Deselect with ``-m "not parity"`` for fast iteration.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parity
def test_every_registered_check_is_parity_green():
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity.py")],
        capture_output=True, text=True, timeout=1800, cwd=REPO)
    tail = "\n".join(proc.stdout.splitlines()[-40:])
    assert proc.returncode == 0, f"parity gate red:\n{tail}"
    assert " 0 fail" in proc.stdout.splitlines()[-1], tail
