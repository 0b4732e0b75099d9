"""Examples must stay runnable — they are the documented entry points
and rot silently otherwise. Each runs in a subprocess (own
SparkSession); only the two fastest are exercised to keep suite time
bounded."""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

import pytest

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


@pytest.mark.parametrize(
    "name",
    [
        "basic_usage.py",
        "validation_modes.py",
        "cross_field_validators.py",
        "nested_fields.py",
    ],
)
def test_example_runs_clean(name):
    proc = subprocess.run(
        [sys.executable, str(EXAMPLES / name)],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, (
        f"{name} exited {proc.returncode}\n"
        f"stdout tail: {proc.stdout[-1500:]}\n"
        f"stderr tail: {proc.stderr[-1500:]}"
    )
