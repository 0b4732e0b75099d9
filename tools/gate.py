"""One-command quality gate: runs every checker available in the
environment and fails if any runnable gate is red.

Gates (mirroring the reference CI, /root/reference/.github/workflows/
ci.yml): ruff check, ruff format --check, mypy, pytest (unit tests +
library doctests via pyproject addopts), and a bench smoke (bench.py
at sf0.01 must exit 0 — a round must never close with a broken bench;
r2 shipped BENCH rc=1 after a schema migration landed without one).
ruff/mypy are skipped with a notice when not installed (the build
container has neither); pytest and the bench smoke are mandatory.

Usage: python tools/gate.py [extra pytest args]
       python tools/gate.py --no-bench [...]   # skip the bench smoke
"""

from __future__ import annotations

import importlib.util
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(name: str, cmd: list[str]) -> bool:
    print(f"=== {name}: {' '.join(cmd)}", flush=True)
    rc = subprocess.call(cmd, cwd=REPO)
    print(f"=== {name}: {'OK' if rc == 0 else f'FAILED rc={rc}'}", flush=True)
    return rc == 0


def main() -> int:
    failures = []
    if importlib.util.find_spec("ruff"):
        if not _run("ruff-check", [sys.executable, "-m", "ruff", "check", "."]):
            failures.append("ruff-check")
        if not _run(
            "ruff-format", [sys.executable, "-m", "ruff", "format", "--check", "."]
        ):
            failures.append("ruff-format")
    else:
        print("=== ruff: not installed, skipped")
    if importlib.util.find_spec("mypy"):
        if not _run("mypy", [sys.executable, "-m", "mypy", "flycatcher_spark"]):
            failures.append("mypy")
    else:
        print("=== mypy: not installed, skipped")
    args = sys.argv[1:]
    run_bench = "--no-bench" not in args
    extra = [a for a in args if a != "--no-bench"] or ["-q"]
    if not _run("pytest", [sys.executable, "-m", "pytest", *extra]):
        failures.append("pytest")
    if run_bench:
        env = dict(
            os.environ,
            SPARK_GRAFT_SF_DIR=os.environ.get(
                "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
            ),
        )
        print("=== bench-smoke: bench.py at", env["SPARK_GRAFT_SF_DIR"], flush=True)
        rc = subprocess.call([sys.executable, "bench.py"], cwd=REPO, env=env)
        print(f"=== bench-smoke: {'OK' if rc == 0 else f'FAILED rc={rc}'}", flush=True)
        if rc != 0:
            failures.append("bench-smoke")
    if failures:
        print(f"GATE RED: {failures}")
        return 1
    print("GATE GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
