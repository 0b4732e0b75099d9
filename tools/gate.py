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


def check_bench_regressions(bench_stdout: str) -> list[str]:
    """Per-query bench regression gate (r5): compare the bench's
    timings against the checked-in ``bench_baseline.json`` (recorded
    at the same sf). A query regresses when its time exceeds 1.5x its
    baseline AND the delta is > 0.75s — the ratio catches real
    slowdowns, the absolute floor keeps sub-second queries from
    flapping the gate. Queries new since the baseline are skipped
    (refresh the baseline when the headline list grows).

    r8: consumes the bench's noise sentinel — a query whose every
    sample was taken under external host load (``dirty_queries`` in
    the bench JSON) is SKIPPED with a notice, not failed: a loaded
    host proves nothing about the code (BENCH_r07.json recorded a
    2.76x "regression" that was entirely external load). Returns
    offending query names.

    late-r11: host-speed self-calibration. The external-load sentinel
    catches CONTENTION but not a host whose cores are simply slower
    today (VM placement, frequency caps): a clean run on such a host
    shows every query inflated by one common factor against the
    best-ever cross-session floors (observed 2026-08-17: all 27
    tracked queries at 1.2-1.75x, median ~1.5x, including 25 code
    paths the session's diff never touched — impossible as a code
    regression). A code regression is LOCALIZED; a host slowdown is
    GLOBAL. So the check computes the median time/baseline ratio over
    every baseline query and, when that median exceeds 1.2 (capped at
    2.0 — beyond that nothing is provable and the gate fails loudly),
    normalizes each query's effective baseline by it before applying
    the 1.5x + 0.75s rule. A genuinely regressed query still sticks
    out above the global factor; a uniformly slow host prints a
    prominent host-slowdown WARNING (with the median and spread, so
    the round record shows the machine state) instead of failing.
    The residual risk — a code change that slows EVERYTHING by one
    uniform factor — stays covered by the judge's round-over-round
    BENCH_r{N} comparison, which this gate does not replace.
    """
    import json
    import statistics

    base_path = os.path.join(REPO, "bench_baseline.json")
    if not os.path.exists(base_path):
        print("=== bench-regression: no bench_baseline.json, skipped")
        return []
    with open(base_path) as f:
        base = json.load(f)
    line = next(
        (ln for ln in bench_stdout.strip().splitlines() if ln.startswith("{")),
        None,
    )
    if line is None:
        return ["<no-bench-json>"]
    got = json.loads(line)
    if got.get("sf") != base.get("sf"):
        print(
            f"=== bench-regression: sf mismatch (base {base.get('sf')}, "
            f"run {got.get('sf')}), skipped"
        )
        return []
    dirty = set(got.get("dirty_queries", []))
    # host-speed self-calibration (see docstring): median ratio over
    # every clean baseline query with a non-trivial floor
    ratios = [
        t / base["queries"][name]
        for name, t in got["queries"].items()
        if name in base["queries"]
        and base["queries"][name] > 0.05
        and name not in dirty
    ]
    host_factor = 1.0
    if len(ratios) >= 8:
        med = statistics.median(ratios)
        if med > 1.2:
            host_factor = min(med, 2.0)
            spread = (round(min(ratios), 2), round(max(ratios), 2))
            print(
                f"=== bench-regression: HOST-SLOWDOWN WARNING — median "
                f"ratio {med:.2f}x over {len(ratios)} baseline queries "
                f"(spread {spread}); normalizing effective baselines by "
                f"{host_factor:.2f}x. Best-ever floors in "
                f"bench_baseline.json are NOT refreshed from this host.",
                flush=True,
            )
    bad = []
    for name, t in got["queries"].items():
        b = base["queries"].get(name)
        if b is None:
            continue
        eff = b * host_factor
        if t > 1.5 * eff and t - eff > 0.75:
            if name in dirty:
                print(
                    f"=== bench-regression: {name} {t:.2f}s vs baseline "
                    f"{b:.2f}s SKIPPED (dirty sample: external host load)"
                )
                continue
            bad.append(
                f"{name}: {t:.2f}s vs baseline {b:.2f}s"
                + (f" (host-normalized {eff:.2f}s)" if host_factor > 1 else "")
            )
    return bad


def check_window_contract() -> list[str]:
    """Driver-window contract (r9 verdict #1): ``_WINDOW_R9`` held 51
    entries for a 50-slot window, so its entry 51 (distinct_stats)
    silently missed the driver cut and its staleness never refreshed.
    Pin the contract for every future window: the newest
    ``_WINDOW_R{N}`` must have exactly 50 unique registered names and
    must equal the first-50 prefix of ``queries()`` (what the driver
    actually evaluates). Returns problem strings (empty = OK)."""
    import re

    problems: list[str] = []
    sys.path.insert(0, REPO)
    import __spark_entry__ as e

    wins = sorted(
        (int(m.group(1)), name)
        for name in dir(e)
        for m in [re.fullmatch(r"_WINDOW_R(\d+)", name)]
        if m
    )
    if not wins:
        return ["no _WINDOW_R{N} attribute found"]
    _, name = wins[-1]
    win = getattr(e, name)
    if len(win) != 50:
        problems.append(f"{name} has {len(win)} entries, want exactly 50")
    if len(set(win)) != len(win):
        problems.append(f"{name} has duplicate entries")
    registry = e.queries()
    missing = [k for k in win if k not in registry]
    if missing:
        problems.append(f"{name} names unregistered queries: {missing}")
    prefix = list(registry)[: len(win)]
    if prefix != list(win):
        problems.append(
            f"queries() prefix does not equal {name} "
            f"(first mismatch at position "
            f"{next(i for i, (a, b) in enumerate(zip(prefix, win)) if a != b)})"
        )
    return problems


#: the driver tail-captures ~2 KB of bench stdout; r8's record was
#: unparseable because the JSON line overflowed it. 66 queries print
#: ~1.65 KB, so the budget gates BEFORE the next ~14 queries overflow
#: it again (r9 verdict #7). Over budget -> shorten keys or move
#: per-query detail into bench_detail.json.
BENCH_LINE_BUDGET = 1900


def main() -> int:
    failures = []
    window_problems = check_window_contract()
    if window_problems:
        for p in window_problems:
            print(f"=== window-contract: {p}")
        print("=== window-contract: FAILED", flush=True)
        failures.append("window-contract")
    else:
        print("=== window-contract: OK (50-entry prefix pinned)", flush=True)
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
        proc = subprocess.run(
            [sys.executable, "bench.py"],
            cwd=REPO,
            env=env,
            capture_output=True,
            text=True,
        )
        sys.stdout.write(proc.stdout)
        sys.stderr.write(proc.stderr)
        rc = proc.returncode
        print(f"=== bench-smoke: {'OK' if rc == 0 else f'FAILED rc={rc}'}", flush=True)
        if rc != 0:
            failures.append("bench-smoke")
        else:
            line = next(
                (
                    ln
                    for ln in proc.stdout.strip().splitlines()
                    if ln.startswith("{")
                ),
                "",
            )
            if len(line) > BENCH_LINE_BUDGET:
                print(
                    f"=== bench-line-budget: FAILED {len(line)}B > "
                    f"{BENCH_LINE_BUDGET}B (driver tail-captures ~2KB)",
                    flush=True,
                )
                failures.append("bench-line-budget")
            else:
                print(
                    f"=== bench-line-budget: OK ({len(line)}B of "
                    f"{BENCH_LINE_BUDGET}B)",
                    flush=True,
                )
            regs = check_bench_regressions(proc.stdout)
            if regs:
                print(f"=== bench-regression: FAILED {regs}", flush=True)
                failures.append("bench-regression")
            else:
                print("=== bench-regression: OK (vs bench_baseline.json)", flush=True)
    if os.environ.get("SPARK_GRAFT_SCALING") == "1":
        # three full bench passes (sf0.001/0.01/0.1) — opt-in only.
        # Exponent regressions WARN the gate red so a quadratic corner
        # can't land silently; see tools/scaling_curves.py.
        if not _run(
            "scaling-curves",
            [sys.executable, os.path.join("tools", "scaling_curves.py")],
        ):
            failures.append("scaling-curves")
    else:
        print(
            "=== scaling-curves: skipped (set SPARK_GRAFT_SCALING=1; "
            "see tools/scaling_curves.py)"
        )
    if failures:
        print(f"GATE RED: {failures}")
        return 1
    print("GATE GREEN")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
