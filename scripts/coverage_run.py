#!/usr/bin/env python
"""Line-coverage gate over the fast test suite (VERDICT r4 item 7).

The reference audits coverage with gcovr and uploads to codecov
(/root/reference/.github/workflows/ci.yml coverage job,
/root/reference/reports/starpu_testing_gcovr_audit.txt); this
environment has no ``coverage`` package and no network, so this tool
implements line coverage natively on ``sys.monitoring`` (PEP 669,
Python >= 3.12 — near-zero overhead: monitored lines disable their own
event after the first hit).

Mechanics:
  1. register a LINE callback scoped to ``starpu_inference_server_tpu/``
     and run pytest in-process (fast marker selection);
  2. enumerate the package's *executable* lines by compiling every
     module and walking code objects' ``co_lines()`` (the same
     definition coverage.py uses for statement coverage);
  3. write ``ci/coverage.json`` {per-file covered/executable, total %}
     and gate against the committed baseline ``ci/coverage_baseline.json``
     with an absolute floor: total_pct >= baseline_pct - THRESHOLD_PP.

Usage:
  python scripts/coverage_run.py [pytest args...]      # measure + gate
  python scripts/coverage_run.py --update-baseline ... # re-record
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PKG = os.path.join(REPO, "starpu_inference_server_tpu")
OUT_PATH = os.path.join(REPO, "ci", "coverage.json")
BASELINE_PATH = os.path.join(REPO, "ci", "coverage_baseline.json")
# allowed regression in percentage points vs the committed baseline
# (mirrors the reference perf gate's tolerance-band style)
THRESHOLD_PP = 2.0
TOOL_ID = 3  # sys.monitoring tool id (0-5 free for applications)


def _package_files() -> list[str]:
    files = []
    for root, dirs, names in os.walk(PKG):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for name in names:
            # generated protobuf modules are excluded, as the reference
            # excludes generated code from its gcovr scope
            if name.endswith(".py") and not name.endswith("_pb2.py"):
                files.append(os.path.join(root, name))
    return sorted(files)


def _executable_lines(path: str) -> set[int]:
    """All line numbers that carry executable code (recursively through
    nested code objects), per ``co_lines`` — matching what the LINE
    monitoring event can fire on."""
    with open(path, "rb") as f:
        source = f.read()
    try:
        top = compile(source, path, "exec")
    except SyntaxError:
        return set()
    lines: set[int] = set()
    stack = [top]
    while stack:
        code = stack.pop()
        for const in code.co_consts:
            if hasattr(const, "co_lines"):
                stack.append(const)
        for _start, _end, lineno in code.co_lines():
            if lineno is not None and lineno > 0:
                lines.add(lineno)
    return lines


def run(pytest_args: list[str]) -> tuple[int, dict]:
    # ``python -m pytest`` puts the cwd on sys.path; the in-process
    # pytest.main below starts from this script's dir instead, so put
    # the repo root first or no package import resolves
    if REPO not in sys.path:
        sys.path.insert(0, REPO)
    os.chdir(REPO)
    import pytest

    hits: dict[str, set[int]] = {}
    mon = sys.monitoring
    prefix = PKG + os.sep

    def on_line(code, lineno):
        fname = code.co_filename
        if fname.startswith(prefix):
            hits.setdefault(fname, set()).add(lineno)
            return None  # keep monitoring this code object's other lines
        return mon.DISABLE  # never look at this location again

    mon.use_tool_id(TOOL_ID, "sis-coverage")
    mon.register_callback(TOOL_ID, mon.events.LINE, on_line)
    mon.set_events(TOOL_ID, mon.events.LINE)
    try:
        rc = pytest.main(pytest_args)
    finally:
        mon.set_events(TOOL_ID, 0)
        mon.register_callback(TOOL_ID, mon.events.LINE, None)
        mon.free_tool_id(TOOL_ID)

    per_file = {}
    total_exec = total_hit = 0
    for path in _package_files():
        executable = _executable_lines(path)
        covered = hits.get(path, set()) & executable
        rel = os.path.relpath(path, REPO)
        per_file[rel] = {
            "executable": len(executable),
            "covered": len(covered),
            "pct": round(100.0 * len(covered) / len(executable), 1)
            if executable else 100.0,
        }
        total_exec += len(executable)
        total_hit += len(covered)

    report = {
        "total_pct": round(100.0 * total_hit / max(1, total_exec), 2),
        "covered_lines": total_hit,
        "executable_lines": total_exec,
        "files": per_file,
    }
    return int(rc), report


def main() -> int:
    args = sys.argv[1:]
    update = "--update-baseline" in args
    if update:
        args.remove("--update-baseline")
    if not args:
        args = ["tests/", "-q", "-m", "not slow", "-p", "no:cacheprovider"]

    rc, report = run(args)
    os.makedirs(os.path.dirname(OUT_PATH), exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(report, f, indent=1)
    print(f"# coverage: {report['total_pct']:.2f}% "
          f"({report['covered_lines']}/{report['executable_lines']} lines) "
          f"-> {os.path.relpath(OUT_PATH, REPO)}")
    if rc != 0:
        print("# test run failed; coverage gate not evaluated")
        return rc

    if update or not os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH, "w") as f:
            json.dump({"total_pct": report["total_pct"],
                       "covered_lines": report["covered_lines"],
                       "executable_lines": report["executable_lines"],
                       "threshold_pp": THRESHOLD_PP}, f, indent=1)
        print(f"# baseline recorded: {report['total_pct']:.2f}%")
        return 0

    with open(BASELINE_PATH) as f:
        baseline = json.load(f)
    floor = baseline["total_pct"] - baseline.get("threshold_pp", THRESHOLD_PP)
    if report["total_pct"] < floor:
        print(f"# COVERAGE GATE FAILURE: {report['total_pct']:.2f}% < "
              f"floor {floor:.2f}% (baseline {baseline['total_pct']:.2f}% "
              f"- {baseline.get('threshold_pp', THRESHOLD_PP)}pp)")
        return 3
    print(f"# coverage gate OK (floor {floor:.2f}%)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
