"""The baseline regression comparison actually gates (VERDICT round-2
missing 2): a synthetic 20% slowdown against the committed baseline
summary must fail, and an equal candidate must pass.

Reference contract: scripts/compare_perf_summaries.py +
.github/workflows/ci.yml:625-724,639-640 (throughput drop <= 10%,
server_overall p95 regression <= 15%)."""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent.parent
BASELINE = REPO / "ci" / "perf" / "baseline_summary_cpu.json"


def _compare(candidate_path):
    return subprocess.run(
        [sys.executable, str(REPO / "scripts" / "compare_perf_summaries.py"),
         "--baseline", str(BASELINE), "--candidate", str(candidate_path),
         "--latency-metric", "server_overall",
         "--max-throughput-drop-pct", "10",
         "--max-latency-regression-pct", "15",
         "--max-rejected", "0", "--expected-requests", "64"],
        capture_output=True, text=True, timeout=60,
    )


def test_committed_baseline_is_complete():
    d = json.loads(BASELINE.read_text())
    assert d["requests"] == {"sent": 64, "handled": 64, "rejected": 0,
                             "errors": 0}
    assert d["throughput_rps"] > 0
    assert "p95" in d["latency_ms"]["server_overall"]


def test_equal_candidate_passes(tmp_path):
    cand = tmp_path / "cand.json"
    cand.write_text(BASELINE.read_text())
    proc = _compare(cand)
    assert proc.returncode == 0, proc.stderr


def test_twenty_pct_slowdown_fails(tmp_path):
    d = json.loads(BASELINE.read_text())
    d["throughput_rps"] *= 0.8
    cand = tmp_path / "slow.json"
    cand.write_text(json.dumps(d))
    proc = _compare(cand)
    assert proc.returncode == 1
    assert "throughput dropped" in proc.stderr


def test_p95_regression_fails(tmp_path):
    d = json.loads(BASELINE.read_text())
    d["latency_ms"]["server_overall"]["p95"] *= 1.2
    cand = tmp_path / "lat.json"
    cand.write_text(json.dumps(d))
    proc = _compare(cand)
    assert proc.returncode == 1
    assert "p95 regressed" in proc.stderr


def test_rejected_requests_fail(tmp_path):
    d = json.loads(BASELINE.read_text())
    d["requests"]["rejected"] = 1
    cand = tmp_path / "rej.json"
    cand.write_text(json.dumps(d))
    proc = _compare(cand)
    assert proc.returncode == 1
