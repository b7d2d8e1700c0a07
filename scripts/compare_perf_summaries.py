#!/usr/bin/env python3
"""Compare a candidate perf summary against a baseline with relative
tolerances.

Reference counterpart: scripts/compare_perf_summaries.py (same CLI:
--baseline --candidate --latency-metric --max-latency-regression-pct
--max-throughput-drop-pct --max-rejected --expected-requests). The CI
gate values come from the reference workflow: throughput drop <= 10 %,
server_overall p95 regression <= 15 % (.github/workflows/ci.yml:639-640).
"""

from __future__ import annotations

import argparse
import json
import sys


def fail(msg: str) -> None:
    print(f"[perf-compare] {msg}", file=sys.stderr)
    raise SystemExit(1)


def load(path: str) -> dict:
    try:
        with open(path) as fh:
            return json.load(fh)
    except OSError as exc:
        fail(f"cannot read {path}: {exc}")


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--baseline", required=True)
    parser.add_argument("--candidate", required=True)
    parser.add_argument("--latency-metric", default="server_overall")
    parser.add_argument("--max-latency-regression-pct", required=True, type=float)
    parser.add_argument("--max-throughput-drop-pct", required=True, type=float)
    parser.add_argument("--max-rejected", type=int, default=0)
    parser.add_argument("--expected-requests", type=int)
    args = parser.parse_args()

    baseline = load(args.baseline)
    candidate = load(args.candidate)

    requests = candidate.get("requests") or {}
    rejected = int(requests.get("rejected", -1))
    if rejected < 0:
        fail("candidate requests section incomplete")
    if rejected > args.max_rejected:
        fail(f"candidate rejected {rejected} > allowed {args.max_rejected}")
    if args.expected_requests is not None and int(
        requests.get("sent", -1)
    ) != args.expected_requests:
        fail(f"candidate sent != expected {args.expected_requests}")

    base_tp = float(baseline.get("throughput_rps", 0.0))
    cand_tp = float(candidate.get("throughput_rps", 0.0))
    if base_tp > 0:
        drop_pct = 100.0 * (base_tp - cand_tp) / base_tp
        if drop_pct > args.max_throughput_drop_pct:
            fail(
                f"throughput dropped {drop_pct:.1f}% "
                f"({base_tp:.2f} -> {cand_tp:.2f} rps), "
                f"allowed {args.max_throughput_drop_pct}%"
            )

    def p95(summary):
        metric = summary.get("latency_ms", {}).get(args.latency_metric)
        if not isinstance(metric, dict) or "p95" not in metric:
            fail(f"latency metric {args.latency_metric!r} missing")
        return float(metric["p95"])

    base_p95, cand_p95 = p95(baseline), p95(candidate)
    if base_p95 > 0:
        regression_pct = 100.0 * (cand_p95 - base_p95) / base_p95
        if regression_pct > args.max_latency_regression_pct:
            fail(
                f"{args.latency_metric} p95 regressed {regression_pct:.1f}% "
                f"({base_p95:.2f} -> {cand_p95:.2f} ms), "
                f"allowed {args.max_latency_regression_pct}%"
            )

    print(
        f"[perf-compare] OK: throughput {base_tp:.2f} -> {cand_tp:.2f} rps, "
        f"{args.latency_metric} p95 {base_p95:.2f} -> {cand_p95:.2f} ms"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
