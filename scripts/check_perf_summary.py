#!/usr/bin/env python3
"""Gate a client perf-summary JSON against absolute thresholds.

Reference counterpart: scripts/check_perf_summary.py (same CLI contract:
--summary --latency-metric --max-latency-p95-ms --min-throughput-rps
--max-rejected --expected-requests; zero rejections and handled == sent
by default).
"""

from __future__ import annotations

import argparse
import json
import sys


def fail(msg: str) -> None:
    print(f"[perf-check] {msg}", file=sys.stderr)
    raise SystemExit(1)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--summary", required=True)
    parser.add_argument("--latency-metric", default="server_overall")
    parser.add_argument("--max-latency-p95-ms", required=True, type=float)
    parser.add_argument("--min-throughput-rps", required=True, type=float)
    parser.add_argument("--max-rejected", type=int, default=0)
    parser.add_argument("--expected-requests", type=int)
    args = parser.parse_args()

    try:
        with open(args.summary) as fh:
            summary = json.load(fh)
    except OSError as exc:
        fail(f"cannot read summary: {exc}")

    requests = summary.get("requests") or {}
    sent = int(requests.get("sent", -1))
    handled = int(requests.get("handled", -1))
    rejected = int(requests.get("rejected", -1))
    if min(sent, handled, rejected) < 0:
        fail("requests section incomplete")
    if args.expected_requests is not None and sent != args.expected_requests:
        fail(f"sent {sent} != expected {args.expected_requests}")
    if rejected > args.max_rejected:
        fail(f"rejected {rejected} > allowed {args.max_rejected}")
    if handled + rejected != sent:
        fail(f"handled({handled}) + rejected({rejected}) != sent({sent})")

    validation = summary.get("validation")
    if validation is not None:
        failures = int(validation.get("failures", 0))
        if failures:
            fail(
                f"response validation: {failures} mismatches "
                f"({validation.get('first_mismatch', '')})"
            )

    throughput = float(summary.get("throughput_rps", 0.0))
    if throughput < args.min_throughput_rps:
        fail(f"throughput {throughput:.2f} < min {args.min_throughput_rps}")

    metric = summary.get("latency_ms", {}).get(args.latency_metric)
    if not isinstance(metric, dict) or "p95" not in metric:
        fail(f"latency metric {args.latency_metric!r} missing")
    p95 = float(metric["p95"])
    if p95 > args.max_latency_p95_ms:
        fail(f"{args.latency_metric} p95 {p95:.2f}ms > max {args.max_latency_p95_ms}ms")

    print(
        f"[perf-check] OK: throughput={throughput:.2f} rps, "
        f"{args.latency_metric} p95={p95:.2f} ms, rejected={rejected}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
