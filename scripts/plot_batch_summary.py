#!/usr/bin/env python3
"""Plot batching-trace summaries (trace.csv / metrics.csv -> PNGs).

Reference counterpart: scripts/plot_batch_summary.py — run at server
shutdown over the trace logger's CSV artifacts to produce latency /
throughput / per-worker plots. Output: <trace_dir>/plots/*.png.
Matplotlib is optional; without it the script prints a text summary.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import defaultdict

PHASES = ["queue_ms", "batch_ms", "scheduling_ms", "codelet_ms", "total_ms"]


def load_rows(path):
    with open(path, newline="") as fh:
        return [row for row in csv.DictReader(fh)]


def text_summary(rows) -> None:
    by_lane = defaultdict(list)
    for row in rows:
        by_lane[row["lane"]].append(row)
    print(f"batches: {len(rows)}")
    for lane, lane_rows in sorted(by_lane.items()):
        sizes = [int(r["batch_size"]) for r in lane_rows]
        totals = [float(r["total_ms"]) for r in lane_rows]
        print(
            f"  {lane}: {len(lane_rows)} batches, mean size "
            f"{sum(sizes)/len(sizes):.1f}, mean total "
            f"{sum(totals)/len(totals):.2f} ms"
        )


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("trace_dir")
    args = parser.parse_args()

    trace_csv = os.path.join(args.trace_dir, "trace.csv")
    if not os.path.exists(trace_csv):
        print(f"no trace.csv in {args.trace_dir}", file=sys.stderr)
        return 1
    rows = [r for r in load_rows(trace_csv) if r.get("warmup") != "1"]
    if not rows:
        print("no non-warmup batches recorded")
        return 0

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        text_summary(rows)
        return 0

    out_dir = os.path.join(args.trace_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)

    # per-phase latency over batch index
    fig, ax = plt.subplots(figsize=(10, 5))
    for phase in PHASES:
        ax.plot([float(r[phase]) for r in rows], label=phase, linewidth=1)
    ax.set_xlabel("batch #")
    ax.set_ylabel("ms")
    ax.set_title("per-phase latency")
    ax.legend()
    fig.savefig(os.path.join(out_dir, "phase_latency.png"), dpi=120)

    # batch size distribution
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.hist([int(r["batch_size"]) for r in rows], bins=32)
    ax.set_xlabel("batch size")
    ax.set_title("executed batch sizes")
    fig.savefig(os.path.join(out_dir, "batch_sizes.png"), dpi=120)

    # per-lane batch counts
    by_lane = defaultdict(int)
    for row in rows:
        by_lane[row["lane"]] += 1
    fig, ax = plt.subplots(figsize=(7, 4))
    ax.bar(range(len(by_lane)), list(by_lane.values()))
    ax.set_xticks(range(len(by_lane)))
    ax.set_xticklabels(list(by_lane), rotation=45, ha="right")
    ax.set_title("batches per lane")
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "lane_counts.png"), dpi=120)

    # queue depth + cumulative rejections over time
    metrics_csv = os.path.join(args.trace_dir, "metrics.csv")
    if os.path.exists(metrics_csv):
        mrows = load_rows(metrics_csv)
        fig, ax = plt.subplots(figsize=(10, 4))
        t = [int(r["t_us"]) / 1e6 for r in mrows]
        ax.plot(t, [int(r["queue_size"]) for r in mrows], label="queue size")
        ax.plot(t, [int(r["cum_rejections"]) for r in mrows],
                label="cumulative rejections")
        ax.set_xlabel("s")
        ax.legend()
        fig.savefig(os.path.join(out_dir, "queue.png"), dpi=120)

    print(f"plots written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
