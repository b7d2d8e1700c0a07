#!/usr/bin/env python3
"""Plot batching-trace summaries (trace.csv / metrics.csv -> PNGs).

Reference counterpart: scripts/plot_batch_summary.py (the reference
ships a ~2k-line suite of per-phase / per-worker / arrival / SLA
views; /root/reference/scripts/plot_batch_summary.py:31-48 defines the
phase-color table this mirrors). Run at server shutdown — or manually —
over the trace logger's CSV artifacts (monitoring/trace.py):

- ``trace.csv``: one row per executed batch with the per-phase latency
  breakdown, lane, batch size, arrival timestamps, congestion flag;
- ``metrics.csv``: sampled queue depth + cumulative rejections.

Views produced (each its own PNG under <trace_dir>/plots/):
  phase_latency      per-phase latency over batch index
  latency_stack      stacked per-phase area (where time goes, per batch)
  phase_waterfall    mean phase breakdown as a cumulative waterfall
  rolling_pctl       rolling p50/p95 of total latency
  latency_cdf        total-latency CDF + per-phase CDFs
  lane_cdf_grid      per-lane total-latency CDFs
  lane_boxplots      per-lane latency boxplots + batch counts
  phase_heatmap      batch x phase latency heatmap
  size_vs_latency    batch size vs codelet/total latency scatter
  throughput         rolling completed-requests/s over time
  arrivals           request arrival timeline + rolling arrival rate
  sla                fraction of batches under each SLA threshold
  queue              queue depth + cumulative rejections (+ congestion)

Matplotlib is optional; without it the script prints a text summary.
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import defaultdict

PHASES = ["queue_ms", "batch_ms", "scheduling_ms", "codelet_ms",
          "inference_ms"]
PHASE_COLORS = {
    "queue_ms": "#4878cf",
    "batch_ms": "#ee854a",
    "scheduling_ms": "#d65f5f",
    "codelet_ms": "#6acc65",
    "inference_ms": "#956cb4",
    "total_ms": "#444444",
}
SLA_THRESHOLDS_MS = (50.0, 100.0, 150.0, 200.0)
ROLLING = 50


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


def _rolling(vals, window, fn):
    out = []
    for i in range(len(vals)):
        lo = max(0, i - window + 1)
        out.append(fn(vals[lo : i + 1]))
    return out


def _pctl(vals, q):
    s = sorted(vals)
    if not s:
        return 0.0
    idx = min(len(s) - 1, int(q * (len(s) - 1)))
    return s[idx]


def make_plots(rows, mrows, out_dir) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    os.makedirs(out_dir, exist_ok=True)
    n = len(rows)
    totals = [float(r["total_ms"]) for r in rows]
    sizes = [int(r["batch_size"]) for r in rows]
    phase_vals = {p: [float(r[p]) for r in rows] for p in PHASES}
    congested = [int(r.get("congested", 0)) for r in rows]
    lanes = sorted({r["lane"] for r in rows})

    def save(fig, name):
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{name}.png"), dpi=120)
        plt.close(fig)

    def shade_congestion(ax):
        in_run = None
        for i, c in enumerate(congested + [0]):
            if c and in_run is None:
                in_run = i
            elif not c and in_run is not None:
                ax.axvspan(in_run - 0.5, i - 0.5, color="#d65f5f", alpha=0.12)
                in_run = None

    # 1. per-phase latency over batch index
    fig, ax = plt.subplots(figsize=(11, 5))
    for p in PHASES + ["total_ms"]:
        vals = phase_vals.get(p, totals if p == "total_ms" else None)
        ax.plot(vals, label=p[:-3], linewidth=1, color=PHASE_COLORS[p])
    shade_congestion(ax)
    ax.set_xlabel("batch #")
    ax.set_ylabel("ms")
    ax.set_title("per-phase latency (congestion shaded)")
    ax.legend(ncol=3, fontsize=8)
    save(fig, "phase_latency")

    # 2. stacked per-phase area — where each batch's time goes
    fig, ax = plt.subplots(figsize=(11, 5))
    ax.stackplot(
        range(n), *[phase_vals[p] for p in PHASES],
        labels=[p[:-3] for p in PHASES],
        colors=[PHASE_COLORS[p] for p in PHASES],
    )
    ax.set_xlabel("batch #")
    ax.set_ylabel("ms")
    ax.set_title("latency composition (stacked phases)")
    ax.legend(ncol=3, fontsize=8)
    save(fig, "latency_stack")

    # 3. mean phase breakdown as a cumulative waterfall
    means = [sum(phase_vals[p]) / n for p in PHASES]
    fig, ax = plt.subplots(figsize=(8, 4.5))
    left = 0.0
    for p, m in zip(PHASES, means):
        ax.barh(0, m, left=left, color=PHASE_COLORS[p], label=p[:-3])
        if m > 0.02 * sum(means):
            ax.text(left + m / 2, 0, f"{m:.2f}", ha="center", va="center",
                    fontsize=8)
        left += m
    ax.set_yticks([])
    ax.set_xlabel("mean ms (cumulative)")
    ax.set_title("mean latency waterfall")
    ax.legend(ncol=5, fontsize=8, loc="upper center",
              bbox_to_anchor=(0.5, -0.18))
    save(fig, "phase_waterfall")

    # 4. rolling percentiles of total latency
    fig, ax = plt.subplots(figsize=(11, 4.5))
    ax.plot(_rolling(totals, ROLLING, lambda v: _pctl(v, 0.50)),
            label="rolling p50")
    ax.plot(_rolling(totals, ROLLING, lambda v: _pctl(v, 0.95)),
            label="rolling p95")
    ax.plot(_rolling(totals, ROLLING, max), label="rolling max",
            linewidth=0.8, alpha=0.6)
    shade_congestion(ax)
    ax.set_xlabel("batch #")
    ax.set_ylabel("ms")
    ax.set_title(f"rolling total-latency percentiles (window {ROLLING})")
    ax.legend(fontsize=8)
    save(fig, "rolling_pctl")

    # 5. latency CDFs (total + phases)
    fig, ax = plt.subplots(figsize=(8, 5))
    for p in PHASES + ["total_ms"]:
        vals = sorted(phase_vals.get(p, totals))
        ys = np.arange(1, len(vals) + 1) / len(vals)
        ax.plot(vals, ys, label=p[:-3], color=PHASE_COLORS[p])
    ax.set_xlabel("ms")
    ax.set_ylabel("fraction of batches")
    ax.set_title("latency CDFs")
    ax.legend(fontsize=8)
    save(fig, "latency_cdf")

    # 6. per-lane total-latency CDF grid
    cols = min(3, len(lanes))
    rows_n = -(-len(lanes) // cols)
    fig, axes = plt.subplots(
        rows_n, cols, figsize=(4 * cols, 3 * rows_n), squeeze=False
    )
    for i, lane in enumerate(lanes):
        ax = axes[i // cols][i % cols]
        vals = sorted(
            float(r["total_ms"]) for r in rows if r["lane"] == lane
        )
        ys = np.arange(1, len(vals) + 1) / len(vals)
        ax.plot(vals, ys)
        ax.set_title(lane, fontsize=9)
        ax.set_xlabel("ms", fontsize=8)
    for j in range(len(lanes), rows_n * cols):
        axes[j // cols][j % cols].axis("off")
    fig.suptitle("per-lane total-latency CDF")
    save(fig, "lane_cdf_grid")

    # 7. per-lane boxplots + batch counts
    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(11, 4.5), gridspec_kw={"width_ratios": [2, 1]}
    )
    data = [
        [float(r["total_ms"]) for r in rows if r["lane"] == lane]
        for lane in lanes
    ]
    ax1.boxplot(data, tick_labels=lanes, showfliers=False)
    ax1.set_ylabel("total ms")
    ax1.set_title("per-lane latency")
    ax1.tick_params(axis="x", rotation=30)
    ax2.bar(range(len(lanes)), [len(d) for d in data])
    ax2.set_xticks(range(len(lanes)))
    ax2.set_xticklabels(lanes, rotation=30, ha="right", fontsize=8)
    ax2.set_title("batches per lane")
    save(fig, "lane_boxplots")

    # 8. batch x phase heatmap
    mat = np.array([[phase_vals[p][i] for p in PHASES] for i in range(n)])
    fig, ax = plt.subplots(figsize=(7, max(3.5, min(10, n * 0.06))))
    im = ax.imshow(mat, aspect="auto", cmap="viridis",
                   interpolation="nearest")
    ax.set_xticks(range(len(PHASES)))
    ax.set_xticklabels([p[:-3] for p in PHASES], rotation=30, ha="right")
    ax.set_ylabel("batch #")
    ax.set_title("phase latency heatmap")
    fig.colorbar(im, ax=ax, label="ms")
    save(fig, "phase_heatmap")

    # 9. batch size vs latency scatter
    fig, ax = plt.subplots(figsize=(8, 5))
    ax.scatter(sizes, phase_vals["codelet_ms"], s=12, alpha=0.5,
               label="codelet", color=PHASE_COLORS["codelet_ms"])
    ax.scatter(sizes, totals, s=12, alpha=0.5, label="total",
               color=PHASE_COLORS["total_ms"])
    ax.set_xlabel("batch size")
    ax.set_ylabel("ms")
    ax.set_title("batch size vs latency")
    ax.legend(fontsize=8)
    save(fig, "size_vs_latency")

    # 10. batch size histogram + per-bucket counts
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(10, 4))
    ax1.hist(sizes, bins=32)
    ax1.set_xlabel("batch size")
    ax1.set_title("executed batch sizes")
    buckets = defaultdict(int)
    for r in rows:
        buckets[r.get("bucket", "?")] += 1
    keys = sorted(buckets, key=lambda b: int(b) if str(b).isdigit() else 0)
    ax2.bar(range(len(keys)), [buckets[k] for k in keys])
    ax2.set_xticks(range(len(keys)))
    ax2.set_xticklabels(keys)
    ax2.set_xlabel("bucket")
    ax2.set_title("batches per bucket")
    save(fig, "batch_sizes")

    # 11. arrivals + rolling arrival rate + throughput
    arrivals = []
    for r in rows:
        for a in (r.get("arrival_us") or "").split(";"):
            if a:
                arrivals.append(int(a) / 1e6)
    if arrivals:
        arrivals.sort()
        t0 = arrivals[0]
        rel = [a - t0 for a in arrivals]
        fig, (ax1, ax2) = plt.subplots(2, 1, figsize=(11, 6), sharex=True)
        ax1.plot(rel, range(len(rel)), linewidth=1)
        ax1.set_ylabel("request #")
        ax1.set_title("request arrival timeline")
        window = 0.5
        ts = np.arange(0, rel[-1] + window, window)
        counts, _ = np.histogram(rel, bins=ts)
        ax2.step(ts[:-1], counts / window, where="post")
        ax2.set_xlabel("s")
        ax2.set_ylabel("req/s")
        ax2.set_title(f"arrival rate ({window}s window)")
        save(fig, "arrivals")

    # 12. SLA coverage
    fig, ax = plt.subplots(figsize=(7, 4))
    fracs = [
        sum(1 for t in totals if t <= thr) / n for thr in SLA_THRESHOLDS_MS
    ]
    bars = ax.bar([f"{thr:.0f} ms" for thr in SLA_THRESHOLDS_MS], fracs)
    for b, f in zip(bars, fracs):
        ax.text(b.get_x() + b.get_width() / 2, f + 0.01, f"{f:.1%}",
                ha="center", fontsize=8)
    ax.set_ylim(0, 1.1)
    ax.set_ylabel("fraction of batches within SLA")
    ax.set_title("SLA coverage (job total)")
    save(fig, "sla")

    # 13. queue depth + rejections (+ congestion track)
    if mrows:
        fig, ax = plt.subplots(figsize=(11, 4))
        t = [int(r["t_us"]) / 1e6 for r in mrows]
        t0 = t[0]
        t = [x - t0 for x in t]
        ax.plot(t, [int(r["queue_size"]) for r in mrows], label="queue size")
        ax.plot(t, [int(r["cum_rejections"]) for r in mrows],
                label="cumulative rejections", color="#d65f5f")
        ax.set_xlabel("s")
        ax.legend(fontsize=8)
        ax.set_title("queue depth and rejections")
        save(fig, "queue")


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
    metrics_csv = os.path.join(args.trace_dir, "metrics.csv")
    mrows = load_rows(metrics_csv) if os.path.exists(metrics_csv) else []

    try:
        import matplotlib  # noqa: F401
    except ImportError:
        text_summary(rows)
        return 0

    out_dir = os.path.join(args.trace_dir, "plots")
    make_plots(rows, mrows, out_dir)
    n_pngs = len([f for f in os.listdir(out_dir) if f.endswith(".png")])
    print(f"{n_pngs} plots written to {out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
