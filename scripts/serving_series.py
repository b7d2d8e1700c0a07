#!/usr/bin/env python3
"""Phase-controlled SERVING-level A/B: full gRPC generation drives
against N engine configurations, interleaved within ONE process, >= 3
rounds, reported as mean +/- spread (VERDICT r3 weak 5 / item 6).

Why: the tunneled transport has ±15% throughput phases and occasional
wedges, so serving numbers from separate runs are not comparable — the
round-3 paged serving figure needed a manual phase recovery. Here every
round drives each server back-to-back inside the same phase window
(the serving analogue of scripts/engine_series.py), all servers live
in this one process on their own asyncio loop threads.

Measurement-artifact parity: the reference's client writes a summary
JSON per run (/root/reference/src/grpc/client/inference_client.cpp:277-360);
this emits the same per-config summaries plus the cross-round spread.

Usage (decode-dominated A/B at the slot-sweep knee):
  python scripts/serving_series.py --rounds 3 \
      --requests 128 --concurrency 64 --new-tokens 256
"""

from __future__ import annotations

import argparse
import asyncio
import json
import statistics
import sys
import threading

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def _cfg_dict(name: str, options: dict, tiny: bool = False) -> dict:
    model = {
        "family": "llama-1b",
        "compute_dtype": "BF16",
        "quantization": "int8",
        "options": dict(
            {
                "max_len": 1024,
                "prefill_buckets": [64, 128, 256, 512],
                "steps_per_sync": 8,
                "decode_pipeline_depth": 4,
                "fetch_timeout_s": 600,
            },
            **options,
        ),
    }
    if tiny:  # CPU smoke: llama-tiny shapes, small buckets
        model["family"] = "llama-tiny"
        model["compute_dtype"] = "FP32"
        model["quantization"] = "none"
        model["options"].update(
            max_len=128, prefill_buckets=[16, 32], steps_per_sync=2,
        )
    return {
        "name": name,
        "model": model,
        "inputs": [{"name": "input_ids", "dims": [512], "dtype": "INT64"}],
        "outputs": [{"name": "logits", "dims": [512, 32000],
                     "dtype": "FP32"}],
        "pool_size": 1,
        "max_batch_size": 1,
        "batch_coalesce_timeout_ms": 0,
        "batching_strategy": "disabled",
        "max_queue_size": 512,
        "max_inflight_tasks": 16,
        "congestion": {"enabled": False},
        "metrics_enabled": False,
        "server": {"address": "127.0.0.1:0"},
    }


class _Harness:
    """InferenceServer on a private asyncio loop thread (the e2e test
    harness pattern), sharing this process with its siblings so A/B
    rounds stay inside one transport phase."""

    def __init__(self, cfg):
        from starpu_inference_server_tpu.grpc.server import InferenceServer

        self.server = InferenceServer(cfg, expose_metrics=False)
        self.ready = threading.Event()
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_until_complete(
            self.server.serve(warmup=True, ready_event=self.ready)
        )
        self.loop.close()

    def start(self, timeout=2400):
        self.thread.start()
        if not self.ready.wait(timeout=timeout):
            raise RuntimeError("server failed to start")
        self.target = f"127.0.0.1:{self.server.bound_port}"
        return self

    def stop(self):
        self.loop.call_soon_threadsafe(self.server.request_stop)
        self.thread.join(timeout=60)


def _drive(target, args) -> dict:
    from starpu_inference_server_tpu.clients.client import GenerationClient

    async def go():
        client = GenerationClient(
            target, "llama", prompt_len=args.prompt_len,
            max_new_tokens=args.new_tokens, seed=7,
        )
        elapsed = await client.run(
            args.requests, args.concurrency, stream=False
        )
        summary = client.summary(elapsed)
        await client.close()
        return summary

    return asyncio.new_event_loop().run_until_complete(go())


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--requests", type=int, default=128)
    p.add_argument("--concurrency", type=int, default=64)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--new-tokens", type=int, default=256)
    p.add_argument("--configs", nargs="+",
                   default=["dense-16", "dense-32", "paged-64"],
                   help="dense-<slots>, paged-<slots>, paged<page>-"
                        "<slots> (pool = half the dense footprint), "
                        "copyplain-<slots> (copy-model weights, plain "
                        "decode) or lookup-<slots> (copy-model weights "
                        "+ prompt-lookup speculation) — the serving-"
                        "level lookup A/B (VERDICT r4 item 5). Any "
                        "label takes a '+flat' suffix for the "
                        "lane-aligned FLAT cache layout arm")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true",
                   help="llama-tiny shapes (CPU smoke)")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from starpu_inference_server_tpu.utils.config import parse_config

    harnesses = []
    for label in args.configs:
        base, flat = (label[:-len("+flat")], True) if label.endswith(
            "+flat") else (label, False)
        kind, slots = base.rsplit("-", 1)
        slots = int(slots)
        options = {"num_slots": slots}
        if flat:
            options["kv_cache_layout"] = "flat"
        if kind.startswith("paged"):
            page = int(kind[len("paged"):] or (16 if args.tiny else 256))
            max_len = 128 if args.tiny else 1024
            options["kv_page_size"] = page
            options["kv_pool_pages"] = 1 + slots * (max_len // page) // 2
        elif kind == "lookuprand":
            # lookup machinery on RANDOM weights (no repetition to
            # exploit): the no-loss floor at serving level
            options["speculate_k"] = 2 if args.tiny else 4
            options["prompt_lookup_ngram"] = 2
        elif kind in ("copyplain", "lookup"):
            # copy-model weights (models/decoder.rig_copy_model): greedy
            # output follows permutation cycles at the full model's
            # per-forward cost — the repetition-heavy workload
            # prompt-lookup exploits; copyplain is the equal-weights
            # control
            options["copy_model_cycle"] = 8 if args.tiny else 32
            if kind == "lookup":
                options["speculate_k"] = 2 if args.tiny else 8
                options["prompt_lookup_ngram"] = 2
        elif kind != "dense":
            raise SystemExit(f"unknown config kind {label!r}")
        cfg = parse_config(_cfg_dict("llama", options, tiny=args.tiny))
        print(f"# starting {label} ...", file=sys.stderr)
        h = _Harness(cfg).start()
        harnesses.append((label, h))

    print("# warmup round (absorbs compiles; discarded)", file=sys.stderr)
    for label, h in harnesses:
        s = _drive(h.target, args)
        print(f"#   {label}: {s['generation']['tokens_per_s']:.0f} tok/s "
              f"(warm)", file=sys.stderr)

    series = {label: [] for label, _ in harnesses}
    for rnd in range(args.rounds):
        parts = []
        for label, h in harnesses:
            s = _drive(h.target, args)
            assert s["requests"]["errors"] == 0, s["requests"]
            tps = s["generation"]["tokens_per_s"]
            series[label].append(tps)
            parts.append(f"{label} {tps:.0f}")
        print(f"round {rnd}: " + " | ".join(parts) + " tok/s", flush=True)

    for label, _ in harnesses:
        vals = series[label]
        mean = statistics.mean(vals)
        spread = (max(vals) - min(vals)) / 2
        print(json.dumps({
            "config": label,
            "tok_s_mean": round(mean, 0),
            "tok_s_spread": round(spread, 0),
            "rounds": [round(v, 0) for v in vals],
            "requests": args.requests,
            "concurrency": args.concurrency,
            "new_tokens": args.new_tokens,
        }))

    for _, h in harnesses:
        h.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
