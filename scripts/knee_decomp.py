#!/usr/bin/env python3
"""Full decode-throughput decomposition AT THE SHIPPED KNEE
(paged 256-row pages x 64 slots) — raw / dispatch-only / engine /
serving, interleaved in ONE process, steps_per_sync 8 and 16
(VERDICT r4 item 1).

Round 4 shipped llama_paged.yml at the slot-sweep knee (raw ~7,963
tok/s) but the serving stack captured only ~56% of it (4,432), and the
83%-dispatch-bound ceiling argument was established at dense-16 and
never re-measured here. This script produces the missing decomposition
so the raw->serving gap can be attributed (program-boundary cost vs
admission/prefill work vs gRPC/commit overhead) instead of assumed.

Tiers (every ratio computed within a round — the tunnel has ±15%
phases, CLAUDE.md):

- raw:      all decode blocks chained in ONE jitted fori_loop at full
            occupancy, one scalar fetch — the device ceiling;
- dispatch: per-block jitted dispatches with a depth-N prefetch
            pipeline — adds only the per-PROGRAM boundary cost;
- engine:   the real GenerationEngine serving S concurrent requests
            (prefills + landings + commit included);
- serving:  full gRPC generation drive against an in-process server
            (the serving_series harness) — adds protocol + wire.

Usage:
  python scripts/knee_decomp.py --config paged256-64 --steps 8 16 \
      --rounds 3 --requests 128 --concurrency 64 --new-tokens 256
"""

from __future__ import annotations

import argparse
import functools
import json
import statistics
import sys
import time

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)
sys.path.insert(0, REPO + "/scripts")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="paged256-64",
                   help="dense-<slots> or paged<page>-<slots> "
                        "(pool = half the dense footprint)")
    p.add_argument("--family", default="llama-1b")
    p.add_argument("--quant", default="int8", choices=["none", "int8", "int4"])
    p.add_argument("--steps", type=int, nargs="+", default=[8, 16])
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--new-tokens", type=int, default=256)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--pipeline-depth", type=int, default=4)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--requests", type=int, default=128)
    p.add_argument("--concurrency", type=int, default=64)
    p.add_argument("--skip-serving", action="store_true")
    p.add_argument("--layout", nargs="+", default=["standard"],
                   choices=["standard", "flat"],
                   help="KV-cache layout arm(s) to interleave "
                        "(flat = lane-aligned [S,T,Hkv*D] leaves)")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--tiny", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    import serving_series
    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_cache,
        init_params,
    )
    from starpu_inference_server_tpu.models.paged_decoder import (
        init_paged_cache,
    )
    from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree
    from starpu_inference_server_tpu.serving.generation import (
        GenerationEngine,
        GenerationRequest,
    )
    from starpu_inference_server_tpu.utils.config import parse_config

    kind, slots = args.config.rsplit("-", 1)
    S = int(slots)
    if kind.startswith("paged"):
        page = int(kind[len("paged"):] or 256)
        pool = 1 + S * (args.max_len // page) // 2
    elif kind == "dense":
        page = pool = 0
    else:
        raise SystemExit(f"unknown config kind {args.config!r}")

    spec = get_spec(args.family if not args.tiny else "llama-tiny", {})
    bits = {"none": None, "int8": 8, "int4": 4}[args.quant]
    params = maybe_quantize_tree(
        init_params(spec, np.random.default_rng(0)), bits
    )
    T, P = args.max_len, args.prompt_len
    prompt = np.arange(1, P + 1, dtype=np.int32)
    pages_per_slot = -(-(P + args.new_tokens) // page) if page else 0

    tiers = {}
    combos = [(s, lay) for s in args.steps for lay in args.layout]
    for steps, layout in combos:
        n_blocks = args.new_tokens // steps
        eng = GenerationEngine(
            spec, params, dtype=jnp.bfloat16, num_slots=S, max_len=T,
            prefill_buckets=[P], steps_per_sync=steps, decode_overlap=True,
            pipeline_depth=args.pipeline_depth, fetch_timeout_s=600,
            kv_page_size=page, kv_pool_pages=pool,
            kv_cache_layout=layout,
        )
        active = jnp.ones((S,), bool)
        temps = jnp.zeros((S,), jnp.float32)
        top_k = jnp.zeros((S,), jnp.int32)
        seeds = jnp.zeros((S,), jnp.uint32)
        eos = jnp.full((S,), -1, jnp.int32)
        limit = jnp.full((S,), 1 << 30, jnp.int32)

        def fresh_cache(_flat=(layout == "flat")):
            if pool:
                c = init_paged_cache(spec, S, T, num_pages=pool,
                                     page_size=page, flat=_flat)
                table = np.zeros((S, T // page), np.int32)
                for i in range(S):
                    table[i, :pages_per_slot] = 1 + np.arange(
                        i * pages_per_slot, (i + 1) * pages_per_slot
                    )
                c = c._replace(table=jnp.asarray(table))
            else:
                c = init_cache(spec, S, T, flat=_flat)
            return jax.device_put(c)._replace(
                lengths=jnp.full((S,), P, jnp.int32)
            )

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(params, cache, ids, prog, k, _eng=eng, _act=active,
                    _tmp=temps, _tk=top_k, _sd=seeds, _eos=eos, _lim=limit):
            def body(_, carry):
                cache, ids, prog = carry
                cache, _, ids, prog, _ = _eng._decode_and_sample(
                    params, cache, ids, _act, _tmp, _tk, _sd, prog,
                    _eos, _lim,
                )
                return cache, ids, prog

            cache, ids, prog = jax.lax.fori_loop(0, k, body,
                                                 (cache, ids, prog))
            return ids[0]

        def run_raw(_ch=chained, _fc=fresh_cache, _nb=n_blocks, _st=steps):
            c = _fc()
            ids0 = jnp.ones((S,), jnp.int32)
            prog0 = jnp.ones((S,), jnp.int32)
            t0 = time.perf_counter()
            np.asarray(_ch(params, c, ids0, prog0, _nb))
            return _nb * _st * S / (time.perf_counter() - t0)

        def run_dispatch(_eng=eng, _fc=fresh_cache, _nb=n_blocks,
                         _st=steps, _vec=(active, temps, top_k, seeds,
                                          eos, limit)):
            act, tmp, tk, sd, eo, lim = _vec
            c = _fc()
            i = jnp.ones((S,), jnp.int32)
            pr = jnp.ones((S,), jnp.int32)
            a = act
            outs = []
            t0 = time.perf_counter()
            for _ in range(_nb):
                c, blk, i, pr, a = _eng._decode(
                    _eng.params, c, i, a, tmp, tk, sd, pr, eo, lim
                )
                blk.copy_to_host_async()
                outs.append(blk)
                if len(outs) > args.pipeline_depth:
                    np.asarray(outs.pop(0))
            for b in outs:
                np.asarray(b)
            return _nb * _st * S / (time.perf_counter() - t0)

        def run_engine(_eng=eng):
            # same request count as the serving drive (slot churn and
            # the second admission wave included) so engine-vs-serving
            # isolates exactly the gRPC/protocol layer
            reqs = [GenerationRequest(prompt_ids=prompt,
                                      max_new_tokens=args.new_tokens)
                    for _ in range(args.requests)]
            before = dict(_eng.loop_timers)
            t0 = time.perf_counter()
            for r in reqs:
                _eng.submit(r)
            for r in reqs:
                r.result(timeout=1200)
            wall = time.perf_counter() - t0
            delta = {k: _eng.loop_timers[k] - before.get(k, 0.0)
                     for k in _eng.loop_timers}
            phases = " ".join(f"{k}={v:.2f}s" for k, v in sorted(
                delta.items()) if v > 0.005)
            print(f"#   engine wall {wall:.2f}s [{phases}]",
                  file=sys.stderr)
            return len(reqs) * args.new_tokens / wall

        tiers[(steps, layout)] = {
            "engine": eng, "raw": run_raw,
            "dispatch": run_dispatch, "run_engine": run_engine}

        if not args.skip_serving:
            options = {
                "num_slots": S, "steps_per_sync": steps,
                "decode_pipeline_depth": args.pipeline_depth,
                "kv_cache_layout": layout,
            }
            if pool:
                options["kv_page_size"] = page
                options["kv_pool_pages"] = pool
            cfg = parse_config(serving_series._cfg_dict(
                "llama", options, tiny=args.tiny))
            print(f"# starting serving harness (steps={steps}, "
                  f"{layout}) ...", file=sys.stderr)
            tiers[(steps, layout)]["harness"] = (
                serving_series._Harness(cfg).start())

    print("# compiling ...", file=sys.stderr)
    for (steps, layout), t in tiers.items():
        t0 = time.perf_counter()
        t["raw"]()
        t["dispatch"]()
        t["engine"].start()
        t["engine"].generate(prompt, max_new_tokens=steps * 2, timeout=1200)
        if "harness" in t:
            s = serving_series._drive(t["harness"].target, args)
            print(f"#   steps={steps} {layout} serving warm: "
                  f"{s['generation']['tokens_per_s']:.0f} tok/s",
                  file=sys.stderr)
        print(f"#   steps={steps} {layout}: primed in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    series = {key: {"raw": [], "dispatch": [], "engine": [],
                    "serving": []} for key in tiers}
    for rnd in range(args.rounds):
        for (steps, layout), t in tiers.items():
            r1 = t["raw"]()
            r2 = t["dispatch"]()
            r3 = t["run_engine"]()
            r4 = 0.0
            if "harness" in t:
                s = serving_series._drive(t["harness"].target, args)
                assert s["requests"]["errors"] == 0, s["requests"]
                r4 = s["generation"]["tokens_per_s"]
            key = (steps, layout)
            series[key]["raw"].append(r1)
            series[key]["dispatch"].append(r2)
            series[key]["engine"].append(r3)
            series[key]["serving"].append(r4)
            print(f"round {rnd} steps={steps} {layout}: raw {r1:.0f} | "
                  f"dispatch {r2:.0f} ({r2 / r1:.3f}) | "
                  f"engine {r3:.0f} ({r3 / r1:.3f}) | "
                  f"serving {r4:.0f} ({r4 / r1:.3f})", flush=True)

    for steps, layout in combos:
        row = {"config": args.config, "steps_per_sync": steps,
               "layout": layout}
        for tier, vals in series[(steps, layout)].items():
            if not any(vals):
                continue
            row[tier] = round(statistics.mean(vals), 0)
            row[f"{tier}_spread"] = round((max(vals) - min(vals)) / 2, 0)
        print(json.dumps(row))

    for t in tiers.values():
        t["engine"].stop()
        if "harness" in t:
            t["harness"].stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
