#!/usr/bin/env python3
"""Decode throughput vs slot count, dense AND paged, interleaved in one
process (VERDICT r3 item 1).

Weight reads amortize over slots: a decode step reads the full weight
set once regardless of how many sequences advance, so aggregate tok/s
should rise with slot count until attention/KV traffic or sampling work
bites. Every dense config shipped `num_slots: 16` through round 3 with
no curve anywhere — this sweep produces the tok/s-vs-slots table, the
HBM accounting, and the knee.

Per round, for each configuration, two tiers (same discipline as
scripts/engine_series.py — the tunnel has ±15% phases, so all ratios
are computed within a round, in one process):

- raw:    all decode blocks chained in ONE jitted fori_loop (device
          ceiling at full occupancy);
- engine: the real GenerationEngine serving S concurrent requests.

Reference capability being matched: the batching raison d'être of the
reference's BatchCollector (src/starpu_task_worker/
batch_collector_component.cpp:278-339) — throughput rises with batch;
for continuous-batching decoders the batch knob IS the slot count.

Usage:
  python scripts/slot_sweep.py --family llama-1b --quant int8 \
      --new-tokens 256 --rounds 3
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="llama-1b")
    p.add_argument("--quant", default="int8", choices=["none", "int8", "int4"])
    p.add_argument("--dense-slots", type=int, nargs="+",
                   default=[16, 32, 64])
    p.add_argument("--paged-slots", type=int, nargs="+", default=[32, 64],
                   help="paged configs; pool sized to HALF the dense "
                        "footprint of the same slot count (the "
                        "llama_paged.yml construction)")
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--new-tokens", type=int, default=256)
    p.add_argument("--steps-per-sync", type=int, default=8)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--page-size", type=int, default=128)
    p.add_argument("--pipeline-depth", type=int, default=4)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--skip-engine", action="store_true",
                   help="raw tier only (fast curve)")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

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

    spec = get_spec(args.family, {})
    bits = {"none": None, "int8": 8, "int4": 4}[args.quant]
    params = maybe_quantize_tree(
        init_params(spec, np.random.default_rng(0)), bits
    )
    # place ONCE: every engine's device_put then reuses these buffers
    # instead of uploading a fresh ~1.2 GB copy per config (an
    # N-config sweep OOMs otherwise)
    params = jax.device_put(params)
    weight_bytes = sum(
        int(np.prod(x.shape)) * x.dtype.itemsize
        for x in jax.tree.leaves(params)
        if hasattr(x, "shape") and hasattr(x, "dtype")
    )
    T, steps, P = args.max_len, args.steps_per_sync, args.prompt_len
    n_blocks = args.new_tokens // steps
    page = args.page_size
    # pages a fully-occupied raw chain needs per slot
    pages_per_slot = -(-(P + args.new_tokens) // page)

    # per-token dense KV bytes (k+v int8 + f32 scales), for the HBM table
    kv_token_bytes = spec.layers * 2 * spec.kv_heads * (spec.head_dim + 4)

    configs = []
    for s in args.dense_slots:
        configs.append({"label": f"dense-{s}", "slots": s, "pool": 0})
    for s in args.paged_slots:
        pool = 1 + s * (T // page) // 2  # half the dense footprint
        configs.append({"label": f"paged-{s}", "slots": s, "pool": pool})

    prompt = np.arange(1, P + 1, dtype=np.int32)

    for cfg in configs:
        s = cfg["slots"]
        eng = GenerationEngine(
            spec, params, dtype=jnp.bfloat16, num_slots=s, max_len=T,
            prefill_buckets=[P], steps_per_sync=steps, decode_overlap=True,
            pipeline_depth=args.pipeline_depth, fetch_timeout_s=600,
            kv_page_size=page if cfg["pool"] else 0,
            kv_pool_pages=cfg["pool"],
        )
        cfg["engine"] = eng
        if args.skip_engine:
            # the raw tier brings its own fresh cache; freeing the
            # engine's (allocated in __init__) halves the sweep's HBM
            # footprint so big slot counts fit side by side
            eng.cache = None
        if cfg["pool"]:
            need = s * pages_per_slot
            if need > cfg["pool"] - 1:
                print(f"# {cfg['label']}: raw tier needs {need} pages, "
                      f"pool has {cfg['pool'] - 1}; skipping raw",
                      file=sys.stderr)
                cfg["raw_ok"] = False
            else:
                cfg["raw_ok"] = True
            cfg["kv_hbm_gb"] = cfg["pool"] * page * kv_token_bytes / 1e9
        else:
            cfg["raw_ok"] = True
            cfg["kv_hbm_gb"] = s * T * kv_token_bytes / 1e9

        S = s
        active = jnp.ones((S,), bool)
        temps = jnp.zeros((S,), jnp.float32)
        top_k = jnp.zeros((S,), jnp.int32)
        seeds = jnp.zeros((S,), jnp.uint32)
        eos = jnp.full((S,), -1, jnp.int32)
        limit = jnp.full((S,), 1 << 30, jnp.int32)
        cfg["vectors"] = (active, temps, top_k, seeds, eos, limit)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(params, cache, ids, prog, k, _eng=eng,
                    _vec=cfg["vectors"]):
            active, temps, top_k, seeds, eos, limit = _vec

            def body(_, carry):
                cache, ids, prog = carry
                cache, _, ids, prog, _ = _eng._decode_and_sample(
                    params, cache, ids, active, temps, top_k, seeds,
                    prog, eos, limit,
                )
                return cache, ids, prog

            cache, ids, prog = jax.lax.fori_loop(
                0, k, body, (cache, ids, prog)
            )
            return ids[0]

        cfg["chained"] = chained

    def fresh_cache(cfg):
        s = cfg["slots"]
        if cfg["pool"]:
            c = init_paged_cache(spec, s, T, num_pages=cfg["pool"],
                                 page_size=page)
            # grant each slot its pages up front (what the engine's
            # admission allocator does per request)
            table = np.zeros((s, T // page), np.int32)
            for i in range(s):
                table[i, :pages_per_slot] = 1 + np.arange(
                    i * pages_per_slot, (i + 1) * pages_per_slot
                )
            c = c._replace(table=jnp.asarray(table))
        else:
            c = init_cache(spec, s, T)
        return jax.device_put(c)._replace(
            lengths=jnp.full((s,), P, jnp.int32)
        )

    def run_raw(cfg):
        if not cfg["raw_ok"]:
            return float("nan")
        s = cfg["slots"]
        c = fresh_cache(cfg)
        ids0 = jnp.ones((s,), jnp.int32)
        prog0 = jnp.ones((s,), jnp.int32)
        t0 = time.perf_counter()
        np.asarray(cfg["chained"](params, c, ids0, prog0, n_blocks))
        return n_blocks * steps * s / (time.perf_counter() - t0)

    def run_engine(cfg):
        eng = cfg["engine"]
        s = cfg["slots"]
        reqs = [GenerationRequest(prompt_ids=prompt,
                                  max_new_tokens=args.new_tokens)
                for _ in range(s)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        for r in reqs:
            r.result(timeout=1200)
        return s * args.new_tokens / (time.perf_counter() - t0)

    print("# compiling ...", file=sys.stderr)
    for cfg in configs:
        t0 = time.perf_counter()
        run_raw(cfg)
        if not args.skip_engine:
            cfg["engine"].start()
            cfg["engine"].generate(prompt, max_new_tokens=steps * 2,
                                   timeout=1200)
        print(f"#   {cfg['label']}: compiled in "
              f"{time.perf_counter() - t0:.0f}s", file=sys.stderr)

    results = {c["label"]: {"raw": [], "engine": []} for c in configs}
    for rnd in range(args.rounds):
        parts = []
        for cfg in configs:
            raw = run_raw(cfg)
            engine = 0.0 if args.skip_engine else run_engine(cfg)
            results[cfg["label"]]["raw"].append(raw)
            results[cfg["label"]]["engine"].append(engine)
            parts.append(f"{cfg['label']} raw {raw:.0f} eng {engine:.0f}")
        print(f"round {rnd}: " + " | ".join(parts), flush=True)

    print("\n# label slots kv_hbm_gb raw_best eng_best "
          "steps_per_s weight_gb_s")
    for cfg in configs:
        r = results[cfg["label"]]
        raw_best = max(r["raw"])
        eng_best = max(r["engine"])
        steps_rate = raw_best / cfg["slots"]  # token-steps/s/slot = blocks
        print(json.dumps({
            "label": cfg["label"],
            "slots": cfg["slots"],
            "kv_hbm_gb": round(cfg["kv_hbm_gb"], 2),
            "raw_tok_s": round(raw_best, 0),
            "engine_tok_s": round(eng_best, 0),
            "weight_traffic_gb_s": round(
                steps_rate * weight_bytes / 1e9, 1
            ),
        }))
    for cfg in configs:
        if not args.skip_engine:
            cfg["engine"].stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
