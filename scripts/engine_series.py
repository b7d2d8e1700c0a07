#!/usr/bin/env python3
"""Interleaved engine-efficiency series: raw chain vs dispatch-only vs
full engine, N rounds each IN ONE PROCESS.

Why this exists (VERDICT r2 item 1 / CLAUDE.md measurement notes): the
tunneled transport has ±15-35% throughput phases, so numbers from
separate processes are not comparable — every ratio here is computed
within a round. The three tiers decompose the engine's efficiency:

- raw: all blocks chained in ONE jitted fori_loop, one scalar fetch —
  the device ceiling;
- dispatch-only: the same blocks as per-block jitted dispatches with a
  depth-4 prefetched pipeline — isolates the per-PROGRAM device-side
  boundary cost (~7 ms on the axon tunnel, measured independent of arg
  count);
- engine: the real GenerationEngine serving S concurrent requests
  (admission prefills + landings + commit included).

Round 0 absorbs cold executables (e.g. the batched-prefill program) —
discard it when quoting results.

Usage:
  python scripts/engine_series.py --family llama-1b --quant int8 \
      --slots 16 --new-tokens 512 --steps-per-sync 8 --rounds 3
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="llama-1b")
    p.add_argument("--quant", default="int8", choices=["none", "int8", "int4"])
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--new-tokens", type=int, default=512)
    p.add_argument("--steps-per-sync", type=int, default=8)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--pipeline-depth", type=int, default=4)
    p.add_argument("--rounds", type=int, default=3)
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
    S, T, steps = args.slots, args.max_len, args.steps_per_sync
    P = args.prompt_len
    n_blocks = args.new_tokens // steps
    ids0 = jnp.ones((S,), jnp.int32)
    active = jnp.ones((S,), bool)
    temps = jnp.zeros((S,), jnp.float32)
    top_k = jnp.zeros((S,), jnp.int32)
    seeds = jnp.zeros((S,), jnp.uint32)
    prog0 = jnp.ones((S,), jnp.int32)
    eos = jnp.full((S,), -1, jnp.int32)
    limit = jnp.full((S,), 1 << 30, jnp.int32)
    prompt = np.arange(1, P + 1, dtype=np.int32)

    eng = GenerationEngine(
        spec, params, dtype=jnp.bfloat16, num_slots=S, max_len=T,
        prefill_buckets=[P], steps_per_sync=steps, decode_overlap=True,
        pipeline_depth=args.pipeline_depth, fetch_timeout_s=600,
    )

    def fresh_cache():
        c = jax.device_put(init_cache(spec, S, T))
        return c._replace(lengths=jnp.full((S,), P, jnp.int32))

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(params, cache, ids, prog, k):
        def body(_, carry):
            cache, ids, prog = carry
            cache, _, ids, prog, _ = eng._decode_and_sample(
                params, cache, ids, active, temps, top_k, seeds, prog,
                eos, limit,
            )
            return cache, ids, prog
        cache, ids, prog = jax.lax.fori_loop(0, k, body, (cache, ids, prog))
        return ids[0]

    def run_raw():
        c = fresh_cache()
        t0 = time.perf_counter()
        np.asarray(chained(eng.params, c, ids0, prog0, n_blocks))
        return n_blocks * steps * S / (time.perf_counter() - t0)

    def run_dispatch():
        c, i, p_, a = fresh_cache(), ids0, prog0, active
        outs = []
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            c, blk, i, p_, a = eng._decode(
                eng.params, c, i, a, temps, top_k, seeds, p_, eos, limit
            )
            blk.copy_to_host_async()
            outs.append(blk)
            if len(outs) > args.pipeline_depth:
                np.asarray(outs.pop(0))
        for b in outs:
            np.asarray(b)
        return n_blocks * steps * S / (time.perf_counter() - t0)

    def run_engine():
        eng.cache = fresh_cache()._replace(
            lengths=jnp.zeros((S,), jnp.int32)
        )
        reqs = [GenerationRequest(prompt_ids=prompt,
                                  max_new_tokens=args.new_tokens)
                for _ in range(S)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        for r in reqs:
            r.result(timeout=1200)
        return S * args.new_tokens / (time.perf_counter() - t0)

    print("# compiling ...", file=sys.stderr)
    run_raw()
    run_dispatch()
    eng.start()
    eng.generate(prompt, max_new_tokens=steps * 2, timeout=1200)
    for rnd in range(args.rounds):
        r1, r2, r3 = run_raw(), run_dispatch(), run_engine()
        print(
            f"round {rnd}: raw {r1:.0f} | dispatch-only {r2:.0f} "
            f"({r2 / r1:.3f}) | engine {r3:.0f} ({r3 / r1:.3f}) tok/s",
            flush=True,
        )
    eng.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
