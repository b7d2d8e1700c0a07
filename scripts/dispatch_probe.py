#!/usr/bin/env python3
"""Isolate the dense-128 per-block dispatch bubble (round 5).

knee_decomp read dispatch-only at 54-70% of raw with a ~55 ms/block
gap that leafcost_probe showed is NOT argument-leaf marshalling
(13 ms/program flat from 8 to 64 donated leaves). Variants timed here,
llama-1b int8 dense-128 steps=8:

  chain      : all 32 blocks in ONE program (the raw ceiling)
  nofetch    : per-block _decode programs, ONE fetch at the end —
               pure program-boundary cost, no host fetch interleaving
  prefetch   : + copy_to_host_async per block (no waits)
  pipeline   : the real depth-4 fetch pipeline (knee_decomp's tier)

Usage: python scripts/dispatch_probe.py [--slots 128] [--steps 8]
"""

from __future__ import annotations

import argparse
import functools
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=128)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--new-tokens", type=int, default=256)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_cache,
        init_params,
    )
    from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree
    from starpu_inference_server_tpu.serving.generation import GenerationEngine

    S, steps = args.slots, args.steps
    T, P = 1024, 32
    n_blocks = args.new_tokens // steps
    spec = get_spec("llama-1b", {})
    params = jax.device_put(maybe_quantize_tree(
        init_params(spec, np.random.default_rng(0)), 8
    ))
    eng = GenerationEngine(
        spec, params, dtype=jnp.bfloat16, num_slots=S, max_len=T,
        prefill_buckets=[P], steps_per_sync=steps, fetch_timeout_s=600,
    )
    eng.cache = None
    active = jnp.ones((S,), bool)
    temps = jnp.zeros((S,), jnp.float32)
    top_k = jnp.zeros((S,), jnp.int32)
    seeds = jnp.zeros((S,), jnp.uint32)
    eos = jnp.full((S,), -1, jnp.int32)
    limit = jnp.full((S,), 1 << 30, jnp.int32)

    def fresh():
        c = jax.device_put(init_cache(spec, S, T))._replace(
            lengths=jnp.full((S,), P, jnp.int32))
        return c, jnp.ones((S,), jnp.int32), jnp.ones((S,), jnp.int32)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chained(params, cache, ids, prog, k):
        def body(_, carry):
            cache, ids, prog = carry
            cache, _, ids, prog, _ = eng._decode_and_sample(
                params, cache, ids, active, temps, top_k, seeds, prog,
                eos, limit)
            return cache, ids, prog
        cache, ids, prog = jax.lax.fori_loop(0, k, body, (cache, ids, prog))
        return ids[0]

    def t_chain():
        c, i, pr = fresh()
        t0 = time.perf_counter()
        float(chained(params, c, i, pr, n_blocks))
        return time.perf_counter() - t0

    def t_blocks(prefetch: bool, depth: int):
        c, i, pr = fresh()
        a = active
        outs = []
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            c, blk, i, pr, a = eng._decode(
                eng.params, c, i, a, temps, top_k, seeds, pr, eos, limit)
            if prefetch:
                blk.copy_to_host_async()
            if depth:
                outs.append(blk)
                if len(outs) > depth:
                    np.asarray(outs.pop(0))
        if depth:
            for b_ in outs:
                np.asarray(b_)
        else:
            np.asarray(blk)  # one sync at the end
        return time.perf_counter() - t0

    variants = {
        "chain": t_chain,
        "nofetch": lambda: t_blocks(False, 0),
        "prefetch": lambda: t_blocks(True, 0),
        "pipeline": lambda: t_blocks(True, 4),
    }
    for name, fn in variants.items():
        fn()  # compile/warm
    tot = n_blocks * steps * S
    for rnd in range(args.rounds):
        parts = []
        for name, fn in variants.items():
            el = fn()
            parts.append(f"{name} {tot / el:.0f} tok/s "
                         f"({el / n_blocks * 1e3:.1f} ms/blk)")
        print(f"round {rnd}: " + " | ".join(parts), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
