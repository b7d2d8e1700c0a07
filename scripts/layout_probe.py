#!/usr/bin/env python3
"""AUTO entry-layout experiment for the decode block (round 5).

The dense-128 per-block program spends ~56 ms copying the whole KV
cache through LAYOUT CONVERSIONS: the while-loop body prefers the
cache in layout {1,3,2,0} but entry/exit params are pinned to the
default {3,2,1,0}, so every standalone block converts ~4.6 GB in and
out (HLO census: 64x s8[128,1024,8,64] + 64x f32[128,1024,8] copies).
The chained-fori program pays the same conversion ONCE per chain —
that is the entire raw-vs-dispatch gap.

This probe compiles the block with jax.experimental.layout AUTO
entry/exit layouts, allocates the cache in XLA's preferred layout, and
re-times per-block dispatch.

Usage: python scripts/layout_probe.py [--slots 128]
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=128)
    p.add_argument("--steps", type=int, default=8)
    p.add_argument("--rounds", type=int, default=3)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental.layout import Format, Layout

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_cache,
        init_params,
    )
    from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree
    from starpu_inference_server_tpu.serving.generation import GenerationEngine

    S, T, P, steps = args.slots, 1024, 32, args.steps
    n_blocks = 256 // steps
    spec = get_spec("llama-1b", {})
    params = jax.device_put(maybe_quantize_tree(
        init_params(spec, np.random.default_rng(0)), 8))
    eng = GenerationEngine(
        spec, params, dtype=jnp.bfloat16, num_slots=S, max_len=T,
        prefill_buckets=[P], steps_per_sync=steps, fetch_timeout_s=600)
    eng.cache = None
    cache0 = jax.device_put(init_cache(spec, S, T))._replace(
        lengths=jnp.full((S,), P, jnp.int32))
    ids = jnp.ones((S,), jnp.int32)
    act = jnp.ones((S,), bool)
    tmp = jnp.zeros((S,), jnp.float32)
    tk = jnp.zeros((S,), jnp.int32)
    sd = jnp.zeros((S,), jnp.uint32)
    pr = jnp.ones((S,), jnp.int32)
    eo = jnp.full((S,), -1, jnp.int32)
    lim = jnp.full((S,), 1 << 30, jnp.int32)
    args0 = (eng.params, cache0, ids, act, tmp, tk, sd, pr, eo, lim)

    auto = Format(Layout.AUTO)
    fn = jax.jit(eng._decode_and_sample, donate_argnums=(1,),
                 in_shardings=auto, out_shardings=auto)
    print("# compiling with AUTO layouts ...", flush=True)
    t0 = time.perf_counter()
    compiled = fn.lower(*args0).compile()
    print(f"# compiled in {time.perf_counter() - t0:.0f}s", flush=True)
    in_fmts = compiled.input_formats
    # relay the cache (arg 1) into its preferred layout
    cache_fmt = in_fmts[0][1]
    params_fmt = in_fmts[0][0]
    cache = jax.tree.map(
        lambda a, f: jax.device_put(a, f), cache0, cache_fmt)
    params_r = jax.tree.map(
        lambda a, f: jax.device_put(a, f), eng.params, params_fmt)
    nonstd = sum(
        1 for leaf in jax.tree.leaves(cache_fmt)
        if "layout" in str(leaf).lower() or True
    )
    # show a sample chosen layout
    print("# sample cache leaf format:",
          str(jax.tree.leaves(cache_fmt)[0]), flush=True)

    def run(cache):
        i, a, prg = ids, act, pr
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            cache, blk, i, prg, a = compiled(
                params_r, cache, i, a, tmp, tk, sd, prg, eo, lim)
        np.asarray(blk)
        el = time.perf_counter() - t0
        return cache, n_blocks * steps * S / el, el / n_blocks * 1e3

    cache, _, _ = run(cache)  # warm
    for rnd in range(args.rounds):
        cache, tps, ms = run(cache)
        print(f"round {rnd}: AUTO-layout dispatch {tps:.0f} tok/s "
              f"({ms:.1f} ms/blk)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
