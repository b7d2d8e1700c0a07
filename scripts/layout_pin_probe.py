#!/usr/bin/env python3
"""Pin the decode block's ENTRY/EXIT cache layouts to the body layout
(round 5, the dispatch-bubble fix).

The compiled block's entry_computation_layout stores the cache params
as s8[S,1024,8,64]{1,3,2,0} / f32[S,1024,8]{1,2,0} — XLA's compact
choice (the standard {3,2,1,0} layout pads D=64 to 128 lanes) — while
the body computes in {3,2,1,0}. Every standalone block therefore
converts ~4.6 GB at entry+exit (the measured ~56 ms bubble at S=128);
the chained program converts once per chain.

Fix probed here: declare explicit standard-layout Formats for the
cache in BOTH in_shardings and out_shardings, and device_put the cache
arrays in that format once — donation then carries the layout across
blocks and the conversions disappear. Costs padded storage (2x on the
int8 data, 16x on the tiny scales) — HBM for speed.

Usage: python scripts/layout_pin_probe.py [--slots 128]
"""

from __future__ import annotations

import argparse
import re
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
    from jax.sharding import SingleDeviceSharding

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

    dev = SingleDeviceSharding(jax.devices()[0])

    def std_fmt(a):
        return Format(Layout(major_to_minor=tuple(range(a.ndim))), dev)

    cache0 = init_cache(spec, S, T)
    cache_fmts = jax.tree.map(std_fmt, cache0)

    ids = jnp.ones((S,), jnp.int32)
    act = jnp.ones((S,), bool)
    tmp = jnp.zeros((S,), jnp.float32)
    tk = jnp.zeros((S,), jnp.int32)
    sd = jnp.zeros((S,), jnp.uint32)
    pr0 = jnp.ones((S,), jnp.int32)
    eo = jnp.full((S,), -1, jnp.int32)
    lim = jnp.full((S,), 1 << 30, jnp.int32)

    in_sh = (jax.tree.map(std_fmt, eng.params), cache_fmts) + tuple(
        std_fmt(v) for v in (ids, act, tmp, tk, sd, pr0, eo, lim)
    )
    # outputs: (cache, block [steps,S], nxt, prog, alive)
    out_sh = (cache_fmts,
              Format(Layout(major_to_minor=(0, 1)), dev),
              std_fmt(ids), std_fmt(pr0), std_fmt(act))
    fn = jax.jit(eng._decode_and_sample, donate_argnums=(1,),
                 in_shardings=in_sh, out_shardings=out_sh)

    def fresh():
        c = jax.tree.map(
            lambda a, f: jax.device_put(a, f), cache0, cache_fmts)
        return c._replace(lengths=jax.device_put(
            jnp.full((S,), P, jnp.int32), std_fmt(ids)))

    params_pinned = jax.tree.map(
        lambda a, f: jax.device_put(a, f), eng.params,
        jax.tree.map(std_fmt, eng.params))

    def run():
        cache = fresh()
        i, a, prg = ids, act, pr0
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            cache, blk, i, prg, a = fn(
                params_pinned, cache, i, a, tmp, tk, sd, prg, eo, lim)
        np.asarray(blk)
        el = time.perf_counter() - t0
        return n_blocks * steps * S / el, el / n_blocks * 1e3

    print("# compiling ...", flush=True)
    run()
    for rnd in range(args.rounds):
        tps, ms = run()
        print(f"round {rnd}: std-layout dispatch {tps:.0f} tok/s "
              f"({ms:.1f} ms/blk)", flush=True)

    hlo = fn.lower(params_pinned, fresh(), ids, act, tmp, tk, sd, pr0,
                   eo, lim).compile().as_text()
    big = len(re.findall(r"= s8\[%d,1024,8,64\][^ ]* copy\(" % S, hlo))
    print(f"# whole-cache s8 copies in program: {big}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
