#!/usr/bin/env python3
"""Pin the decode block's cache layout with with_layout_constraint
(round 5, follow-up to layout_probe.py).

The per-block program converts the whole cache between {3,2,1,0}
(entry/exit) and an internal preference — ~4.6 GB of copies = the
entire 56 ms dispatch bubble at dense-128. AUTO entry layouts chose
the default and didn't remove the copies, so the conflict is internal:
some op in the while body prefers a T-minor layout and layout
assignment migrates the carry. This probe pins every cache leaf to the
row-major default INSIDE the program (entry and return), forcing the
preferring op to eat the non-preferred layout instead of the carry
round-tripping through HBM.

Usage: python scripts/layout_pin_probe.py [--slots 128]
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
    from jax.experimental.layout import (
        Format,
        Layout,
        with_layout_constraint,
    )

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

    def pin(tree):
        def one(a):
            lay = Layout(major_to_minor=tuple(range(a.ndim)))
            return with_layout_constraint(a, lay)
        return jax.tree.map(one, tree)

    def pinned_decode(params, cache, *rest):
        cache = cache._replace(
            k=pin(cache.k), v=pin(cache.v),
            k_scale=pin(cache.k_scale), v_scale=pin(cache.v_scale))
        out = eng._decode_and_sample(params, cache, *rest)
        ncache = out[0]
        ncache = ncache._replace(
            k=pin(ncache.k), v=pin(ncache.v),
            k_scale=pin(ncache.k_scale), v_scale=pin(ncache.v_scale))
        return (ncache,) + tuple(out[1:])

    fn = jax.jit(pinned_decode, donate_argnums=(1,))

    def fresh():
        return jax.device_put(init_cache(spec, S, T))._replace(
            lengths=jnp.full((S,), P, jnp.int32))

    ids = jnp.ones((S,), jnp.int32)
    act = jnp.ones((S,), bool)
    tmp = jnp.zeros((S,), jnp.float32)
    tk = jnp.zeros((S,), jnp.int32)
    sd = jnp.zeros((S,), jnp.uint32)
    pr0 = jnp.ones((S,), jnp.int32)
    eo = jnp.full((S,), -1, jnp.int32)
    lim = jnp.full((S,), 1 << 30, jnp.int32)

    def run():
        cache = fresh()
        i, a, prg = ids, act, pr0
        t0 = time.perf_counter()
        for _ in range(n_blocks):
            cache, blk, i, prg, a = fn(
                eng.params, cache, i, a, tmp, tk, sd, prg, eo, lim)
        np.asarray(blk)
        el = time.perf_counter() - t0
        return n_blocks * steps * S / el, el / n_blocks * 1e3

    print("# compiling ...", flush=True)
    run()
    for rnd in range(args.rounds):
        tps, ms = run()
        print(f"round {rnd}: pinned-layout dispatch {tps:.0f} tok/s "
              f"({ms:.1f} ms/blk)", flush=True)

    # copy census on the compiled program
    cache = fresh()
    hlo = fn.lower(eng.params, cache, ids, act, tmp, tk, sd, pr0, eo,
                   lim).compile().as_text()
    import re
    big = sum(1 for m in re.finditer(
        r"= s8\[%d,1024,8,64\][^ ]* copy\(" % S, hlo))
    print(f"# whole-cache s8 copies in program: {big}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
