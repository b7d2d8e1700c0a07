#!/usr/bin/env python3
"""Diagnose the flat-layout raw-decode regression at dense-128.

Two suspects for the ~2 ms/step the chained flat program pays over
standard (raw 12.4k vs 15.4k tok/s; knee_decomp --layout A/B):

1. the SCALE scatter: flat stores scales [S, Hkv, T] so the per-step
   write lands in the LANE dim (``.at[s, :, pos]``) — XLA may lower a
   minor-dim scatter far worse than the standard [S, T, Hkv] row write;
2. the flat kernel at SHORT lengths (the raw run grows lengths 32->288
   while the kernel probe measured 512-1023).

Chained micro for each, standard vs flat.
"""

from __future__ import annotations

import functools
import sys
import time

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def main() -> int:
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=128)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--iters", type=int, default=400)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.ops import decode_attention as da

    if args.cpu:
        da.set_interpret(True)

    s, t, hkv, rep, d = args.slots, args.max_len, 8, 4, 64
    rng = np.random.default_rng(0)
    L = 16  # layers' worth of scatters per chained iter

    def timed(label, fn, *inputs):
        chained = jax.jit(fn)
        t0 = time.perf_counter()
        jax.block_until_ready(chained(*inputs))
        c0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        out = chained(*inputs)
        # force a scalar fetch (block_until_ready does not fence axon)
        float(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
        per = (time.perf_counter() - t0) / args.iters
        print(f"{label}: {per * 1e6:8.1f} us/iter (compile {c0:.0f}s)",
              flush=True)
        return per

    # -- scatter micro: L layers x (k,v int8 row + k,v scale) per iter --
    pos0 = jnp.asarray(rng.integers(32, 256, (s,)), jnp.int32)
    slot_idx = jnp.arange(s)
    kq = jnp.asarray(rng.integers(-127, 128, (s, hkv, d)), jnp.int8)
    sc = jnp.asarray(rng.uniform(0.005, 0.02, (s, hkv)), jnp.float32)

    def scatter_std(k1, ks1, pos):
        def body(_, carry):
            k1, ks1, pos = carry
            for _l in range(L):
                k1 = k1.at[slot_idx, pos].set(kq)
                ks1 = ks1.at[slot_idx, pos].set(sc)
            return k1, ks1, pos + 1
        return jax.lax.fori_loop(
            0, args.iters, body, (k1, ks1, pos))[:2]

    def scatter_flat(k1, ks1, pos):
        kqf = kq.reshape(s, hkv * d)
        def body(_, carry):
            k1, ks1, pos = carry
            for _l in range(L):
                k1 = k1.at[slot_idx, pos].set(kqf)
                ks1 = ks1.at[slot_idx, :, pos].set(sc)
            return k1, ks1, pos + 1
        return jax.lax.fori_loop(
            0, args.iters, body, (k1, ks1, pos))[:2]

    k_std = jnp.zeros((s, t, hkv, d), jnp.int8)
    ks_std = jnp.zeros((s, t, hkv), jnp.float32)
    k_flat = jnp.zeros((s, t, hkv * d), jnp.int8)
    ks_flat = jnp.zeros((s, hkv, t), jnp.float32)
    a = timed(f"scatter std  ({L}x kv+scale)", scatter_std, k_std, ks_std,
              pos0)
    b = timed(f"scatter flat ({L}x kv+scale)", scatter_flat, k_flat,
              ks_flat, pos0)
    print(f"scatter flat/std: {b / a:.2f}x the cost", flush=True)

    # -- kernel at short lengths ---------------------------------------
    q = jnp.asarray(rng.standard_normal((s, hkv * rep, d)), jnp.bfloat16)
    kc = jnp.asarray(rng.integers(-127, 128, (s, t, hkv, d)), jnp.int8)
    vc = jnp.asarray(rng.integers(-127, 128, (s, t, hkv, d)), jnp.int8)
    ksc = jnp.asarray(rng.uniform(0.005, 0.02, (s, t, hkv)), jnp.float32)
    vsc = jnp.asarray(rng.uniform(0.005, 0.02, (s, t, hkv)), jnp.float32)
    kcf = kc.reshape(s, t, hkv * d)
    vcf = vc.reshape(s, t, hkv * d)
    kscf = jnp.swapaxes(ksc, 1, 2)
    vscf = jnp.swapaxes(vsc, 1, 2)

    for length in (64, 160, 288):
        lens = jnp.full((s,), length, jnp.int32)

        def attn_chain(q, *rest):
            def body(_, qq):
                out = da.decode_attention(qq, *rest, rep=rep)
                return qq + 0.0 * out
            return jax.lax.fori_loop(0, args.iters, body, q)

        a = timed(f"kernel std  len={length:4d}", attn_chain, q, kc, vc,
                  ksc, vsc, lens)
        b = timed(f"kernel flat len={length:4d}", attn_chain, q, kcf, vcf,
                  kscf, vscf, lens)
        print(f"  len={length}: flat/std {b / a:.2f}x the cost", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
