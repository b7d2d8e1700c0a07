#!/usr/bin/env python3
"""FLAT-layout decode-kernel sanity on real TPU: lowers? matches? fast?

Compares the flat grouped decode kernel ([S, T, Hkv*D] + [S, Hkv, T]
scales) against the standard grouped kernel at llama-1b decode shapes:
numeric agreement on-device plus chained per-call timing (one jitted
fori_loop with a carry dependency, one scalar fetch — CLAUDE.md
benchmark rules). Run before/alongside scripts/knee_decomp.py --layout.
"""

from __future__ import annotations

import argparse
import sys
import time

REPO = __file__.rsplit("/scripts/", 1)[0]
sys.path.insert(0, REPO)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--slots", type=int, default=128)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--hkv", type=int, default=8)
    p.add_argument("--rep", type=int, default=4)
    p.add_argument("--d", type=int, default=64)
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--window", type=int, default=0,
                   help="also probe the window kernel at this W")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import functools

    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.ops import decode_attention as da

    if args.cpu:
        da.set_interpret(True)

    s, t, hkv, rep, d = args.slots, args.max_len, args.hkv, args.rep, args.d
    hq = hkv * rep
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((s, hq, d)), jnp.bfloat16)
    k = jnp.asarray(rng.integers(-127, 128, (s, t, hkv, d)), jnp.int8)
    v = jnp.asarray(rng.integers(-127, 128, (s, t, hkv, d)), jnp.int8)
    ks = jnp.asarray(rng.uniform(0.005, 0.02, (s, t, hkv)), jnp.float32)
    vs = jnp.asarray(rng.uniform(0.005, 0.02, (s, t, hkv)), jnp.float32)
    lengths = jnp.asarray(
        rng.integers(t // 2, t - 1, (s,)), jnp.int32
    )
    kf = k.reshape(s, t, hkv * d)
    vf = v.reshape(s, t, hkv * d)
    ksf = jnp.swapaxes(ks, 1, 2)
    vsf = jnp.swapaxes(vs, 1, 2)

    def timed(label, fn, *inputs):
        # chain iters calls with a data dependency through q (scaled by
        # a tiny epsilon of the previous output so nothing hoists)
        @functools.partial(jax.jit, static_argnames=())
        def chained(q, *rest):
            def body(_, qq):
                out = fn(qq, *rest)
                return qq + 0.0 * out
            return jax.lax.fori_loop(0, args.iters, body, q)[0, 0, 0]

        t0 = time.perf_counter()
        float(chained(q, *inputs))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chained(q, *inputs))
        per_call = (time.perf_counter() - t0) / args.iters
        kv_gb = 2 * s * t * hkv * d / 1e9
        print(f"{label}: {per_call * 1e6:8.1f} us/call  "
              f"(~{kv_gb / per_call:6.1f} GB/s full-cache-read bound; "
              f"compile {compile_s:.0f}s)", flush=True)
        return per_call

    out_std = np.asarray(
        da.decode_attention(q, k, v, ks, vs, lengths, rep=rep),
        np.float32,
    )
    out_flat = np.asarray(
        da.decode_attention(q, kf, vf, ksf, vsf, lengths, rep=rep),
        np.float32,
    )
    err = np.max(np.abs(out_std - out_flat)) / (
        np.max(np.abs(out_std)) + 1e-9
    )
    print(f"decode parity (std vs flat): max rel err {err:.2e}", flush=True)
    assert err < 3e-2, err

    t_std = timed(
        "decode std ", lambda qq, *r: da.decode_attention(qq, *r, rep=rep),
        k, v, ks, vs, lengths,
    )
    t_flat = timed(
        "decode flat", lambda qq, *r: da.decode_attention(qq, *r, rep=rep),
        kf, vf, ksf, vsf, lengths,
    )
    print(f"flat/std kernel ratio: {t_std / t_flat:.2f}x", flush=True)

    if args.window:
        w = args.window
        qw = jnp.asarray(
            rng.standard_normal((s, w, hq, d)), jnp.bfloat16
        )
        got_std = np.asarray(da.window_decode_attention(
            qw, k, v, ks, vs, lengths, rep=rep, out_dtype=jnp.float32))
        got_flat = np.asarray(da.window_decode_attention(
            qw, kf, vf, ksf, vsf, lengths, rep=rep, out_dtype=jnp.float32))
        werr = np.max(np.abs(got_std - got_flat)) / (
            np.max(np.abs(got_std)) + 1e-9
        )
        print(f"window parity: max rel err {werr:.2e}", flush=True)
        assert werr < 3e-2, werr
    return 0


if __name__ == "__main__":
    sys.exit(main())
