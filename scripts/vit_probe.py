#!/usr/bin/env python3
"""ViT-L batch-scaling + MFU mechanism probe (VERDICT r4 item 2).

Round-4 facts: vit_l_16 w8a8 reads 1,437/1,302/1,007 img/s at
b32/64/128 — the same inverse batch scaling BERT had before its r4 fix,
EXCEPT ViT already inherits that fix (weight-only attention projections
+ batch-chunked scores in ops/nn). And the headline MFU gap vs
bert-large (same 24x1024x4096 shape class) needs per-segment
attribution, not inference.

FLOP accounting (fixing the r4 arithmetic, which counted MACs):
ViT-L/16 at 224px = 196 patches + cls = 197 tokens; matmul params
~303M (24 x (4x1024^2 + 2x1024x4096)) + patch conv ~0.8M; FLOPs/img =
2 x 303e6 x 197 + 2 x 197 x 768 x 1024 ~ 119.7e9. At 1,441 img/s that
is ~172 TFLOP/s = ~44% of the 394 int8 peak (not 23%).

Probes:
1. full-model img/s at b in {32, 64, 128} x {bf16, int8, w8a8};
2. per-segment chained timings (patch embed, MHA, SDPA-only, QKVO
   projections, FFN) at each batch — us/img/layer directly comparable;
3. TOKEN-PADDING TAX: the encoder stack at synthetic seq in
   {128, 192, 197, 256} — seq=197 pads every attention score tile to
   256 lanes; this measures what that actually costs end-to-end.

All timing uses the chained-fori discipline (CLAUDE.md).

Usage:
  python scripts/vit_probe.py --batches 32 64 128 --modes w8a8
  python scripts/vit_probe.py --segments --batches 32 128
  python scripts/vit_probe.py --seq-tax
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def _chain_time(fn, *args, iters=(2, 12)) -> float:
    import jax

    times = {}
    for k in iters:
        f = fn(k)
        jax.block_until_ready(f(*args))
        float(f(*args))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(*args))
            best = min(best, time.perf_counter() - t0)
        times[k] = best
    return (times[iters[1]] - times[iters[0]]) / (iters[1] - iters[0])


def build(mode: str):
    import jax

    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.utils.config import (
        ModelSettings,
        QuantMode,
    )

    nn.set_w8a8(mode == "w8a8")
    quant = {"bf16": "none", "int8": "int8", "w8a8": "w8a8"}[mode]
    model = build_model(
        ModelSettings(
            family="vit_l_16",
            compute_dtype="BF16",
            quantization=QuantMode(quant),
        ),
        seed=0,
    )
    return model, jax.device_put(model.params)


def full_model_ips(model, params, batch: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    x = jax.device_put(
        np.random.default_rng(0)
        .standard_normal((batch, 3, 224, 224))
        .astype(np.float32)
    )
    definition, dtype = model.definition, model.compute_dtype

    def make(iters):
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                out = definition.apply(p, {"input": carry}, dtype)["output"]
                bump = (jnp.tanh(jnp.sum(out)) * 1e-6).astype(carry.dtype)
                return carry + bump
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        return chained

    return batch / _chain_time(make, params, x)


def segment_times(model, params, batch: int) -> dict:
    """us per image per layer for each encoder segment + the one-off
    patch embed."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.ops import nn

    blk = params["blocks"][0]
    heads, dim, seq = 16, 1024, 197
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((batch, seq, dim)).astype(np.float32)
    ).astype(jnp.bfloat16)
    img = jax.device_put(
        rng.standard_normal((batch, 3, 224, 224)).astype(np.float32)
    )

    def seg_patch_embed(iters):
        @jax.jit
        def chained(p, img):
            def body(_, carry):
                h = jnp.transpose(carry, (0, 2, 3, 1)).astype(jnp.bfloat16)
                h = nn.conv2d(p["patch_embed"], h, stride=16,
                              padding="VALID", dtype=jnp.bfloat16)
                bump = (jnp.sum(h) * 1e-9).astype(carry.dtype)
                return carry + bump
            return jnp.sum(jax.lax.fori_loop(0, iters, body, img))
        return chained

    def seg_mha_full(iters):
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                out = nn.multi_head_attention(
                    p["attn"], carry, None, heads, jnp.bfloat16
                )
                return carry + out * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        return chained

    def seg_sdpa_only(iters):
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                out = nn._attention(
                    carry, carry, carry, None, heads, jnp.bfloat16
                )
                return carry + out * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        return chained

    def seg_qkvo_proj(iters):
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                q = nn.dense(p["attn"]["q"], carry, jnp.bfloat16)
                k = nn.dense(p["attn"]["k"], carry, jnp.bfloat16)
                v = nn.dense(p["attn"]["v"], carry, jnp.bfloat16)
                o = nn.dense(p["attn"]["o"], q + k + v, jnp.bfloat16)
                return carry + o * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        return chained

    def seg_ffn(iters):
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                h = nn.dense(p["mlp"]["fc1"], carry, jnp.bfloat16)
                h = nn.gelu(h)
                h = nn.dense(p["mlp"]["fc2"], h, jnp.bfloat16)
                return carry + h * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        return chained

    out = {}
    out["patch_embed"] = (
        _chain_time(seg_patch_embed, params, img) / batch * 1e6
    )
    for name, seg in [("mha_full", seg_mha_full),
                      ("sdpa_only", seg_sdpa_only),
                      ("qkvo_proj", seg_qkvo_proj),
                      ("ffn", seg_ffn)]:
        out[name] = _chain_time(seg, blk, x) / batch * 1e6
    return out


def seq_tax(model, params, batch: int = 32) -> dict:
    """Encoder-block cost per TOKEN at different sequence lengths: the
    197-vs-256 lane-padding tax in one number per seq."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.ops import nn

    blk = params["blocks"][0]
    heads, dim = 16, 1024
    out = {}
    for seq in (128, 192, 197, 256):
        x = jax.device_put(
            np.random.default_rng(0)
            .standard_normal((batch, seq, dim))
            .astype(np.float32)
        ).astype(jnp.bfloat16)

        def seg_block(iters, _x=x):
            @jax.jit
            def chained(p, x):
                def body(_, carry):
                    h = nn.layer_norm(p["ln1"], carry)
                    h = nn.multi_head_attention(
                        p["attn"], h, None, heads, jnp.bfloat16
                    )
                    y = carry + h
                    h = nn.layer_norm(p["ln2"], y)
                    h = nn.dense(p["mlp"]["fc1"], h, jnp.bfloat16)
                    h = nn.gelu(h)
                    h = nn.dense(p["mlp"]["fc2"], h, jnp.bfloat16)
                    return y + h * 1e-6
                return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
            return chained

        per_iter = _chain_time(seg_block, blk, x)
        out[seq] = per_iter / (batch * seq) * 1e9  # ns per token per layer
    return out


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[32, 64, 128])
    p.add_argument("--modes", nargs="+", default=["w8a8"],
                   choices=["bf16", "int8", "w8a8"])
    p.add_argument("--segments", action="store_true")
    p.add_argument("--seq-tax", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from starpu_inference_server_tpu.ops import nn

    flop_per_img = 119.7e9  # see module docstring
    try:
        for mode in args.modes:
            model, params = build(mode)
            for b in args.batches:
                ips = full_model_ips(model, params, b)
                tops = ips * flop_per_img / 1e12
                print(f"{mode} b{b}: {ips:.1f} img/s  (~{tops:.0f} TFLOP/s, "
                      f"{100 * tops / 394:.0f}% of int8 peak)", flush=True)
                if args.segments:
                    segs = segment_times(model, params, b)
                    per_layer = sum(v for k, v in segs.items()
                                    if k != "patch_embed")
                    print(f"    segments us/img/layer: " + " ".join(
                        f"{k}={v:.1f}" for k, v in segs.items()
                    ) + f"  (sum x24 = {per_layer * 24 / 1e3:.2f} ms/img "
                        f"model-est)", flush=True)
            if args.seq_tax:
                tax = seq_tax(model, params)
                print(f"{mode} seq-tax ns/token/layer: " + " ".join(
                    f"s{k}={v:.0f}" for k, v in tax.items()), flush=True)
    finally:
        nn.set_w8a8(False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
