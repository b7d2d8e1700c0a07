#!/usr/bin/env python3
"""BERT batch-scaling mechanism probe (VERDICT r3 weak 2).

Round-3 fact: bert-base w8a8 s=128 reads 6,479 seq/s at B=32 but
~3,048 at B=128 — per-seq cost GROWS 1.66x (attention) / 1.13x (FFN)
with batch on a static-shape workload, the opposite of how batching is
supposed to work. This probe pins the mechanism three ways:

1. full-model seq/s at B in {32, 64, 128} for bf16, int8-weight, w8a8
   (isolates whether the dynamic-activation-quant path is the culprit);
2. segment timings (attention core, FFN, projections) chained per
   batch size — per-seq numbers directly comparable;
3. compiled-HLO op census + cost_analysis per batch size (fusion
   count, transpose/copy/convert ops, bytes accessed per seq — a
   layout/materialization pathology shows up here).

All timing uses the chained-fori discipline (CLAUDE.md): the tunnel's
dispatch is deferred, so iterations chain inside one jitted loop with a
data dependency and one scalar fetch.

Usage:
  python scripts/bert_probe.py --batches 32 64 128 --modes w8a8
  python scripts/bert_probe.py --hlo-diff          # op census B=32 vs 128
"""

from __future__ import annotations

import argparse
import collections
import re
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])

SEQ = 128


def _chain_time(fn, *args, iters=(2, 12)) -> float:
    """Per-iteration seconds via long/short chain delta, best of 3."""
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


def build(mode: str, seq=SEQ):
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
            family="bert-base-uncased",
            compute_dtype="BF16",
            quantization=QuantMode(quant),
            options={"seq_len": seq},
        ),
        seed=0,
    )
    return model, jax.device_put(model.params)


def full_model_sps(model, params, batch: int) -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    ids = jax.device_put(
        rng.integers(0, 30000, (batch, SEQ)).astype(np.int32)
    )
    mask = jax.device_put(np.ones((batch, SEQ), np.int32))
    definition, dtype = model.definition, model.compute_dtype

    def make(iters):
        @jax.jit
        def chained(p, ids, mask):
            def body(_, carry):
                out = definition.apply(
                    p, {"input_ids": carry, "attention_mask": mask}, dtype
                )["last_hidden_state"]
                bump = (jnp.sum(out) * 1e-9).astype(jnp.int32)
                return carry + bump
            return jnp.sum(
                jax.lax.fori_loop(0, iters, body, ids)
            )
        return chained

    return batch / _chain_time(make, params, ids, mask)


def segment_times(model, params, batch: int) -> dict:
    """Per-seq microseconds for each transformer segment, x12 layers."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.ops import nn

    layer0 = jax.tree.map(lambda x: x, params["layers"][0])
    heads = 12
    rng = np.random.default_rng(0)
    x = jax.device_put(
        rng.standard_normal((batch, SEQ, 768)).astype(np.float32)
    ).astype(jnp.bfloat16)
    mask = jax.device_put(np.ones((batch, SEQ), np.int32))

    def seg_attention_core(iters):
        # q/k/v projections + SDPA + output projection (the full MHA)
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                out = nn.multi_head_attention(
                    p["attn"], carry, mask, heads, jnp.bfloat16
                )
                return carry + out * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        return chained

    def seg_sdpa_only(iters):
        # scores+softmax+PV with fixed q=k=v=x (no projections)
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                out = nn._attention(
                    carry, carry, carry, mask, heads, jnp.bfloat16
                )
                return carry + out * 1e-6
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x))
        return chained

    def seg_ffn(iters):
        @jax.jit
        def chained(p, x):
            def body(_, carry):
                h = nn.dense(p["ffn"]["fc1"], carry, jnp.bfloat16)
                h = nn.gelu(h)
                h = nn.dense(p["ffn"]["fc2"], h, jnp.bfloat16)
                return carry + h * 1e-6
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

    out = {}
    for name, seg in [("mha_full", seg_attention_core),
                      ("sdpa_only", seg_sdpa_only),
                      ("ffn", seg_ffn),
                      ("qkvo_proj", seg_qkvo_proj)]:
        per_iter = _chain_time(seg, layer0, x)
        out[name] = per_iter / batch * 1e6  # us per seq per layer
    return out


def hlo_census(model, params, batch: int) -> dict:
    """Compile the full forward and count op kinds + bytes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 30000, (batch, SEQ)).astype(np.int32))
    mask = jnp.ones((batch, SEQ), jnp.int32)
    definition, dtype = model.definition, model.compute_dtype

    @jax.jit
    def fwd(p, ids, mask):
        return definition.apply(
            p, {"input_ids": ids, "attention_mask": mask}, dtype
        )["last_hidden_state"]

    lowered = fwd.lower(params, ids, mask)
    compiled = lowered.compile()
    text = compiled.as_text()
    ops = collections.Counter(
        m.group(1)
        for m in re.finditer(r"^\s*(?:ROOT )?[%\w.-]+ = [\w\[\]{},_ ]* (\w+)\(",
                             text, re.M)
    )
    census = {
        "fusion": ops.get("fusion", 0),
        "transpose": ops.get("transpose", 0),
        "copy": ops.get("copy", 0),
        "convert": ops.get("convert", 0),
        "reshape": ops.get("reshape", 0),
        "custom-call": ops.get("custom-call", 0),
        "dot": ops.get("dot", 0),
    }
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        census["flops_per_seq"] = ca.get("flops", 0) / batch
        census["bytes_per_seq"] = ca.get("bytes accessed", 0) / batch
    except Exception as exc:  # noqa: BLE001
        census["cost_analysis_error"] = str(exc)
    # stash the HLO for manual diffing
    path = f"/tmp/bert_hlo_b{batch}.txt"
    with open(path, "w") as f:
        f.write(text)
    census["hlo_path"] = path
    return census


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--batches", type=int, nargs="+", default=[32, 64, 128])
    p.add_argument("--modes", nargs="+", default=["w8a8"],
                   choices=["bf16", "int8", "w8a8"])
    p.add_argument("--segments", action="store_true")
    p.add_argument("--hlo", action="store_true")
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from starpu_inference_server_tpu.ops import nn

    for mode in args.modes:
        model, params = build(mode)
        try:
            for b in args.batches:
                sps = full_model_sps(model, params, b)
                print(f"{mode} B={b}: {sps:.0f} seq/s "
                      f"({sps / b:.1f} batches/s, "
                      f"{1e3 * b / sps:.2f} ms/batch)", flush=True)
                if args.segments:
                    segs = segment_times(model, params, b)
                    print(f"  segments (us/seq/layer): " + ", ".join(
                        f"{k} {v:.1f}" for k, v in segs.items()),
                        flush=True)
                if args.hlo:
                    print(f"  hlo: {hlo_census(model, params, b)}",
                          flush=True)
        finally:
            nn.set_w8a8(False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
