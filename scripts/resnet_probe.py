#!/usr/bin/env python3
"""ResNet headline probe (VERDICT r2 item 7): stage-wise roofline
breakdown of the W8A8 ResNet-18 forward on one chip.

Measures, with the chained-fori-loop discipline (CLAUDE.md):
- full-model img/s at several batch sizes;
- stem-only (conv1+bn+relu+maxpool) img/s — the 3-channel 7x7 conv is
  the classic MXU-hostile layer;
- body-only (residual stages from the stem output) img/s;
- per-batch XLA cost analysis (flops) for roofline math.

The difference full vs stem/body isolates where the non-MXU time goes.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def measure_chain(fn, params, x, iters_long=22, iters_short=2):
    import jax
    import jax.numpy as jnp

    def make(iters):
        @jax.jit
        def chained(p, x0):
            def body(_, carry):
                out = fn(p, carry)
                bump = (jnp.tanh(jnp.sum(out)) * 1e-6).astype(carry.dtype)
                return carry + bump
            return jnp.sum(jax.lax.fori_loop(0, iters, body, x0))
        return chained

    times = {}
    for iters in (iters_short, iters_long):
        c = make(iters)
        float(c(params, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(c(params, x))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return (times[iters_long] - times[iters_short]) / (iters_long - iters_short)


def resource_table(batch: int = 128) -> int:
    """Per-segment, per-RESOURCE saturation table at the headline batch
    (VERDICT r4 item 3's either/or): for each pipeline segment, measured
    ms + analytic MACs and HBM bytes -> achieved int8-TOP/s and GB/s as
    percentages of the v5e peaks (394 int8 TOP/s, 819 GB/s). The
    binding resource per segment is whichever percentage is higher; a
    segment near 100% on either axis is saturated, one far from both is
    overhead-bound (fusion/layout), and the table as a whole decides
    whether a >50k img/s headline is physically available."""
    import jax
    import jax.numpy as jnp

    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.models.resnet import (
        _apply_basic_block,
        _stem_space_to_depth,
    )
    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.utils.config import (
        ModelSettings,
        QuantMode,
    )

    nn.set_w8a8(True)
    model = build_model(
        ModelSettings(family="resnet18", compute_dtype="BF16",
                      quantization=QuantMode("w8a8")),
        seed=0,
    )
    params = jax.device_put(model.params)
    dtype = model.compute_dtype
    b = batch

    x_wire = jax.device_put(
        np.random.default_rng(0)
        .standard_normal((b, 3, 224, 224)).astype(np.float32)
    )
    conv_out = jax.device_put(np.random.default_rng(1).standard_normal(
        (b, 112, 112, 64)).astype(np.float32)).astype(dtype)
    pool_out = jax.device_put(np.random.default_rng(2).standard_normal(
        (b, 56, 56, 64)).astype(np.float32)).astype(dtype)

    # analytic MACs (x2 = FLOPs) and minimal HBM bytes per segment
    MB = 1e6
    segs = {}

    def add(name, fn, args, macs, bytes_):
        per = measure_chain(fn, params, *args) if len(args) > 1 else \
            measure_chain(fn, params, args[0])
        ms = per * 1e3
        tops = 2 * macs / per / 1e12
        gbs = bytes_ / per / 1e9
        segs[name] = {
            "ms": round(ms, 3),
            "TOPs": round(tops, 1), "mxu_pct": round(100 * tops / 394, 1),
            "GBs": round(gbs, 1), "hbm_pct": round(100 * gbs / 819, 1),
        }

    # 1. stem conv (wire rearrange + s2d 4x4 conv): out [B,112,112,64]
    add("stem_conv",
        lambda p, v: _stem_space_to_depth(
            p["conv1"], v.astype(dtype), dtype, "NCHW"
        ).astype(jnp.float32).sum(axis=(1, 2, 3)),
        (x_wire,),
        macs=b * 112 * 112 * 64 * 49 * 3,
        bytes_=b * (3 * 224 * 224 * 4 + 112 * 112 * 64 * 2))

    # 2. bn + relu on [B,112,112,64] (pure VPU elementwise)
    add("bn_relu",
        lambda p, v: jnp.maximum(
            nn.batch_norm_inference(p["bn1"], v), 0
        ).astype(jnp.float32).sum(axis=(1, 2, 3)),
        (conv_out,),
        macs=0,
        bytes_=b * 112 * 112 * 64 * 2 * 2)

    # 3. maxpool 3x3/2 [B,112,112,64] -> [B,56,56,64]
    add("maxpool",
        lambda p, v: nn.max_pool(
            v, window=3, stride=2, padding=[(1, 1), (1, 1)]
        ).astype(jnp.float32).sum(axis=(1, 2, 3)),
        (conv_out,),
        macs=0,
        bytes_=b * (112 * 112 + 56 * 56) * 64 * 2)

    # 4..7. residual stages (weights int8; activation traffic in+out)
    res = {1: 56, 2: 28, 3: 14, 4: 7}
    chan = {1: 64, 2: 128, 3: 256, 4: 512}
    xs = pool_out
    for stage in (1, 2, 3, 4):
        depth = 2
        r, c = res[stage], chan[stage]
        rin = res[stage - 1] if stage > 1 else 56
        cin = chan[stage - 1] if stage > 1 else 64

        def stage_fn(p, v, _s=stage, _d=depth):
            h = v
            for i in range(_d):
                stride = 2 if (_s > 1 and i == 0) else 1
                h = _apply_basic_block(p[f"layer{_s}"][i], h, stride, dtype)
            return h.astype(jnp.float32).sum(axis=(1, 2, 3))

        macs = b * r * r * c * c * 9 * (2 * depth - 1) \
            + b * r * r * c * cin * 9
        if stage > 1:  # 1x1 downsample shortcut
            macs += b * r * r * c * cin
        bytes_ = b * (rin * rin * cin + 2 * r * r * c) * 2 \
            + (2 * depth * 9 * c * c)  # weights once
        add(f"layer{stage}", stage_fn,
            (jax.device_put(np.random.default_rng(3).standard_normal(
                (b, rin, rin, cin)).astype(np.float32)).astype(dtype),),
            macs=macs, bytes_=bytes_)

    # full model for the residual
    x = x_wire
    per_full = measure_chain(
        lambda p, v: model.definition.apply(p, {"input": v}, dtype)[
            "output"].astype(jnp.float32),
        params, x,
    )
    total_seg = sum(v["ms"] for v in segs.values())
    out = {
        "batch": b,
        "full_ms": round(per_full * 1e3, 3),
        "full_img_s": round(b / per_full, 0),
        "segments_sum_ms": round(total_seg, 3),
        "unattributed_ms": round(per_full * 1e3 - total_seg, 3),
        "segments": segs,
    }
    print(json.dumps(out, indent=2))
    return 0


def main() -> int:
    import sys as _sys

    if "--table" in _sys.argv:
        return resource_table()
    import jax

    import jax.numpy as jnp

    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.utils.config import (
        ModelSettings,
        QuantMode,
    )

    nn.set_w8a8(True)
    model = build_model(
        ModelSettings(family="resnet18", compute_dtype="BF16",
                      quantization=QuantMode("w8a8")),
        seed=0,
    )
    params = jax.device_put(model.params)
    dtype = model.compute_dtype
    report = {}

    for batch in (128, 256, 512):
        x = jax.device_put(
            np.random.default_rng(0)
            .standard_normal((batch, 3, 224, 224))
            .astype(np.float32)
        )
        per = measure_chain(
            lambda p, v: model.definition.apply(p, {"input": v}, dtype)[
                "output"
            ].astype(jnp.float32),
            params, x,
        )
        report[f"full_b{batch}_img_s"] = round(batch / per, 1)
        report[f"full_b{batch}_ms"] = round(per * 1e3, 3)

    # stem only: NCHW in -> NHWC stem out, bump chained through input
    def stem(p, v):
        h = jnp.transpose(v, (0, 2, 3, 1)).astype(dtype)
        h = nn.conv2d(p["conv1"], h, stride=2, padding=3, dtype=dtype)
        h = nn.batch_norm_inference(p["bn1"], h)
        h = jnp.maximum(h, 0)
        return nn.max_pool(h, window=3, stride=2, padding=[(1, 1), (1, 1)])

    batch = 256
    x = jax.device_put(
        np.random.default_rng(0)
        .standard_normal((batch, 3, 224, 224))
        .astype(np.float32)
    )
    per_stem = measure_chain(
        lambda p, v: stem(p, v).astype(jnp.float32).sum(axis=(1, 2, 3)),
        params, x,
    )
    report["stem_b256_ms"] = round(per_stem * 1e3, 3)

    # body from stem output [B, 56, 56, 64]
    stem_out = np.random.default_rng(1).standard_normal(
        (batch, 56, 56, 64)
    ).astype(np.float32)
    xb = jax.device_put(stem_out)

    from starpu_inference_server_tpu.models.resnet import (
        _apply_basic_block,
    )

    def body_fn(p, v):
        h = v.astype(dtype)
        for stage, depth in enumerate((2, 2, 2, 2), start=1):
            for i in range(depth):
                stride = 2 if (stage > 1 and i == 0) else 1
                h = _apply_basic_block(p[f"layer{stage}"][i], h, stride, dtype)
        h = nn.global_avg_pool(h)
        return nn.dense(p["fc"], h, dtype).astype(jnp.float32)

    per_body = measure_chain(
        lambda p, v: body_fn(p, v), params, xb,
    )
    report["body_b256_ms"] = round(per_body * 1e3, 3)
    report["stem_share"] = round(
        per_stem / (per_stem + per_body), 3
    )

    # roofline: XLA's own flop count for the full program
    x = jax.device_put(
        np.random.default_rng(0)
        .standard_normal((256, 3, 224, 224))
        .astype(np.float32)
    )
    fwd = jax.jit(
        lambda p, v: model.definition.apply(p, {"input": v}, dtype)["output"]
    )
    ca = fwd.lower(params, x).compile().cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else {}
    flops = float(ca.get("flops", 0.0))
    report["xla_flops_b256"] = flops
    full_ms = report["full_b256_ms"]
    report["achieved_tops"] = round(flops / (full_ms * 1e-3) / 1e12, 1)
    print(json.dumps(report, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
