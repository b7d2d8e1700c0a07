#!/usr/bin/env python3
"""ResNet NCHW vs NHWC wire-layout A/B, interleaved in one process
(VERDICT r3 item 3).

The round-3 probe blamed the stem's wire-layout handling: from NCHW the
space-to-depth rearrange moves channels from major to minor — full data
movement over the 602 KB/image input — while from NHWC wire it is a
local 2x2 interleave. Same chained-fori measurement discipline as
bench.py; both layouts measured back-to-back per round so tunnel phases
cancel.

Usage:
  python scripts/resnet_layout_ab.py --batch 128 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def _build(layout: str, quant: str, family: str):
    import jax

    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.utils.config import (
        ModelSettings,
        QuantMode,
    )

    nn.set_w8a8(quant == "w8a8")
    model = build_model(
        ModelSettings(
            family=family,
            compute_dtype="BF16",
            quantization=QuantMode(quant),
            options={"input_layout": layout},
        ),
        seed=0,
    )
    return model, jax.device_put(model.params)


def _throughput(model, params, batch: int, layout: str) -> float:
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    shape = (batch, 3, 224, 224) if layout == "NCHW" \
        else (batch, 224, 224, 3)
    x = jax.device_put(rng.standard_normal(shape).astype(np.float32))
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

    times = {}
    for iters in (2, 12):
        fn = make(iters)
        float(fn(params, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(params, x))
            best = min(best, time.perf_counter() - t0)
        times[iters] = best
    return batch / ((times[12] - times[2]) / 10)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="resnet18")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--quant", default="w8a8",
                   choices=["none", "int8", "w8a8"])
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from starpu_inference_server_tpu.ops import nn

    builds = {}
    try:
        for layout in ("NCHW", "NHWC"):
            builds[layout] = _build(layout, args.quant, args.family)

        series = {"NCHW": [], "NHWC": []}
        for rnd in range(args.rounds):
            parts = []
            for layout in ("NCHW", "NHWC"):
                model, params = builds[layout]
                ips = _throughput(model, params, args.batch, layout)
                series[layout].append(ips)
                parts.append(f"{layout} {ips:.0f}")
            print(f"round {rnd}: " + " | ".join(parts) + " img/s",
                  flush=True)

        m_nchw = statistics.mean(series["NCHW"])
        m_nhwc = statistics.mean(series["NHWC"])
        print(json.dumps({
            "family": args.family,
            "quant": args.quant,
            "batch": args.batch,
            "nchw_img_s": round(m_nchw, 0),
            "nhwc_img_s": round(m_nhwc, 0),
            "speedup": round(m_nhwc / m_nchw, 4),
            "rounds": {k: [round(v) for v in vs]
                       for k, vs in series.items()},
        }))
    finally:
        nn.set_w8a8(False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
