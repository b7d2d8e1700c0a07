#!/usr/bin/env python3
"""Mesh-scaling benchmark: throughput at mesh sizes 1 / 2 / 4 / ...

BASELINE.json asks for scaling efficiency at 1 chip / 1 host (v5e-8) /
2 hosts (v5e-16) with >= 90% linear 1->2 host scaling. This harness
measures sharded-forward throughput across mesh sizes on whatever
devices exist:

- on a pod slice it reports real chips and ICI/DCN scaling;
- with --virtual N it forces N virtual CPU devices, demonstrating the
  TP/DP machinery end-to-end anywhere (numbers are then illustrative).

Output: one JSON object with per-mesh throughput and efficiency vs
linear.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--family", default="bert-base-uncased")
    parser.add_argument("--batch-per-device", type=int, default=8)
    parser.add_argument("--seq-len", type=int, default=128)
    parser.add_argument("--vocab", type=int, default=30522)
    parser.add_argument("--quant", default="int8",
                        choices=["none", "int8", "int4"])
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--virtual", type=int, default=0,
                        help="force N virtual CPU devices")
    parser.add_argument("--tp", type=int, default=0,
                        help="model-axis size (0 = auto: min(devices, 8))")
    parser.add_argument("--decode", action="store_true",
                        help="census the continuous-batching DECODE "
                             "program (llama-class) instead of the "
                             "encoder forward: per-mesh compiled flops/"
                             "device + collective mix for the engine's "
                             "steps_per_sync block (VERDICT r3 item 7)")
    args = parser.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if args.decode:
        return _decode_census(args, jax, jnp, np)
    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.parallel import (
        MeshAxes,
        make_device_mesh,
        partition_rules_for,
        sharded_forward,
    )
    from starpu_inference_server_tpu.utils.config import ModelSettings, QuantMode

    n_devices = len(jax.devices())
    model = build_model(
        ModelSettings(
            family=args.family,
            compute_dtype="BF16" if not args.virtual else "FP32",
            quantization=QuantMode(args.quant),
            options={"seq_len": args.seq_len, "vocab_size": args.vocab},
        ),
        seed=0,
    )
    rules = partition_rules_for(args.family)
    rng = np.random.default_rng(0)

    results = {}
    size = 1
    sizes = []
    while size <= n_devices:
        sizes.append(size)
        size *= 2

    from starpu_inference_server_tpu.parallel.partition import (
        batch_sharding,
        shard_params,
    )

    COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                   "reduce-scatter", "all-to-all")

    for n in sizes:
        # auto: modest TP (2-way) and grow the data axis with devices, so
        # throughput scaling reflects batch scaling like multi-host serving
        tp = args.tp or min(n, 2)
        while n % tp or (768 % tp):
            tp //= 2
        dp = n // tp
        mesh = make_device_mesh(MeshAxes(data=dp, model=tp))
        _, run = sharded_forward(model, mesh, rules)
        batch = args.batch_per_device * dp
        ids = rng.integers(0, args.vocab, (batch, args.seq_len)).astype(np.int64)
        mask = np.ones_like(ids)
        inputs = {"input_ids": ids, "attention_mask": mask}
        out = run(inputs)
        next(iter(out.values())).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = run(inputs)
        float(jnp.sum(next(iter(out.values()))))  # fetch = sync
        elapsed = time.perf_counter() - t0
        seq_s = batch * args.iters / elapsed

        # COMPILED-PROGRAM EVIDENCE (VERDICT r2 item 8): wall-clock on a
        # virtual mesh measures host contention, not sharding quality —
        # N virtual devices share the same cores. The per-device
        # compiled cost and the collective-op census DO carry signal:
        # flops/device must fall ~1/dp as the data axis grows, and the
        # collective mix must match the TP/DP layout, or the sharding
        # is wrong regardless of what wall-clock says.
        sharded = shard_params(model.params, mesh, rules)
        placed = {
            k: jax.device_put(jnp.asarray(v), batch_sharding(mesh))
            for k, v in inputs.items()
        }
        fwd = jax.jit(
            lambda p, x: model.definition.apply(p, x, model.compute_dtype)
        )
        compiled = fwd.lower(sharded, placed).compile()
        hlo = compiled.as_text()
        colls = {name: hlo.count(f" {name}") + hlo.count(f"{name}(")
                 for name in COLLECTIVES}
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) if ca else 0.0
        results[n] = {
            "mesh": {"data": dp, "model": tp},
            "sequences_per_s": round(seq_s, 2),
            "wall_ms_per_batch": round(1e3 * elapsed / args.iters, 2),
            # XLA reports cost for the per-device partitioned program
            "flops_per_device": flops,
            "collectives": {k: v for k, v in colls.items() if v},
        }

    base = results[sizes[0]]["sequences_per_s"]
    for n in sizes:
        results[n]["efficiency_vs_linear"] = round(
            results[n]["sequences_per_s"] / (base * n), 4
        )
    print(json.dumps({
        "family": args.family,
        "quant": args.quant,
        "devices": n_devices,
        "platform": jax.devices()[0].platform,
        "scaling": results,
    }, indent=2))
    return 0


def _decode_census(args, jax, jnp, np) -> int:
    """Per-mesh compiled evidence for the DECODE program: the engine's
    ``steps_per_sync`` block lowered over each mesh size, reporting
    flops/device (must fall ~1/tp and stay flat under weak-scaling dp)
    and the collective census (must match the TP/DP layout). Wall-clock
    on a virtual mesh is contention, not scaling — the compiled program
    is the signal (VERDICT r2 item 8 / r3 item 7)."""
    import time as _time

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree
    from starpu_inference_server_tpu.parallel import MeshAxes, make_device_mesh
    from starpu_inference_server_tpu.serving.generation import GenerationEngine

    family = args.family if args.family.startswith(("llama", "moe")) \
        else "llama-tiny"
    spec = get_spec(family, {})
    bits = {"none": None, "int8": 8, "int4": 4}[args.quant]
    params0 = maybe_quantize_tree(
        init_params(spec, np.random.default_rng(0)), bits
    )

    n_devices = len(jax.devices())
    sizes = []
    size = 1
    while size <= n_devices:
        sizes.append(size)
        size *= 2

    COLLECTIVES = ("all-reduce", "all-gather", "collective-permute",
                   "reduce-scatter", "all-to-all")
    steps = 4
    results = {}
    for n in sizes:
        tp = args.tp or min(n, 2)
        while n % tp or (spec.q_heads % tp):
            tp //= 2
        dp = n // tp
        mesh = make_device_mesh(MeshAxes(data=dp, model=tp)) if n > 1 else None
        slots = 8 * dp  # weak scaling: 8 slots per data shard
        eng = GenerationEngine(
            spec, params0, dtype=jnp.float32 if args.virtual else jnp.bfloat16,
            num_slots=slots, max_len=256, prefill_buckets=[32],
            steps_per_sync=steps, mesh=mesh, family=family,
        )
        sh = getattr(eng, "_slot_sharding", None)

        def vec(v):
            arr = jnp.asarray(v)
            return jax.device_put(arr, sh) if sh is not None else arr

        cache = eng.cache._replace(
            lengths=vec(np.full((slots,), 32, np.int32))
        )
        ids = vec(np.ones((slots,), np.int32))
        active = vec(np.ones((slots,), bool))
        temps = vec(np.zeros((slots,), np.float32))
        top_k = vec(np.zeros((slots,), np.int32))
        seeds = vec(np.zeros((slots,), np.uint32))
        prog = vec(np.ones((slots,), np.int32))
        eos = vec(np.full((slots,), -1, np.int32))
        limit = vec(np.full((slots,), 1 << 30, np.int32))

        lowered = eng._decode.lower(
            eng.params, cache, ids, active, temps, top_k, seeds, prog,
            eos, limit,
        )
        compiled = lowered.compile()
        hlo = compiled.as_text()
        colls = {name: hlo.count(f" {name}") + hlo.count(f"{name}(")
                 for name in COLLECTIVES}
        # per-AXIS labeling (VERDICT r4 item 6): on the v5e-16 target
        # 'data' spans DCN and 'model' spans ICI — this shows which
        # ops would cross the host boundary
        by_axis = {}
        if mesh is not None:
            from starpu_inference_server_tpu.parallel.census import (
                collectives_by_axis,
            )

            by_axis = collectives_by_axis(hlo, mesh)
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        flops = float(ca.get("flops", 0.0)) if ca else 0.0

        # illustrative wall clock (real signal only on real chips)
        out = eng._decode(eng.params, cache, ids, active, temps, top_k,
                          seeds, prog, eos, limit)
        jax.block_until_ready(out[1])
        t0 = _time.perf_counter()
        cache2, tokens = out[0], out[1]
        for _ in range(args.iters):
            cache2, tokens, nxt, prog2, alive = eng._decode(
                eng.params, cache2, ids, active, temps, top_k, seeds,
                prog, eos, limit,
            )
        np.asarray(tokens)
        elapsed = _time.perf_counter() - t0
        results[n] = {
            "mesh": {"data": dp, "model": tp},
            "slots": slots,
            "tok_s": round(slots * steps * args.iters / elapsed, 1),
            "flops_per_device_per_block": flops,
            "collectives": {k: v for k, v in colls.items() if v},
            "collectives_by_axis": by_axis,
        }

    print(json.dumps({
        "family": family,
        "quant": args.quant,
        "mode": "decode",
        "devices": n_devices,
        "platform": jax.devices()[0].platform,
        "steps_per_block": steps,
        "scaling": results,
    }, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
