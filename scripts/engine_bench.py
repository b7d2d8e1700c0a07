#!/usr/bin/env python3
"""Continuous-batching engine throughput benchmark.

Drives the GenerationEngine directly (no gRPC): N concurrent requests
of fixed prompt/new-token lengths through S slots, reporting decode
tokens/s. Flags select quantization, steps_per_sync, overlapped
dispatch, and speculation, so engine-level changes can be A/B'd on the
same chip. The reference has no decoder analogue (SURVEY.md section
5.7); this is the measurement harness for the BASELINE.json
continuous-batching targets.

Example (the STATUS.md configuration):
  python scripts/engine_bench.py --family llama-1b --quant int8 \
      --slots 16 --requests 32 --new-tokens 128 --steps-per-sync 8
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="llama-1b")
    p.add_argument("--quant", default="int8",
                   choices=["none", "int8", "int4"])
    p.add_argument("--slots", type=int, default=16)
    p.add_argument("--requests", type=int, default=32)
    p.add_argument("--prompt-len", type=int, default=32)
    p.add_argument("--new-tokens", type=int, default=128)
    p.add_argument("--steps-per-sync", type=int, default=8)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--overlap", action="store_true", default=False)
    p.add_argument("--no-overlap", dest="overlap", action="store_false")
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="decode blocks kept in flight when --overlap")
    p.add_argument("--depth-sweep", default="",
                   help="comma list of pipeline depths to A/B with "
                        "overlap on, sharing compiled executables "
                        "(e.g. 2,3,4)")
    p.add_argument("--ab", action="store_true",
                   help="run overlap OFF then ON in one process (shared "
                        "compiled executables -> clean comparison)")
    p.add_argument("--raw", action="store_true",
                   help="also measure RAW decode-block throughput (the "
                        "jitted _decode chained device-side, no host "
                        "emit/snapshot work) — the ceiling the engine "
                        "loop is judged against (VERDICT round-1 item 1)")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU platform (smoke runs)")
    p.add_argument("--kv-page-size", type=int, default=0,
                   help="paged KV cache page size (0 = dense)")
    p.add_argument("--kv-pool-pages", type=int, default=0,
                   help="paged pool size incl. garbage page (0 = default "
                        "half-dense footprint)")
    p.add_argument("--draft-family", default="",
                   help="speculative decoding: draft model family "
                        "(e.g. llama-draft-150m); empty = off")
    p.add_argument("--speculate-k", type=int, default=4)
    p.add_argument("--fetch-timeout", type=float, default=600.0,
                   help="engine fetch watchdog seconds (compiles for new "
                        "shapes + tunnel wedge phases can exceed the "
                        "serving default)")
    p.add_argument("--draft-options",
                   default='{"layers": 4, "hidden": 512, "q_heads": 8, '
                           '"kv_heads": 4, "intermediate": 1376}',
                   help="JSON options for the draft spec (vocab is "
                        "forced to the target's)")
    p.add_argument("--vocab", type=int, default=0,
                   help="override vocab (0 = family default)")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree
    from starpu_inference_server_tpu.serving.generation import (
        GenerationEngine,
        GenerationRequest,
    )

    options = {}
    if args.vocab:
        options["vocab"] = args.vocab
    spec = get_spec(args.family, options)
    print(f"# building {args.family} ({args.quant}) ...", file=sys.stderr)
    params = init_params(spec, np.random.default_rng(0))
    bits = {"none": None, "int8": 8, "int4": 4}[args.quant]
    params = maybe_quantize_tree(params, bits)

    rng = np.random.default_rng(1)
    prompts = [
        rng.integers(1, spec.vocab, size=args.prompt_len).astype(np.int32)
        for _ in range(args.requests)
    ]

    def run_raw() -> dict:
        """Raw ceiling: chain decode blocks through the device-resident
        carry (cache, ids, progress) with every slot active and fetch one
        scalar at the end — no snapshot/emit/host work. This is what the
        engine loop's throughput is expressed as a fraction of."""
        engine = GenerationEngine(
            spec,
            params,
            dtype=jnp.bfloat16,
            num_slots=args.slots,
            max_len=args.max_len,
            prefill_buckets=[args.prompt_len],
            steps_per_sync=args.steps_per_sync,
        )
        cache = engine.cache
        s = args.slots
        ids = jnp.ones((s,), jnp.int32)
        active = jnp.ones((s,), bool)
        temps = jnp.zeros((s,), jnp.float32)
        top_k = jnp.zeros((s,), jnp.int32)
        seeds = jnp.zeros((s,), jnp.uint32)
        prog = jnp.ones((s,), jnp.int32)
        # occupy every slot at the benchmark's live length
        cache = cache._replace(
            lengths=jnp.full((s,), args.prompt_len, jnp.int32)
        )
        n_blocks = max(2, args.new_tokens // args.steps_per_sync)

        # Chain ALL blocks inside ONE jitted fori_loop: over the axon
        # tunnel each separate dispatch costs host RTT that a Python
        # block loop pays per block, under-measuring the device ceiling
        # (the overlapped engine once "beat" it). One dispatch + one
        # scalar fetch, long-minus-short chains to cancel the constant
        # (CLAUDE.md measurement note).
        eos = jnp.full((s,), -1, jnp.int32)
        limit = jnp.full((s,), 1 << 30, jnp.int32)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chained(params, cache, ids, prog, k):
            def body(_, carry):
                cache, ids, prog = carry
                cache, _, ids, prog, _ = engine._decode_and_sample(
                    params, cache, ids, active, temps, top_k, seeds, prog,
                    eos, limit,
                )
                return cache, ids, prog
            cache, ids, prog = jax.lax.fori_loop(
                0, k, body, (cache, ids, prog)
            )
            return ids[0]

        def run(k):
            t0 = time.perf_counter()
            np.asarray(chained(engine.params, cache, ids, prog, k))
            return time.perf_counter() - t0

        short = max(1, n_blocks // 8)
        run(short)           # compile short
        run(n_blocks)        # compile long
        t_short = min(run(short) for _ in range(2))
        dt = min(run(n_blocks) for _ in range(2)) - t_short
        total = (n_blocks - short) * args.steps_per_sync * s
        return {
            "metric": "raw_decode_tokens_per_sec",
            "family": args.family,
            "quant": args.quant,
            "slots": args.slots,
            "steps_per_sync": args.steps_per_sync,
            "value": round(total / dt, 1),
            "unit": "tokens/s",
            "wall_s": round(dt, 2),
        }

    draft_spec = None
    draft_params = None
    if args.draft_family == "same":
        # perfect draft (draft == target): the acceptance=1 upper bound
        # of the speculative machinery — real-weight acceptance (typ.
        # 0.6-0.8 for a tuned draft) lands between this and the
        # random-draft lower bound (acceptance ~ 1/vocab ~ 0)
        draft_spec, draft_params = spec, params
    elif args.draft_family:
        opts = dict(json.loads(args.draft_options), vocab=spec.vocab)
        draft_spec = get_spec(args.draft_family, opts)
        draft_params = maybe_quantize_tree(
            init_params(draft_spec, np.random.default_rng(7)), bits
        )

    def run_one(overlap: bool, depth: int = 0) -> dict:
        engine = GenerationEngine(
            spec,
            params,
            dtype=jnp.bfloat16,
            num_slots=args.slots,
            max_len=args.max_len,
            prefill_buckets=[args.prompt_len],
            steps_per_sync=args.steps_per_sync,
            decode_overlap=overlap,
            pipeline_depth=depth or args.pipeline_depth,
            kv_page_size=args.kv_page_size,
            kv_pool_pages=args.kv_pool_pages,
            draft_spec=draft_spec,
            draft_params=draft_params,
            speculate_k=args.speculate_k,
            fetch_timeout_s=args.fetch_timeout,
        )
        engine.start()
        # warmup: prime prefill + decode executables (remote compiles
        # are 30-60 s each over the axon tunnel; see CLAUDE.md). The
        # executables do not depend on the overlap flag, so an --ab
        # run compiles once and both passes reuse them.
        print(f"# warmup (overlap={overlap}, depth={depth or args.pipeline_depth}) ...",
              file=sys.stderr)
        engine.generate(prompts[0], max_new_tokens=2 * args.steps_per_sync,
                        timeout=600.0)
        # timers up to here are dominated by remote-compile waits —
        # zero them so the printed breakdown covers ONLY the measured
        # window (VERDICT r2 item 1: publish the real phase split)
        for k in engine.loop_timers:
            engine.loop_timers[k] = 0.0
        print("# measuring ...", file=sys.stderr)
        reqs = [
            GenerationRequest(prompt_ids=pr, max_new_tokens=args.new_tokens)
            for pr in prompts
        ]
        t0 = time.perf_counter()
        for r in reqs:
            engine.submit(r)
        outs = [r.result(timeout=1200.0) for r in reqs]
        dt = time.perf_counter() - t0
        engine.stop()
        timers = {k: round(v, 3) for k, v in engine.loop_timers.items()}
        shares = {k: f"{100 * v / dt:.0f}%" for k, v in timers.items()}
        print(f"# loop timers (s, measured window only): {timers}",
              file=sys.stderr)
        print(f"# loop shares of wall: {shares}", file=sys.stderr)
        total = sum(len(t) for t in outs)
        assert all(len(t) == args.new_tokens for t in outs)
        if args.draft_family:
            print(f"# draft acceptance rate: "
                  f"{engine.draft_acceptance_rate():.3f} "
                  f"(drafted {engine.drafted_tokens})", file=sys.stderr)
        return {
            "metric": "engine_decode_tokens_per_sec",
            "family": args.family,
            "quant": args.quant,
            "slots": args.slots,
            "requests": args.requests,
            "new_tokens": args.new_tokens,
            "steps_per_sync": args.steps_per_sync,
            "overlap": overlap,
            "kv_page_size": args.kv_page_size,
            **(
                {"speculate_k": args.speculate_k,
                 "draft": args.draft_family,
                 "acceptance": round(engine.draft_acceptance_rate(), 3)}
                if args.draft_family else {}
            ),
            "value": round(total / dt, 1),
            "unit": "tokens/s",
            "wall_s": round(dt, 2),
        }

    raw = run_raw() if args.raw else None
    if raw is not None:
        print(json.dumps(raw))
    if args.depth_sweep:
        for depth in [int(d) for d in args.depth_sweep.split(",")]:
            res = run_one(True, depth=depth)
            res["pipeline_depth"] = depth
            if raw is not None:
                res["vs_raw"] = round(res["value"] / raw["value"], 3)
            print(json.dumps(res))
        return 0
    if args.ab:
        off = run_one(False)
        on = run_one(True)
        on["vs_no_overlap"] = round(on["value"] / off["value"], 3)
        if raw is not None:
            off["vs_raw"] = round(off["value"] / raw["value"], 3)
            on["vs_raw"] = round(on["value"] / raw["value"], 3)
        print(json.dumps(off))
        print(json.dumps(on))
    else:
        res = run_one(args.overlap)
        if raw is not None:
            res["vs_raw"] = round(res["value"] / raw["value"], 3)
        print(json.dumps(res))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
