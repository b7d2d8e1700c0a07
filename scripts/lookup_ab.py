#!/usr/bin/env python3
"""Prompt-lookup speculation A/B: plain decode vs n-gram-draft
speculation, interleaved in ONE process (VERDICT r3 item 4).

Workload: repetition-heavy generation — greedy decoding (deterministic,
and with both real and random weights prone to restating spans it has
already produced; doc-QA/extraction outputs restate prompt spans the
same way). The lookup drafter proposes the continuation of the most
recent matching n-gram from the sequence's own history; the target
verifies K drafts per forward, so every block commits 1..K+1 tokens.

Composes with paged KV (--paged) per the VERDICT bar. Reports tok/s
per round plus the measured draft-acceptance rate.

Usage:
  python scripts/lookup_ab.py --slots 64 --paged --new-tokens 256 \
      --speculate-k 8 --ngram 2 --rounds 3
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--family", default="llama-1b")
    p.add_argument("--quant", default="int8", choices=["none", "int8", "int4"])
    p.add_argument("--slots", type=int, default=64)
    p.add_argument("--paged", action="store_true")
    p.add_argument("--prompt-len", type=int, default=64)
    p.add_argument("--new-tokens", type=int, default=256)
    p.add_argument("--steps-per-sync", type=int, default=8)
    p.add_argument("--speculate-k", type=int, default=8)
    p.add_argument("--ngram", type=int, default=2)
    p.add_argument("--max-len", type=int, default=1024)
    p.add_argument("--pipeline-depth", type=int, default=4)
    p.add_argument("--rounds", type=int, default=3)
    p.add_argument("--repeat-period", type=int, default=16,
                   help="prompt = a repeating pattern of this period "
                        "(doc-QA-style repetition; 0 = random prompt)")
    p.add_argument("--copy-model", action="store_true",
                   help="make the decoder's greedy output follow "
                        "permutation cycles of --cycle-len (zeroed "
                        "residual projections + permuted-embedding lm "
                        "head): a synthetic generator of repetition-"
                        "heavy output at the FULL model's per-forward "
                        "compute cost — every matmul still executes. "
                        "Random weights cannot restate spans (no "
                        "pretrained checkpoints offline); this isolates "
                        "the workload property prompt-lookup exploits "
                        "while keeping the denominator honest.")
    p.add_argument("--cycle-len", type=int, default=32)
    p.add_argument("--cpu", action="store_true")
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

    spec = get_spec(args.family, {})
    raw = init_params(spec, np.random.default_rng(0))
    if args.copy_model:
        # zero the two residual-write projections -> every layer
        # contributes 0, so final hidden = rmsnorm(embed(cur)); the lm
        # head's column v is the embedding of perm^-1(v), so greedy
        # argmax emits perm(cur) -> output follows the permutation's
        # cycles (length --cycle-len). All matmuls keep full shape and
        # still execute: per-forward cost is the real model's.
        L = args.cycle_len
        v = spec.vocab - spec.vocab % L
        perm = np.arange(spec.vocab)
        blocks = perm[:v].reshape(-1, L)
        perm[:v] = np.roll(blocks, -1, axis=1).reshape(-1)
        inv = np.argsort(perm)
        for layer in raw["layers"]:
            layer["attn"]["o"]["w"][:] = 0
            layer["mlp"]["down"]["w"][:] = 0
        raw["lm_head"]["w"] = np.ascontiguousarray(
            raw["embed"]["w"][inv].T
        )
    bits = {"none": None, "int8": 8, "int4": 4}[args.quant]
    params = maybe_quantize_tree(raw, bits)
    S, T = args.slots, args.max_len
    page = 128
    paged_kw = {}
    if args.paged:
        paged_kw = {
            "kv_page_size": page,
            "kv_pool_pages": 1 + S * (T // page) // 2,
        }

    common = dict(
        dtype=jnp.bfloat16, num_slots=S, max_len=T,
        prefill_buckets=[args.prompt_len],
        steps_per_sync=args.steps_per_sync, decode_overlap=True,
        pipeline_depth=args.pipeline_depth, fetch_timeout_s=600,
        **paged_kw,
    )
    plain = GenerationEngine(spec, params, **common)
    lookup = GenerationEngine(
        spec, params, speculate_k=args.speculate_k,
        prompt_lookup_ngram=args.ngram, **common,
    )

    rng = np.random.default_rng(7)
    if args.repeat_period:
        pat = rng.integers(1, spec.vocab, (args.repeat_period,), np.int32)
        prompt = np.tile(pat, -(-args.prompt_len // args.repeat_period))[
            : args.prompt_len
        ].astype(np.int32)
    else:
        prompt = rng.integers(1, spec.vocab, (args.prompt_len,), np.int32)

    def drive(eng):
        reqs = [GenerationRequest(prompt_ids=prompt,
                                  max_new_tokens=args.new_tokens)
                for _ in range(S)]
        t0 = time.perf_counter()
        for r in reqs:
            eng.submit(r)
        tokens = [r.result(timeout=1200) for r in reqs]
        dt = time.perf_counter() - t0
        return S * args.new_tokens / dt, tokens

    print("# compiling + parity check ...", file=sys.stderr)
    plain.start()
    lookup.start()
    _, ref = drive(plain)
    _, got = drive(lookup)
    # Exact token parity holds in f32 (the integration suite asserts
    # it); under bf16 the batched verify forward computes near-tie
    # logits that can flip vs the one-row decode step — the SAME
    # documented effect that caps draft=target acceptance at 0.91
    # (STATUS r3). Report agreement; in f32 demand it be total.
    agree = [
        sum(1 for x, y in zip(a, b) if x == y) / max(1, len(a))
        for a, b in zip(ref, got)
    ]
    full = sum(1 for a, b in zip(ref, got) if a == b)
    print(f"# greedy agreement vs plain: {full}/{len(ref)} slots exact, "
          f"mean tokenwise {statistics.mean(agree):.3f} "
          "(bf16 near-tie flips between verify and decode_step are "
          "expected; f32 is exact)", file=sys.stderr)

    series = {"plain": [], "lookup": []}
    for rnd in range(args.rounds):
        a0, d0 = lookup.accepted_drafts, lookup.drafted_tokens
        tps_p, _ = drive(plain)
        tps_l, _ = drive(lookup)
        acc = (lookup.accepted_drafts - a0) / max(
            1, lookup.drafted_tokens - d0
        )
        series["plain"].append(tps_p)
        series["lookup"].append(tps_l)
        print(f"round {rnd}: plain {tps_p:.0f} | lookup {tps_l:.0f} tok/s "
              f"({tps_l / tps_p:.2f}x, acceptance {acc:.2f})", flush=True)

    mp = statistics.mean(series["plain"])
    ml = statistics.mean(series["lookup"])
    print(json.dumps({
        "plain_tok_s": round(mp, 0),
        "lookup_tok_s": round(ml, 0),
        "speedup": round(ml / mp, 3),
        "acceptance": round(
            lookup.accepted_drafts / max(1, lookup.drafted_tokens), 3
        ),
        "slots": S,
        "paged": bool(args.paged),
        "k": args.speculate_k,
        "ngram": args.ngram,
        "rounds": {k: [round(v) for v in vs] for k, vs in series.items()},
    }))
    plain.stop()
    lookup.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
