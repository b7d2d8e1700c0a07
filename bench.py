"""Benchmark: the two BASELINE.json north-star headline metrics on one
TPU chip — ResNet-18 INT8 images/sec (last line, the headline) and
BERT-base W8A8 sequences/sec at s=128.

Prints one JSON line per metric:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is the ratio to the ABSOLUTE number recorded last round on
this same chip (the reference publishes no absolute numbers —
BASELINE.md — and the previous same-chip bf16 ratio couldn't surface
cross-round regressions, VERDICT r2 weak 2). >1 means this round is
faster than last round.

Measurement note: this environment reaches the TPU through a tunnel
whose dispatch is deferred (block_until_ready does not fence), so the
bench chains iterations inside one jitted ``lax.fori_loop`` — forcing
sequential device execution — and times the difference between a long
and a short chain to cancel the round-trip constant.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BATCH = 128
SHORT_ITERS = 2
LONG_ITERS = 22

# absolute anchors from the round-2 driver capture on this chip
# (BENCH_r02.json; BERT from STATUS.md 1.008M tok/s w8a8 at s=128)
R02_RESNET18_IMG_S = 45077.03
R02_BERT_SEQ_S = 7875.0

BERT_BATCH = 32
BERT_SEQ = 128


def _make_chain(definition, params, dtype, iters):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(p, x):
        def body(_, carry):
            out = definition.apply(p, {"input": carry}, dtype)["output"]
            # feed a tiny function of the output back into the input so
            # every iteration depends on the previous one (not foldable)
            bump = (jnp.tanh(jnp.sum(out)) * 1e-6).astype(carry.dtype)
            return carry + bump
        final = jax.lax.fori_loop(0, iters, body, x)
        return jnp.sum(final)

    return chained


def _throughput(quant_mode: str) -> float:
    import jax

    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.utils.config import ModelSettings, QuantMode

    # W8A8: int8 activations feed the s8 x s8 MXU convs (the ModelEngine
    # sets this process-wide flag the same way; +28% over weight-only
    # int8 on one v5e)
    nn.set_w8a8(quant_mode == "w8a8")
    model = build_model(
        ModelSettings(
            family="resnet18",
            compute_dtype="BF16",
            quantization=QuantMode(quant_mode),
        ),
        seed=0,
    )
    params = jax.device_put(model.params)
    x = jax.device_put(
        np.random.default_rng(0)
        .standard_normal((BATCH, 3, 224, 224))
        .astype(np.float32)
    )

    times = {}
    for iters in (SHORT_ITERS, LONG_ITERS):
        fn = _make_chain(model.definition, params, model.compute_dtype, iters)
        float(fn(params, x))  # compile + first run
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(params, x))  # scalar fetch = the only sync point
            best = min(best, time.perf_counter() - t0)
        times[iters] = best

    per_iter = (times[LONG_ITERS] - times[SHORT_ITERS]) / (LONG_ITERS - SHORT_ITERS)
    return BATCH / per_iter


def _bert_throughput() -> float:
    """BERT-base W8A8 seq/s at s=128 — the second BASELINE headline.
    Same chained-fori-loop discipline as the ResNet measure: the int
    bump is data-dependent (runtime zero, compile-time opaque) so the
    loop cannot be hoisted; one scalar fetch syncs."""
    import jax
    import jax.numpy as jnp

    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.utils.config import ModelSettings, QuantMode

    nn.set_w8a8(True)
    try:
        model = build_model(
            ModelSettings(
                family="bert-base-uncased",
                compute_dtype="BF16",
                quantization=QuantMode("w8a8"),
                options={"seq_len": BERT_SEQ},
            ),
            seed=0,
        )
        params = jax.device_put(model.params)
        rng = np.random.default_rng(0)
        ids = jax.device_put(
            rng.integers(0, 30000, (BERT_BATCH, BERT_SEQ)).astype(np.int32)
        )
        mask = jax.device_put(np.ones((BERT_BATCH, BERT_SEQ), np.int32))
        definition, dtype = model.definition, model.compute_dtype

        def make_chain(iters):
            @jax.jit
            def chained(p, ids, mask):
                def body(_, carry):
                    out = definition.apply(
                        p, {"input_ids": carry, "attention_mask": mask}, dtype
                    )["last_hidden_state"]
                    bump = (jnp.sum(out) * 1e-9).astype(jnp.int32)
                    return carry + bump
                final = jax.lax.fori_loop(0, iters, body, ids)
                return jnp.sum(final)

            return chained

        times = {}
        for iters in (SHORT_ITERS, LONG_ITERS):
            fn = make_chain(iters)
            float(fn(params, ids, mask))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                float(fn(params, ids, mask))
                best = min(best, time.perf_counter() - t0)
            times[iters] = best
        per_iter = (times[LONG_ITERS] - times[SHORT_ITERS]) / (
            LONG_ITERS - SHORT_ITERS
        )
        return BERT_BATCH / per_iter
    finally:
        nn.set_w8a8(False)


def main() -> int:
    import jax

    platform = jax.devices()[0].platform
    print(f"# bench on {jax.devices()}", file=sys.stderr)

    bert_sps = _bert_throughput()
    print(f"# bert-base w8a8 s{BERT_SEQ}: {bert_sps:.1f} seq/s "
          f"({bert_sps * BERT_SEQ / 1e6:.3f}M tok/s)", file=sys.stderr)
    # the INT8 serving configuration: int8 weights AND activations
    # (per-channel weight scales, dynamic per-tensor activation scales)
    int8_ips = _throughput("w8a8")
    print(f"# int8 (w8a8): {int8_ips:.1f} img/s", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"bert_base_w8a8_seq_per_sec_per_chip[{platform}]",
                "value": round(bert_sps, 2),
                "unit": "seq/s",
                "vs_baseline": round(bert_sps / R02_BERT_SEQ_S, 4),
            }
        )
    )
    # headline LAST (the driver parses the final line)
    print(
        json.dumps(
            {
                "metric": f"resnet18_int8_images_per_sec_per_chip[{platform}]",
                "value": round(int8_ips, 2),
                "unit": "images/s",
                "vs_baseline": round(int8_ips / R02_RESNET18_IMG_S, 4),
            }
        )
    )
    return 0


def _supervised() -> int:
    """Run the measurement in a child process with a deadline and retry.

    The tunneled transport this bench runs over can sporadically wedge a
    device fetch forever (see serving/generation.py _fetch_result); a
    wedged child is killed and the measurement retried in a fresh
    process so the driver always gets a JSON line or a clean failure."""
    import subprocess

    for attempt in range(3):
        try:
            proc = subprocess.run(
                [sys.executable, __file__, "--child"],
                stdout=subprocess.PIPE,
                timeout=1200,
            )
        except subprocess.TimeoutExpired:
            print(f"# attempt {attempt + 1} timed out (transport wedge); "
                  "retrying", file=sys.stderr)
            continue
        out = proc.stdout.decode()
        if proc.returncode == 0 and out.strip():
            sys.stdout.write(out)
            return 0
        print(f"# attempt {attempt + 1} exited rc={proc.returncode}",
              file=sys.stderr)
    return 1


if __name__ == "__main__":
    if "--child" in sys.argv:
        raise SystemExit(main())
    raise SystemExit(_supervised())
