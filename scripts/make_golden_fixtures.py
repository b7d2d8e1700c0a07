#!/usr/bin/env python3
"""Generate golden accuracy fixtures: recorded FP32 outputs for
deterministic model builds at REAL hidden sizes.

VERDICT round-1 item 4: the CI accuracy gate ran random-weight
agreement at toy shapes (image_size 64). Real pretrained checkpoints
are unreachable in this offline environment, so the regression anchor
is a committed FIXTURE instead: weights regenerate bit-exactly from a
recorded seed (numpy PCG64 is stable across platforms), and the FP32
outputs recorded here are committed alongside. The gate
(scripts/accuracy_check.py --golden) then:

1. rebuilds the model from the seed and verifies its FP32 outputs
   still match the recording (catches silent model-code drift);
2. quantizes the same weights and enforces the BASELINE deltas
   (top-1 agreement / hidden rel-err / greedy-token agreement)
   against the RECORDED reference — a quant-kernel change that breaks
   real-shape accuracy fails CI.

Shapes are real where it matters for quantization error (hidden dims,
head dims, channel counts — these set the per-channel scale
granularity); depth is reduced to keep CI runtime sane (quantization
error per layer is what the gate measures; depth only compounds it).

Reference pattern: client-side expected-output validation
(/root/reference/client/bert_inference_client.py:263-358).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FIXTURES = {
    # real 224x224 input, full resnet18 topology
    "resnet18": {
        "family": "resnet18",
        "options": {},
        "batch": 8,
        "outputs": ["output"],
    },
    # real BERT-base hidden (768, 12 heads), 4 layers, real vocab
    "bert-golden": {
        "family": "bert-base-uncased",
        "options": {"num_layers": 4, "seq_len": 128},
        "batch": 8,
        "outputs": ["last_hidden_state"],
    },
    # real llama-1b widths (hidden 2048, heads 32/8, inter 5504), 2 layers
    "llama-golden": {
        "family": "llama-1b",
        "options": {"layers": 2, "seq_len": 64},
        "batch": 4,
        "outputs": ["logits"],
    },
    # real ViT-B/16 widths, 2 encoder layers
    "vit-golden": {
        "family": "vit_b_16",
        "options": {"num_layers": 2},
        "batch": 4,
        "outputs": ["output"],
    },
}

SEED = 20260820

# Quantized outputs are ALSO recorded (strided f32 samples) per mode:
# absolute quant-vs-fp32 agreement on random weights is a weak gate for
# 4-bit modes (random weights are incompressible; int4 rel-err ~0.7 is
# expected, not a bug), but quant outputs on the pinned CPU platform are
# deterministic — so recorded samples anchor a tight drift gate that
# catches any quant-kernel numerics change at real hidden sizes.
QUANT_MODES = ("int8", "w8a8", "int4", "w4a8")
SAMPLE_CAP = 4096


def sample(arr: np.ndarray) -> np.ndarray:
    flat = np.asarray(arr, np.float32).ravel()
    stride = max(1, flat.size // SAMPLE_CAP)
    return flat[::stride][:SAMPLE_CAP]


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.ops import nn as _nn
    from starpu_inference_server_tpu.utils.config import (
        ModelSettings,
        QuantMode,
    )
    from starpu_inference_server_tpu.utils.input_generator import (
        generate_inputs,
    )

    out_dir = Path(__file__).resolve().parent.parent / "ci" / "golden"
    out_dir.mkdir(parents=True, exist_ok=True)

    for name, fx in FIXTURES.items():
        model = build_model(
            ModelSettings(
                family=fx["family"], compute_dtype="FP32",
                options=fx["options"],
            ),
            seed=SEED,
        )
        rng = np.random.default_rng(SEED + 1)
        inputs = generate_inputs(
            model.definition.input_specs, fx["batch"], rng
        )
        outputs = model.apply({k: jnp.asarray(v) for k, v in inputs.items()})
        rec = {}
        for k in fx["outputs"]:
            arr = np.asarray(outputs[k], np.float32)
            if k == "logits" and arr.ndim == 3:
                # decoder [B, T, V] logits are huge; the gate metric is
                # greedy-token agreement — record argmax per position
                # plus the full last-position logits for magnitude checks
                rec[f"argmax_{k}"] = arr.argmax(-1).astype(np.int32)
                rec[f"last_{k}"] = arr[:, -1]
            else:
                rec[f"out_{k}"] = arr
        for mode in QUANT_MODES:
            qmodel = build_model(
                ModelSettings(
                    family=fx["family"], compute_dtype="FP32",
                    quantization=QuantMode(mode), options=fx["options"],
                ),
                seed=SEED,
            )
            _nn.set_w8a8(mode in ("w8a8", "w4a8"))
            try:
                q_out = qmodel.apply(
                    {k: jnp.asarray(v) for k, v in inputs.items()}
                )
            finally:
                _nn.set_w8a8(False)
            for k in fx["outputs"]:
                rec[f"q_{mode}_{k}"] = sample(q_out[k])
        meta = {
            "family": fx["family"], "options": fx["options"],
            "batch": fx["batch"], "seed": SEED, "input_seed": SEED + 1,
            "outputs": fx["outputs"],
        }
        path = out_dir / f"{name}.npz"
        np.savez_compressed(path, meta=json.dumps(meta), **rec)
        sizes = {k: list(v.shape) for k, v in rec.items()}
        print(f"{path.name}: {sizes} ({path.stat().st_size/1024:.0f} KiB)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
