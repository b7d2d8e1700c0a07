"""Fused stem kernel (ops/stem_kernel.py) parity in interpret mode.

The kernel is an EXPERIMENTAL opt-in (options.stem_fused; measured
slower than the XLA stem on v5e due to Mosaic relayouts — see
models/resnet._use_fused_stem) but its numerics are pinned here so a
future layout rewrite starts from a correct base."""

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.models import build_model
from starpu_inference_server_tpu.ops import stem_kernel
from starpu_inference_server_tpu.utils.config import ModelSettings


@pytest.fixture(autouse=True)
def _interpret():
    stem_kernel.set_interpret(True)
    yield
    stem_kernel.set_interpret(False)


def test_fused_stem_matches_direct():
    x = np.random.default_rng(0).standard_normal(
        (2, 3, 224, 224)
    ).astype(np.float32)

    def run(fused):
        m = build_model(
            ModelSettings(family="resnet18", compute_dtype="FP32",
                          options={"stem_fused": fused}),
            seed=0,
        )
        return np.asarray(m.apply({"input": jnp.asarray(x)})["output"])

    ref, got = run(False), run(True)
    rel = np.abs(got - ref) / (np.abs(ref).mean() + 1e-9)
    assert rel.mean() < 2e-3, rel.mean()  # bf16 stem weights
    assert (got.argmax(-1) == ref.argmax(-1)).all()
