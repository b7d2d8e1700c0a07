"""Trivial test models.

``add_one`` mirrors the reference's e2e fixture model (a TorchScript
module whose forward is ``x + 1``; reference:
tests/e2e/fixtures/simple_model.ts:1-2, used by
tests/e2e/smoke/test_full_inference.cpp:46-100). ``identity`` and
``matmul`` give the test pyramid cheap models with zero and one MXU op.
"""

from __future__ import annotations

import numpy as np

from ..ops import nn
from ..utils.config import TensorSpec
from .registry import ModelDefinition, register_family


def _spec_from_options(options, default_dims=(8,), dtype="FP32"):
    dims = tuple(options.get("dims", default_dims))
    return (
        (TensorSpec("input", dims, dtype),),
        (TensorSpec("output", dims, dtype),),
    )


@register_family("identity")
def build_identity(options) -> ModelDefinition:
    in_specs, out_specs = _spec_from_options(options)

    def init_params(rng):
        return {}

    def apply(params, inputs, dtype):
        return {"output": inputs["input"]}

    return ModelDefinition("identity", init_params, apply, in_specs, out_specs)


@register_family("add_one")
def build_add_one(options) -> ModelDefinition:
    in_specs, out_specs = _spec_from_options(options)

    def init_params(rng):
        return {}

    def apply(params, inputs, dtype):
        return {"output": inputs["input"] + 1}

    return ModelDefinition("add_one", init_params, apply, in_specs, out_specs)


@register_family("matmul")
def build_matmul(options) -> ModelDefinition:
    """y = x @ W, a single-MXU-op model for kernel/quant tests."""
    dim = int(options.get("dim", 64))
    in_specs = (TensorSpec("input", (dim,), "FP32"),)
    out_specs = (TensorSpec("output", (dim,), "FP32"),)

    def init_params(rng):
        return {
            "fc": {
                "w": (rng.standard_normal((dim, dim)) / np.sqrt(dim)).astype(
                    np.float32
                ),
                "b": np.zeros((dim,), np.float32),
            }
        }

    def apply(params, inputs, dtype):
        y = nn.dense(params["fc"], inputs["input"], dtype)
        return {"output": y.astype(np.float32)}

    return ModelDefinition("matmul", init_params, apply, in_specs, out_specs)
