"""Pallas kernel tests (interpret mode on CPU; the same kernels compile
natively on TPU — exercised by bench/TPU smoke)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.ops import pallas_kernels as pk
from starpu_inference_server_tpu.ops.quant import (
    pack_int4,
    quantize_per_channel,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    pk.set_interpret(True)
    yield
    pk.set_interpret(False)


def _ref_int8(x, w_q, scale):
    # the kernel feeds bf16 operands to the MXU with f32 accumulation;
    # mirror that rounding in the reference
    xb = np.asarray(jnp.asarray(x, jnp.bfloat16)).astype(np.float32)
    return (xb @ w_q.astype(np.float32)) * scale.reshape(1, -1)


@pytest.mark.parametrize("shape", [(8, 128, 128), (16, 256, 384), (9, 130, 200)])
def test_int8_matmul_matches_reference(shape):
    m, k, n = shape
    rng = np.random.default_rng(0)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=8)
    out = pk.int8_matmul(
        jnp.asarray(x), w_q, scale, tile_m=8, tile_n=128, tile_k=128
    )
    ref = _ref_int8(x, np.asarray(w_q), np.asarray(scale))
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-2, atol=2e-2)


def test_int8_matmul_k_accumulation():
    # K spans multiple tiles -> exercises the accumulator-across-grid path
    m, k, n = 8, 512, 128
    rng = np.random.default_rng(1)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=8)
    out = pk.int8_matmul(
        jnp.asarray(x), w_q, scale, tile_m=8, tile_n=128, tile_k=128
    )
    ref = _ref_int8(x, np.asarray(w_q), np.asarray(scale))
    # bf16 operand cast in the kernel: compare with loose tolerance
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 0.05


def test_int4_matmul_matches_reference():
    m, k, n = 8, 256, 128
    rng = np.random.default_rng(2)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=4)
    packed = pack_int4(w_q)
    out = pk.int4_matmul(
        jnp.asarray(x), packed, scale, tile_m=8, tile_n=128, tile_k=256
    )
    ref = _ref_int8(x, np.asarray(w_q), np.asarray(scale))
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 0.05


def test_output_dtype():
    m, k, n = 8, 128, 128
    x = jnp.ones((m, k), jnp.float32)
    w_q, scale = quantize_per_channel(jnp.ones((k, n)), bits=8)
    out = pk.int8_matmul(x, w_q, scale, out_dtype=jnp.bfloat16,
                         tile_m=8, tile_n=128, tile_k=128)
    assert out.dtype == jnp.bfloat16


def test_int4_matmul_w4a8_matches_reference():
    m, k, n = 16, 256, 128
    rng = np.random.default_rng(5)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=4)
    packed = pack_int4(w_q)
    from starpu_inference_server_tpu.ops.quant import quantize_activations

    x_q, sx = quantize_activations(jnp.asarray(x))
    out = pk.int4_matmul_w4a8(
        x_q, sx, packed, scale, tile_m=8, tile_n=128, tile_k=256
    )
    ref = (
        np.asarray(x_q).astype(np.float32) @ np.asarray(w_q).astype(np.float32)
    ) * np.asarray(sx).reshape(m, 1) * np.asarray(scale).reshape(1, n)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-4)


def test_int4_matmul_odd_shapes_pad():
    # non-divisor N exercises the generic pad path
    m, k, n = 5, 256, 200
    rng = np.random.default_rng(6)
    x = rng.standard_normal((m, k)).astype(np.float32)
    w = rng.standard_normal((k, n)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=4)
    packed = pack_int4(w_q)
    out = pk.int4_matmul(
        jnp.asarray(x), packed, scale, tile_m=8, tile_n=128, tile_k=128
    )
    ref = _ref_int8(x, np.asarray(w_q), np.asarray(scale))
    rel = np.abs(np.asarray(out) - ref) / (np.abs(ref) + 1.0)
    assert rel.max() < 0.05
