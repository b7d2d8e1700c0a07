"""W8A8 compute path: per-token dynamic INT8 activation quantization
(ops/quant.quantize_activations) feeding the s8 x s8 -> s32 dot in
ops/nn.dense, selected by QuantMode.W8A8. Accuracy must stay near the
weight-only INT8 path (BASELINE: delta <= 0.5% top-1 / 0.1 F1)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.ops import nn
from starpu_inference_server_tpu.ops.quant import (
    quantize_activations,
    quantize_per_channel,
)


@pytest.fixture(autouse=True)
def _reset_w8a8():
    yield
    nn.set_w8a8(False)


def test_quantize_activations_roundtrip():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((8, 64)).astype(np.float32) * 3.0
    x_q, sx = quantize_activations(jnp.asarray(x))
    back = np.asarray(x_q, np.float32) * np.asarray(sx)
    err = np.abs(back - x).max(axis=-1) / np.abs(x).max(axis=-1)
    assert (err < 1 / 127).all()
    assert np.asarray(x_q).dtype == np.int8


def test_quantize_activations_zero_rows():
    x_q, sx = quantize_activations(jnp.zeros((3, 16)))
    assert (np.asarray(x_q) == 0).all()
    np.testing.assert_array_equal(np.asarray(sx), np.ones((3, 1), np.float32))


def test_dense_w8a8_matches_fp32():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((32, 128)).astype(np.float32)
    w = rng.standard_normal((128, 96)).astype(np.float32) * 0.1
    b = rng.standard_normal((96,)).astype(np.float32) * 0.01
    want = x @ w + b

    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=8, axis=-1)
    p = {"w": {"w_q": w_q, "scale": scale, "bits": 8}, "b": jnp.asarray(b)}
    nn.set_w8a8(True)
    got = np.asarray(nn.dense(p, jnp.asarray(x), jnp.float32))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.02, rel

    # leading dims reshape correctly
    x3 = x.reshape(4, 8, 128)
    got3 = np.asarray(nn.dense(p, jnp.asarray(x3), jnp.float32))
    np.testing.assert_allclose(got3.reshape(32, 96), got, rtol=1e-6)


def test_dense_w8a8_off_uses_dequant():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((4, 32)).astype(np.float32)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=8, axis=-1)
    p = {"w": {"w_q": w_q, "scale": scale, "bits": 8}}
    nn.set_w8a8(False)
    off = np.asarray(nn.dense(p, jnp.asarray(x), jnp.float32))
    nn.set_w8a8(True)
    on = np.asarray(nn.dense(p, jnp.asarray(x), jnp.float32))
    # both approximate fp32; they differ by the activation-quant error
    assert np.abs(off - on).max() > 0  # distinct paths
    want = x @ w
    for got in (off, on):
        rel = np.abs(got - want).max() / np.abs(want).max()
        assert rel < 0.02, rel


def test_bert_w8a8_close_to_weight_only():
    """Full BERT-tiny forward: W8A8 output must stay close to the
    weight-only INT8 output (activation-quant error only)."""
    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.utils.config import (
        ModelSettings,
        QuantMode,
    )

    opts = {"seq_len": 16, "vocab_size": 256}
    built = build_model(
        ModelSettings(family="bert-base-uncased", options=opts,
                      compute_dtype="FP32", quantization=QuantMode.INT8),
        seed=0,
    )
    ids = np.random.default_rng(3).integers(0, 256, (2, 16), np.int64)
    inputs = {"input_ids": ids, "attention_mask": np.ones((2, 16), np.int64)}
    nn.set_w8a8(False)
    base = np.asarray(
        built.definition.apply(built.params, inputs, jnp.float32)[
            "last_hidden_state"
        ]
    )
    nn.set_w8a8(True)
    got = np.asarray(
        built.definition.apply(built.params, inputs, jnp.float32)[
            "last_hidden_state"
        ]
    )
    rel = np.abs(got - base).max() / np.abs(base).max()
    assert rel < 0.05, rel
    # and both still resemble the unquantized model
    fp = build_model(
        ModelSettings(family="bert-base-uncased", options=opts,
                      compute_dtype="FP32", quantization=QuantMode.NONE),
        seed=0,
    )
    nn.set_w8a8(False)
    want = np.asarray(
        fp.definition.apply(fp.params, inputs, jnp.float32)[
            "last_hidden_state"
        ]
    )
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.08, rel


def test_model_engine_sets_w8a8_flag():
    from starpu_inference_server_tpu.core.engine import ModelEngine
    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.utils.config import parse_config

    def cfg(quant):
        return parse_config({
            "name": "m",
            "model": {
                "family": "matmul",
                "compute_dtype": "FP32",
                "quantization": quant,
                "options": {"dim": 16},
            },
            "inputs": [{"name": "input", "dims": [16], "dtype": "FP32"}],
            "outputs": [{"name": "output", "dims": [16], "dtype": "FP32"}],
            "pool_size": 1,
            "max_batch_size": 2,
            "batch_coalesce_timeout_ms": 0,
            "batching_strategy": "disabled",
            "congestion": {"enabled": False},
            "metrics_enabled": False,
        })

    c = cfg("w8a8")
    ModelEngine(c, build_model(c.model, seed=0))
    assert nn.w8a8()
    c = cfg("int8")
    ModelEngine(c, build_model(c.model, seed=0))
    assert not nn.w8a8()


def test_w8a8_conv2d_close_to_dense():
    """Per-tensor activation quant + int8 conv tracks the f32 conv."""
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.ops.quant import quantize_per_channel

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 8, 16)).astype(np.float32)
    w = (rng.standard_normal((3, 3, 16, 32)) * 0.1).astype(np.float32)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=8, axis=-1)
    p_dense = {"w": jnp.asarray(w)}
    p_quant = {"w": {"w_q": w_q, "scale": scale, "bits": 8}}

    want = np.asarray(nn.conv2d(p_dense, jnp.asarray(x), padding=1,
                                dtype=jnp.float32))
    nn.set_w8a8(True)
    try:
        got = np.asarray(nn.conv2d(p_quant, jnp.asarray(x), padding=1,
                                   dtype=jnp.float32))
    finally:
        nn.set_w8a8(False)
    # int8 weights + per-tensor int8 activations: ~1% relative error
    rel = np.abs(got - want) / (np.abs(want) + 1e-3)
    assert float(np.median(rel)) < 0.02, float(np.median(rel))
    corr = np.corrcoef(got.ravel(), want.ravel())[0, 1]
    assert corr > 0.999, corr


def test_dense_w4a8_matches_fp32():
    """W4A8 XLA fallback path: packed-int4 weight leaf + _W8A8 (no
    Pallas) must run the s8 x s8 contraction and stay near FP32 within
    int4 quantization error."""
    from starpu_inference_server_tpu.ops.quant import pack_int4

    rng = np.random.default_rng(2)
    x = rng.standard_normal((32, 128)).astype(np.float32)
    w = rng.standard_normal((128, 96)).astype(np.float32) * 0.1
    want = x @ w

    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=4, axis=-1)
    p = {"w": {"w_p4": pack_int4(w_q), "scale": scale, "bits": 4}}
    nn.set_w8a8(True)
    got = np.asarray(nn.dense(p, jnp.asarray(x), jnp.float32))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.15  # int4 weight error dominates
    # against the int4-dequant reference only activation error remains
    want_q = x @ (np.asarray(w_q, np.float32) * np.asarray(scale))
    rel_q = np.abs(got - want_q).max() / np.abs(want_q).max()
    assert rel_q < 0.02

    # and the pallas interpret path agrees with the XLA fallback
    from starpu_inference_server_tpu.ops import pallas_kernels as pk

    pk.set_interpret(True)
    nn.set_use_pallas(True)
    try:
        got_pl = np.asarray(nn.dense(p, jnp.asarray(x), jnp.float32))
    finally:
        nn.set_use_pallas(False)
        pk.set_interpret(False)
    np.testing.assert_allclose(got_pl, got, rtol=1e-4, atol=1e-4)
