"""Fused bidirectional (encoder) attention vs the jnp path — BERT/ViT
layers route through ops/prefill_attention.bidirectional_attention when
the Pallas gate is on; numerics must match with and without padding
masks (interpret mode on CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.ops import nn
from starpu_inference_server_tpu.ops import prefill_attention as pa


@pytest.fixture(autouse=True)
def _interpret():
    pa.set_interpret(True)
    yield
    pa.set_interpret(False)
    nn.set_use_pallas(False)


def _run(mask, use_pallas):
    rng = np.random.default_rng(0)
    b, s, h, dim = 2, 512, 4, 256
    q = jnp.asarray(rng.standard_normal((b, s, dim)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, dim)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, dim)).astype(np.float32))
    nn.set_use_pallas(use_pallas)
    try:
        return np.asarray(
            nn._attention(q, k, v, mask, h, jnp.float32)
        )
    finally:
        nn.set_use_pallas(False)


def test_matches_jnp_no_mask():
    np.testing.assert_allclose(
        _run(None, True), _run(None, False), rtol=2e-5, atol=2e-5
    )


def test_matches_jnp_padding_mask():
    mask = np.ones((2, 512), np.int64)
    mask[0, 400:] = 0
    mask[1, 64:] = 0
    mask = jnp.asarray(mask)
    got, ref = _run(mask, True), _run(mask, False)
    # compare only non-padding rows (padding-row outputs are unused)
    np.testing.assert_allclose(got[0, :400], ref[0, :400],
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[1, :64], ref[1, :64],
                               rtol=2e-5, atol=2e-5)


def test_bert_model_matches_with_kernel():
    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.utils.config import ModelSettings

    model = build_model(
        ModelSettings(family="bert-base-uncased", compute_dtype="FP32",
                      options={"num_layers": 2, "seq_len": 512}),
        seed=0,
    )
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 30000, (2, 512)))
    mask = np.ones((2, 512), np.int64)
    mask[1, 300:] = 0
    inputs = {"input_ids": ids, "attention_mask": jnp.asarray(mask)}
    ref = np.asarray(model.apply(inputs)["last_hidden_state"])
    nn.set_use_pallas(True)
    try:
        got = np.asarray(model.apply(inputs)["last_hidden_state"])
    finally:
        nn.set_use_pallas(False)
    np.testing.assert_allclose(got[0], ref[0], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got[1, :300], ref[1, :300],
                               rtol=2e-4, atol=2e-4)
