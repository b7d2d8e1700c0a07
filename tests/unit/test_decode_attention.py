"""Fused decode-attention kernel vs the jnp reference (interpret mode)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.ops import decode_attention as da


@pytest.fixture(autouse=True)
def interpret_mode():
    da.set_interpret(True)
    yield
    da.set_interpret(False)


def reference(q, k_cache, v_cache, k_scale, v_scale, lengths, rep):
    """The jnp decode path: dequant full cache, repeat for GQA, masked
    softmax attention."""
    s, hq, d = q.shape
    t = k_cache.shape[1]
    k = k_cache.astype(np.float32) * k_scale[..., None]
    v = v_cache.astype(np.float32) * v_scale[..., None]
    k = np.repeat(k, rep, axis=2)   # [S, T, Hq, D]
    v = np.repeat(v, rep, axis=2)
    logits = np.einsum("shd,sthd->sht", q.astype(np.float32), k) / np.sqrt(d)
    pos = np.arange(t)[None, None, :]
    mask = pos <= lengths[:, None, None]
    logits = np.where(mask, logits, -1e30)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("sht,sthd->shd", probs, v)


def make_case(s=2, t=128, hkv=2, rep=2, d=32, seed=0):
    rng = np.random.default_rng(seed)
    hq = hkv * rep
    q = rng.standard_normal((s, hq, d)).astype(np.float32)
    k = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    v = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    ks = (rng.random((s, t, hkv)).astype(np.float32) + 0.5) / 127
    vs = (rng.random((s, t, hkv)).astype(np.float32) + 0.5) / 127
    lengths = rng.integers(1, t - 1, (s,)).astype(np.int32)
    return q, k, v, ks, vs, lengths


@pytest.mark.parametrize("chunk", [64, 128])
def test_matches_reference(chunk):
    q, k, v, ks, vs, lengths = make_case()
    out = da.decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(lengths),
        rep=2, chunk=chunk,
    )
    ref = reference(q, k, v, ks, vs, lengths, rep=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_no_gqa_rep1():
    q, k, v, ks, vs, lengths = make_case(hkv=4, rep=1)
    out = da.decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(lengths),
        rep=1, chunk=64,
    )
    ref = reference(q, k, v, ks, vs, lengths, rep=1)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_length_zero_attends_only_position_zero():
    q, k, v, ks, vs, _ = make_case(s=1)
    lengths = np.zeros((1,), np.int32)
    out = da.decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(lengths),
        rep=2, chunk=64,
    )
    ref = reference(q, k, v, ks, vs, lengths, rep=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_bf16_query():
    q, k, v, ks, vs, lengths = make_case(seed=3)
    out = da.decode_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(lengths),
        rep=2, chunk=128,
    )
    assert out.dtype == jnp.bfloat16
    ref = reference(q, k, v, ks, vs, lengths, rep=2)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), ref, rtol=3e-2, atol=3e-2
    )
