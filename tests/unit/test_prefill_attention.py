"""Fused flash prefill-attention kernels vs the jnp reference
(interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.ops import prefill_attention as pa


@pytest.fixture(autouse=True)
def interpret_mode():
    pa.set_interpret(True)
    yield
    pa.set_interpret(False)


def ref_causal(q, k, v, rep):
    """jnp prefill path: GQA repeat + causal masked softmax."""
    b, t, hq, d = q.shape
    kf = np.repeat(k, rep, axis=2)
    vf = np.repeat(v, rep, axis=2)
    logits = np.einsum(
        "bqhd,bkhd->bhqk", q.astype(np.float32), kf.astype(np.float32)
    ) / np.sqrt(d)
    causal = np.tril(np.ones((t, t), bool))[None, None]
    logits = np.where(causal, logits, -1e30)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    return np.einsum("bhqk,bkhd->bqhd", probs, vf.astype(np.float32))


@pytest.mark.parametrize(
    "b,t,hkv,rep,d", [(1, 64, 2, 2, 64), (2, 256, 2, 4, 64), (1, 128, 1, 1, 128)]
)
def test_causal_attention_matches_reference(b, t, hkv, rep, d):
    rng = np.random.default_rng(0)
    hq = hkv * rep
    q = rng.standard_normal((b, t, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, t, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, t, hkv, d)).astype(np.float32)
    got = np.asarray(
        pa.causal_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                            rep=rep, out_dtype=jnp.float32)
    )
    want = ref_causal(q, k, v, rep)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def ref_chunk(q, k_row, v_row, ks, vs, k_cur, v_cur, start, rep):
    """prefill_chunk's two-part concat softmax."""
    c, hq, d = q.shape
    t = k_row.shape[0]
    past_k = np.repeat(k_row.astype(np.float32) * ks[..., None], rep, axis=1)
    past_v = np.repeat(v_row.astype(np.float32) * vs[..., None], rep, axis=1)
    cur_k = np.repeat(k_cur, rep, axis=1)
    cur_v = np.repeat(v_cur, rep, axis=1)
    inv = 1.0 / np.sqrt(d)
    s_past = np.einsum("qhd,khd->hqk", q.astype(np.float32), past_k) * inv
    s_past = np.where(np.arange(t)[None, None, :] < start, s_past, -1e30)
    s_cur = np.einsum("qhd,khd->hqk", q.astype(np.float32), cur_k) * inv
    causal = np.tril(np.ones((c, c), bool))[None]
    s_cur = np.where(causal, s_cur, -1e30)
    logits = np.concatenate([s_past, s_cur], axis=-1)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    out = np.einsum("hqk,khd->qhd", probs[..., :t], past_v)
    out += np.einsum("hqk,khd->qhd", probs[..., t:], cur_v)
    return out


@pytest.mark.parametrize("start", [0, 128, 256])
@pytest.mark.parametrize("cq", [32, 128])
def test_chunk_prefill_attention_matches_reference(start, cq):
    rng = np.random.default_rng(1)
    t, hkv, rep, d = 256, 2, 2, 64
    hq = hkv * rep
    q = rng.standard_normal((cq, hq, d)).astype(np.float32)
    k_row = rng.integers(-127, 128, (t, hkv, d)).astype(np.int8)
    v_row = rng.integers(-127, 128, (t, hkv, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (t, hkv)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (t, hkv)).astype(np.float32)
    k_cur = rng.standard_normal((cq, hkv, d)).astype(np.float32)
    v_cur = rng.standard_normal((cq, hkv, d)).astype(np.float32)
    got = np.asarray(pa.chunk_prefill_attention(
        jnp.asarray(q), jnp.asarray(k_row), jnp.asarray(v_row),
        jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(k_cur),
        jnp.asarray(v_cur), jnp.int32(start), rep=rep,
        out_dtype=jnp.float32,
    ))
    want = ref_chunk(q, k_row, v_row, ks, vs, k_cur, v_cur, start, rep)
    # flash recurrence vs concat softmax: same math, different
    # accumulation order
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_prefill_paths_match_with_kernels_enabled():
    """models/decoder.prefill + prefill_chunk produce the same cache and
    logits whether attention runs through the Pallas kernels or jnp."""
    import jax

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_cache,
        init_params,
        prefill,
        prefill_chunk,
    )
    from starpu_inference_server_tpu.ops import nn

    spec = get_spec("llama-tiny", {
        "layers": 2, "hidden": 128, "q_heads": 2, "kv_heads": 1,
        "intermediate": 96, "vocab": 64,
    })
    params = init_params(spec, np.random.default_rng(2))
    # shapes must clear the kernel gates: prompt bucket >= 256, cache
    # row >= 512 (below them XLA wins and the jnp path serves)
    prompt = np.random.default_rng(3).integers(0, 64, (256,), np.int32)
    length, slot = 200, 0

    def run():
        cache = init_cache(spec, 2, 512)
        cache, lg = prefill(
            spec, params, cache, jnp.asarray(prompt), jnp.int32(length),
            jnp.int32(slot), jnp.float32,
        )
        cache, lg2 = prefill_chunk(
            spec, params, cache, jnp.asarray(prompt), jnp.int32(0),
            jnp.int32(length), jnp.int32(1), jnp.float32,
        )
        return np.asarray(lg), np.asarray(lg2), jax.tree.map(np.asarray, cache)

    assert not nn.use_pallas()
    want_lg, want_lg2, want_cache = run()
    nn.set_use_pallas(True)
    try:
        from starpu_inference_server_tpu.models.decoder import (
            _use_fused_prefill_attention,
        )

        assert _use_fused_prefill_attention(spec, 256)
        assert _use_fused_prefill_attention(spec, 512, min_seq=512)
        got_lg, got_lg2, got_cache = run()
    finally:
        nn.set_use_pallas(False)
    np.testing.assert_allclose(got_lg, want_lg, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got_lg2, want_lg2, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(got_cache.lengths, want_cache.lengths)
    # compare the written rows DEQUANTIZED with one-quant-step slack
    # (int8 codes flip by one step where the attention outputs differ
    # in the last ulp; scales here are ~1e-2)
    for s in (slot, 1):
        for name in ("k", "v"):
            # layered cache: np.asarray stacks the per-layer leaves
            g = np.asarray(getattr(got_cache, name))[:, s, :length].astype(np.float32)
            w = np.asarray(getattr(want_cache, name))[:, s, :length].astype(np.float32)
            gs = np.asarray(getattr(got_cache, name + "_scale"))[:, s, :length]
            ws = np.asarray(getattr(want_cache, name + "_scale"))[:, s, :length]
            step = float(np.maximum(gs, ws).max())
            np.testing.assert_allclose(
                g * gs[..., None], w * ws[..., None],
                rtol=2e-3, atol=1.5 * step,
            )
