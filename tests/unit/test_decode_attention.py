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


# -- windowed decode (speculative verify) -----------------------------------

def test_window_decode_attention_matches_reference():
    """W query rows per slot, row w masked to positions <= lengths+w."""
    rng = np.random.default_rng(7)
    s, w, t, hkv, rep, d = 2, 4, 128, 2, 2, 64
    hq = hkv * rep
    q = rng.standard_normal((s, w, hq, d)).astype(np.float32)
    k = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    v = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    lengths = np.asarray([5, 100], np.int32)

    got = np.asarray(da.window_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
        jnp.asarray(vs), jnp.asarray(lengths), rep=rep,
        out_dtype=jnp.float32,
    ))

    kd = np.repeat(k.astype(np.float32) * ks[..., None], rep, axis=2)
    vd = np.repeat(v.astype(np.float32) * vs[..., None], rep, axis=2)
    logits = np.einsum("swhd,skhd->shwk", q, kd) / np.sqrt(d)
    key_pos = np.arange(t)
    pos = lengths[:, None] + np.arange(w)[None, :]              # [S, W]
    mask = key_pos[None, None, None, :] <= pos[:, None, :, None]
    logits = np.where(mask, logits, -1e30)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("shwk,skhd->swhd", probs, vd)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_verify_step_matches_with_kernel_enabled():
    """models/decoder.verify_step: identical logits with the fused
    window kernel vs the jnp path."""
    import jax

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_cache,
        init_params,
        prefill,
        verify_step,
    )
    from starpu_inference_server_tpu.ops import nn

    spec = get_spec("llama-tiny", {
        "layers": 2, "hidden": 128, "q_heads": 2, "kv_heads": 1,
        "intermediate": 96, "vocab": 64,
    })
    params = init_params(spec, np.random.default_rng(8))
    rng = np.random.default_rng(9)

    def run():
        cache = init_cache(spec, 2, 128)
        for slot, length in ((0, 6), (1, 3)):
            prompt = np.zeros((8,), np.int32)
            prompt[:length] = rng.integers(0, 64, (length,))
            cache, _ = prefill(
                spec, params, cache, jnp.asarray(prompt), jnp.int32(length),
                jnp.int32(slot), jnp.float32,
            )
        ids = jnp.asarray(rng.integers(0, 64, (2, 4)), jnp.int32)
        active = jnp.asarray([True, True])
        _, logits = verify_step(spec, params, cache, ids, active, jnp.float32)
        return np.asarray(logits)

    assert not nn.use_pallas()
    want = run()
    rng = np.random.default_rng(9)  # same prompts/ids both runs
    nn.set_use_pallas(True)
    try:
        got = run()
    finally:
        nn.set_use_pallas(False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


# -- paged kernels (page-table-indirect fetches) ----------------------------

def _page_layout(k, v, ks, vs, page, rng):
    """Scatter a dense [S, T, ...] cache into a shuffled page pool +
    table (page 0 reserved as garbage)."""
    s, t = k.shape[:2]
    mp = t // page
    n = s * mp + 1
    perm = rng.permutation(np.arange(1, n))
    table = perm.reshape(s, mp).astype(np.int32)
    kp = np.zeros((n, page) + k.shape[2:], k.dtype)
    vp = np.zeros_like(kp)
    ksp = np.zeros((n, page) + ks.shape[2:], ks.dtype)
    vsp = np.zeros_like(ksp)
    for i in range(s):
        for j in range(mp):
            pid = table[i, j]
            kp[pid] = k[i, j * page:(j + 1) * page]
            vp[pid] = v[i, j * page:(j + 1) * page]
            ksp[pid] = ks[i, j * page:(j + 1) * page]
            vsp[pid] = vs[i, j * page:(j + 1) * page]
    return kp, vp, ksp, vsp, table


def test_paged_decode_attention_matches_dense():
    q, k, v, ks, vs, lengths = make_case(s=3, t=256, seed=11)
    rng = np.random.default_rng(12)
    kp, vp, ksp, vsp, table = _page_layout(k, v, ks, vs, 128, rng)
    got = np.asarray(da.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp),
        jnp.asarray(ksp), jnp.asarray(vsp), jnp.asarray(table),
        jnp.asarray(lengths), rep=2,
    ))
    ref = reference(q, k, v, ks, vs, lengths, rep=2)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_paged_window_decode_attention_matches_dense():
    rng = np.random.default_rng(13)
    s, w, t, hkv, rep, d = 2, 4, 256, 2, 2, 64
    hq = hkv * rep
    q = rng.standard_normal((s, w, hq, d)).astype(np.float32)
    k = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    v = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    lengths = np.asarray([5, 200], np.int32)
    kp, vp, ksp, vsp, table = _page_layout(k, v, ks, vs, 128, rng)

    got = np.asarray(da.paged_window_decode_attention(
        jnp.asarray(q), jnp.asarray(kp), jnp.asarray(vp), jnp.asarray(ksp),
        jnp.asarray(vsp), jnp.asarray(table), jnp.asarray(lengths),
        rep=rep, out_dtype=jnp.float32,
    ))
    want = np.asarray(da.window_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
        jnp.asarray(vs), jnp.asarray(lengths), rep=rep,
        out_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_paged_decode_step_fused_matches_fallback():
    """models/paged_decoder.paged_decode_step: identical logits with the
    fused paged kernel (interpret) vs the gather fallback."""
    from starpu_inference_server_tpu.models.paged_decoder import (
        init_paged_cache,
        paged_decode_step,
        paged_prefill,
        set_table_row,
    )
    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.ops import nn

    spec = get_spec("llama-tiny", {
        "layers": 2, "hidden": 256, "q_heads": 4, "kv_heads": 2,
        "intermediate": 96, "vocab": 64,
    })
    assert spec.head_dim == 64
    params = init_params(spec, np.random.default_rng(8))
    rng = np.random.default_rng(9)

    def run():
        cache = init_paged_cache(spec, 2, 256, num_pages=5, page_size=128)
        cache = set_table_row(cache, jnp.int32(0), jnp.asarray([2, 4], jnp.int32))
        cache = set_table_row(cache, jnp.int32(1), jnp.asarray([3, 1], jnp.int32))
        for slot, length in ((0, 6), (1, 3)):
            prompt = np.zeros((8,), np.int32)
            prompt[:length] = rng.integers(0, 64, (length,))
            cache, _ = paged_prefill(
                spec, params, cache, jnp.asarray(prompt), jnp.int32(length),
                jnp.int32(slot), jnp.float32,
            )
        ids = jnp.asarray(rng.integers(0, 64, (2,)), jnp.int32)
        active = jnp.asarray([True, True])
        _, logits = paged_decode_step(
            spec, params, cache, ids, active, jnp.float32
        )
        return np.asarray(logits)

    assert not nn.use_pallas()
    want = run()
    rng = np.random.default_rng(9)
    nn.set_use_pallas(True)
    try:
        got = run()
    finally:
        nn.set_use_pallas(False)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_grouped_mixed_lengths_s16():
    """Group-of-8 grid with per-slot random lengths across multiple
    chunks: the group skips by its LONGEST slot, shorter slots must
    still mask exactly (round-4 grouped kernel)."""
    q, k, v, ks, vs, lengths = make_case(s=16, t=256, seed=5)
    out = da.decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(ks), jnp.asarray(vs), jnp.asarray(lengths),
        rep=2, chunk=64,
    )
    ref = reference(q, k, v, ks, vs, lengths, rep=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_layered_blockspec_matches_sliced():
    """layer=li on the whole [L, S, T, H, D] cache must equal the
    per-layer sliced call (the S<=16 decode path)."""
    rng = np.random.default_rng(9)
    L, s, t, hkv, rep, d = 3, 8, 128, 2, 2, 32
    q = rng.standard_normal((s, hkv * rep, d)).astype(np.float32)
    kL = rng.integers(-127, 128, (L, s, t, hkv, d)).astype(np.int8)
    vL = rng.integers(-127, 128, (L, s, t, hkv, d)).astype(np.int8)
    ksL = (rng.random((L, s, t, hkv)).astype(np.float32) + 0.5) / 127
    vsL = (rng.random((L, s, t, hkv)).astype(np.float32) + 0.5) / 127
    lengths = rng.integers(1, t - 1, (s,)).astype(np.int32)
    for li in (0, 2):
        layered = da.decode_attention(
            jnp.asarray(q), jnp.asarray(kL), jnp.asarray(vL),
            jnp.asarray(ksL), jnp.asarray(vsL), jnp.asarray(lengths),
            rep=rep, layer=li,
        )
        sliced = da.decode_attention(
            jnp.asarray(q), jnp.asarray(kL[li]), jnp.asarray(vL[li]),
            jnp.asarray(ksL[li]), jnp.asarray(vsL[li]),
            jnp.asarray(lengths), rep=rep,
        )
        np.testing.assert_allclose(
            np.asarray(layered), np.asarray(sliced), rtol=1e-5, atol=1e-5
        )


def test_grouped_window_mixed_lengths_s16():
    """Group-of-8 window grid with per-slot random lengths across
    multiple chunks: the group skips by its longest slot's window end,
    shorter slots must still mask exactly per window row (round-5
    grouped verify kernel, VERDICT r4 weak 4)."""
    rng = np.random.default_rng(11)
    s, w, t, hkv, rep, d = 16, 5, 256, 2, 2, 64
    hq = hkv * rep
    q = rng.standard_normal((s, w, hq, d)).astype(np.float32)
    k = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    v = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    lengths = rng.integers(0, t - w, (s,)).astype(np.int32)

    got = np.asarray(da.window_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
        jnp.asarray(vs), jnp.asarray(lengths), rep=rep,
        out_dtype=jnp.float32,
    ))

    kd = np.repeat(k.astype(np.float32) * ks[..., None], rep, axis=2)
    vd = np.repeat(v.astype(np.float32) * vs[..., None], rep, axis=2)
    logits = np.einsum("swhd,skhd->shwk", q, kd) / np.sqrt(d)
    key_pos = np.arange(t)
    pos = lengths[:, None] + np.arange(w)[None, :]
    mask = key_pos[None, None, None, :] <= pos[:, None, :, None]
    logits = np.where(mask, logits, -1e30)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("shwk,skhd->swhd", probs, vd)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
