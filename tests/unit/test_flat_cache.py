"""FLAT KV-cache layout parity: kernels and model paths must match the
standard layout bit-for-tolerance.

The FLAT layout stores K/V per-layer leaves as int8 [S, T, Hkv*D] with
f32 scales [S, Hkv, T] (paged: [N, page, Hkv*D] / [N, Hkv, page]) so
every minor dim is lane-aligned and XLA's compact parameter layout IS
the standard layout — the structural fix for the round-5 decode
dispatch bubble (see ops/decode_attention.py flat-layout section).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.ops import decode_attention as da
from tests.unit.test_decode_attention import (
    _page_layout,
    make_case,
    reference,
)


@pytest.fixture(autouse=True)
def interpret_mode():
    da.set_interpret(True)
    yield
    da.set_interpret(False)


def _flatten(k, v, ks, vs):
    """Standard [.., T, H, D] arrays -> flat layout arrays."""
    kf = k.reshape(k.shape[:-2] + (-1,))
    vf = v.reshape(v.shape[:-2] + (-1,))
    ksf = np.swapaxes(ks, -1, -2).copy()
    vsf = np.swapaxes(vs, -1, -2).copy()
    return kf, vf, ksf, vsf


@pytest.mark.parametrize("s,chunk", [(2, 64), (16, 64), (1, 128)])
def test_flat_decode_matches_reference(s, chunk):
    q, k, v, ks, vs, lengths = make_case(s=s, t=128, hkv=2, rep=2, d=64)
    kf, vf, ksf, vsf = _flatten(k, v, ks, vs)
    out = da.decode_attention(
        jnp.asarray(q), jnp.asarray(kf), jnp.asarray(vf),
        jnp.asarray(ksf), jnp.asarray(vsf), jnp.asarray(lengths),
        rep=2, chunk=chunk,
    )
    ref = reference(q, k, v, ks, vs, lengths, rep=2)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_flat_window_matches_standard():
    rng = np.random.default_rng(21)
    s, w, t, hkv, rep, d = 16, 5, 256, 2, 2, 64
    hq = hkv * rep
    q = rng.standard_normal((s, w, hq, d)).astype(np.float32)
    k = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    v = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    lengths = rng.integers(0, t - w, (s,)).astype(np.int32)
    kf, vf, ksf, vsf = _flatten(k, v, ks, vs)

    got = np.asarray(da.window_decode_attention(
        jnp.asarray(q), jnp.asarray(kf), jnp.asarray(vf), jnp.asarray(ksf),
        jnp.asarray(vsf), jnp.asarray(lengths), rep=rep,
        out_dtype=jnp.float32,
    ))
    want = np.asarray(da.window_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
        jnp.asarray(vs), jnp.asarray(lengths), rep=rep,
        out_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_flat_paged_decode_matches_dense():
    q, k, v, ks, vs, lengths = make_case(s=3, t=256, d=64, seed=31)
    rng = np.random.default_rng(32)
    kp, vp, ksp, vsp, table = _page_layout(k, v, ks, vs, 128, rng)
    kpf, vpf, kspf, vspf = _flatten(kp, vp, ksp, vsp)
    got = np.asarray(da.paged_decode_attention(
        jnp.asarray(q), jnp.asarray(kpf), jnp.asarray(vpf),
        jnp.asarray(kspf), jnp.asarray(vspf), jnp.asarray(table),
        jnp.asarray(lengths), rep=2,
    ))
    ref = reference(q, k, v, ks, vs, lengths, rep=2)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_flat_paged_window_matches_standard():
    rng = np.random.default_rng(33)
    s, w, t, hkv, rep, d = 2, 4, 256, 2, 2, 64
    hq = hkv * rep
    q = rng.standard_normal((s, w, hq, d)).astype(np.float32)
    k = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    v = rng.integers(-127, 128, (s, t, hkv, d)).astype(np.int8)
    ks = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    vs = rng.uniform(0.01, 0.1, (s, t, hkv)).astype(np.float32)
    lengths = np.asarray([5, 200], np.int32)
    kp, vp, ksp, vsp, table = _page_layout(k, v, ks, vs, 128, rng)
    kpf, vpf, kspf, vspf = _flatten(kp, vp, ksp, vsp)

    got = np.asarray(da.paged_window_decode_attention(
        jnp.asarray(q), jnp.asarray(kpf), jnp.asarray(vpf),
        jnp.asarray(kspf), jnp.asarray(vspf), jnp.asarray(table),
        jnp.asarray(lengths), rep=rep, out_dtype=jnp.float32,
    ))
    want = np.asarray(da.window_decode_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), jnp.asarray(ks),
        jnp.asarray(vs), jnp.asarray(lengths), rep=rep,
        out_dtype=jnp.float32,
    ))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


# -- model-level parity -----------------------------------------------------

def _tiny_spec():
    from starpu_inference_server_tpu.models.decoder import get_spec

    return get_spec("llama-tiny", {
        "layers": 2, "hidden": 256, "q_heads": 4, "kv_heads": 2,
        "intermediate": 96, "vocab": 64,
    })


def _drive_dense(spec, params, flat, use_pallas, rng):
    """prefill x2 -> decode_step x3 -> verify_step; returns all logits."""
    from starpu_inference_server_tpu.models.decoder import (
        decode_step,
        init_cache,
        prefill,
        verify_step,
    )
    from starpu_inference_server_tpu.ops import nn

    nn.set_use_pallas(use_pallas)
    try:
        cache = init_cache(spec, 2, 128, flat=flat)
        assert cache.flat == flat
        outs = []
        for slot, length in ((0, 6), (1, 3)):
            prompt = np.zeros((8,), np.int32)
            prompt[:length] = rng.integers(0, 64, (length,))
            cache, lg = prefill(
                spec, params, cache, jnp.asarray(prompt), jnp.int32(length),
                jnp.int32(slot), jnp.float32,
            )
            outs.append(np.asarray(lg))
        active = jnp.asarray([True, True])
        for _ in range(3):
            ids = jnp.asarray(rng.integers(0, 64, (2,)), jnp.int32)
            cache, lg = decode_step(spec, params, cache, ids, active,
                                    jnp.float32)
            outs.append(np.asarray(lg))
        wids = jnp.asarray(rng.integers(0, 64, (2, 4)), jnp.int32)
        _, lg = verify_step(spec, params, cache, wids, active, jnp.float32)
        outs.append(np.asarray(lg).reshape(-1, spec.vocab))
        return np.concatenate([o.reshape(-1, spec.vocab) for o in outs])
    finally:
        nn.set_use_pallas(False)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_dense_flat_matches_standard(use_pallas):
    from starpu_inference_server_tpu.models.decoder import init_params

    spec = _tiny_spec()
    params = init_params(spec, np.random.default_rng(8))
    want = _drive_dense(spec, params, flat=False, use_pallas=use_pallas,
                        rng=np.random.default_rng(9))
    got = _drive_dense(spec, params, flat=True, use_pallas=use_pallas,
                       rng=np.random.default_rng(9))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_dense_flat_chunked_prefill_matches_standard():
    from starpu_inference_server_tpu.models.decoder import (
        init_cache,
        init_params,
        prefill_chunk,
    )

    spec = _tiny_spec()
    params = init_params(spec, np.random.default_rng(8))
    rng = np.random.default_rng(10)
    prompt = rng.integers(0, 64, (40,))

    def run(flat):
        cache = init_cache(spec, 2, 128, flat=flat)
        lg = None
        for start in range(0, 64, 32):
            ids = np.zeros((32,), np.int32)
            valid = int(np.clip(len(prompt) - start, 0, 32))
            if valid > 0:
                ids[:valid] = prompt[start:start + valid]
            cache, lg = prefill_chunk(
                spec, params, cache, jnp.asarray(ids), jnp.int32(start),
                jnp.int32(max(valid, 1)), jnp.int32(1), jnp.float32,
            )
        return np.asarray(lg)

    np.testing.assert_allclose(run(True), run(False), rtol=2e-4, atol=2e-4)


def _drive_paged(spec, params, flat, use_pallas, rng):
    from starpu_inference_server_tpu.models.paged_decoder import (
        init_paged_cache,
        paged_decode_step,
        paged_prefill,
        paged_verify_step,
        set_table_row,
    )
    from starpu_inference_server_tpu.ops import nn

    nn.set_use_pallas(use_pallas)
    try:
        cache = init_paged_cache(spec, 2, 256, num_pages=5, page_size=128,
                                 flat=flat)
        assert cache.flat == flat
        cache = set_table_row(cache, jnp.int32(0),
                              jnp.asarray([2, 4], jnp.int32))
        cache = set_table_row(cache, jnp.int32(1),
                              jnp.asarray([3, 1], jnp.int32))
        outs = []
        for slot, length in ((0, 6), (1, 3)):
            prompt = np.zeros((8,), np.int32)
            prompt[:length] = rng.integers(0, 64, (length,))
            cache, lg = paged_prefill(
                spec, params, cache, jnp.asarray(prompt), jnp.int32(length),
                jnp.int32(slot), jnp.float32,
            )
            outs.append(np.asarray(lg))
        active = jnp.asarray([True, True])
        for _ in range(3):
            ids = jnp.asarray(rng.integers(0, 64, (2,)), jnp.int32)
            cache, lg = paged_decode_step(spec, params, cache, ids, active,
                                          jnp.float32)
            outs.append(np.asarray(lg))
        wids = jnp.asarray(rng.integers(0, 64, (2, 4)), jnp.int32)
        _, lg = paged_verify_step(spec, params, cache, wids, active,
                                  jnp.float32)
        outs.append(np.asarray(lg).reshape(-1, spec.vocab))
        return np.concatenate([o.reshape(-1, spec.vocab) for o in outs])
    finally:
        nn.set_use_pallas(False)


@pytest.mark.parametrize("use_pallas", [False, True])
def test_paged_flat_matches_standard(use_pallas):
    from starpu_inference_server_tpu.models.decoder import init_params

    spec = _tiny_spec()
    params = init_params(spec, np.random.default_rng(8))
    want = _drive_paged(spec, params, flat=False, use_pallas=use_pallas,
                        rng=np.random.default_rng(9))
    got = _drive_paged(spec, params, flat=True, use_pallas=use_pallas,
                       rng=np.random.default_rng(9))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_flat_stacked_rejected():
    from starpu_inference_server_tpu.models.decoder import init_cache

    with pytest.raises(ValueError, match="flat cache layout"):
        init_cache(_tiny_spec(), 2, 128, stacked=True, flat=True)
