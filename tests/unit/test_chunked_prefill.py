"""Chunked prefill correctness: prefill_chunk must reproduce the
one-shot prefill (same cache rows, same logits), and interleaved decode
steps must never corrupt a mid-prefill slot row.

No reference counterpart (the reference serves encoder models only;
SURVEY.md section 5.7) — this covers the long-context capability axis of
the decoder engine.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    decode_step,
    get_spec,
    init_cache,
    init_params,
    prefill,
    prefill_chunk,
)


@pytest.fixture(scope="module")
def tiny():
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    return spec, params


def _full_prefill(spec, params, prompt, bucket, max_len=64, slot=0):
    cache = init_cache(spec, 2, max_len)
    padded = np.zeros((bucket,), np.int32)
    padded[: len(prompt)] = prompt
    return jax.jit(partial(prefill, spec, dtype=jnp.float32))(
        params, cache, jnp.asarray(padded), jnp.int32(len(prompt)),
        jnp.int32(slot),
    )


def _chunked_prefill(spec, params, prompt, chunk, max_len=64, slot=0,
                     interleave=None):
    cache = init_cache(spec, 2, max_len)
    fn = jax.jit(partial(prefill_chunk, spec, dtype=jnp.float32))
    off = 0
    logits = None
    while off < len(prompt):
        part = prompt[off : off + chunk]
        valid = len(part)
        padded = np.zeros((chunk,), np.int32)
        padded[:valid] = part
        cache, logits = fn(
            params, cache, jnp.asarray(padded), jnp.int32(off),
            jnp.int32(valid), jnp.int32(slot),
        )
        off += valid
        if interleave is not None and off < len(prompt):
            cache = interleave(cache)
    return cache, logits


def test_single_chunk_matches_full_prefill(tiny):
    """chunk >= prompt: in-chunk attention stays at compute precision, so
    the result must match prefill() to float rounding, and the quantized
    cache rows must be bitwise identical."""
    spec, params = tiny
    prompt = np.random.default_rng(3).integers(0, spec.vocab, (20,), np.int32)
    cache_a, logits_a = _full_prefill(spec, params, prompt, bucket=32)
    cache_b, logits_b = _chunked_prefill(spec, params, prompt, chunk=32)
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_b), rtol=1e-4, atol=1e-4
    )
    # layered cache: np.asarray stacks the per-layer leaves
    assert (np.asarray(cache_a.k)[:, 0, :20]
            == np.asarray(cache_b.k)[:, 0, :20]).all()
    assert (np.asarray(cache_a.v)[:, 0, :20]
            == np.asarray(cache_b.v)[:, 0, :20]).all()
    assert int(cache_b.lengths[0]) == 20


def test_multi_chunk_matches_full_prefill(tiny):
    """Chunked prefill reads past keys back from the INT8 cache (decode
    numerics), so logits drift slightly but the greedy continuation must
    match the one-shot prefill's continuation."""
    spec, params = tiny
    prompt = np.random.default_rng(3).integers(0, spec.vocab, (20,), np.int32)
    cache_a, logits_a = _full_prefill(spec, params, prompt, bucket=32)
    cache_c, logits_c = _chunked_prefill(spec, params, prompt, chunk=8)
    assert int(cache_c.lengths[0]) == 20
    np.testing.assert_allclose(
        np.asarray(logits_a), np.asarray(logits_c), atol=0.15
    )

    step = jax.jit(partial(decode_step, spec, dtype=jnp.float32))

    def greedy(cache, logits, n=5):
        toks = [int(jnp.argmax(logits))]
        for _ in range(n):
            ids = jnp.zeros((2,), jnp.int32).at[0].set(toks[-1])
            cache, lg = step(params, cache, ids, jnp.asarray([True, False]))
            toks.append(int(jnp.argmax(lg[0])))
        return toks

    assert greedy(cache_a, logits_a) == greedy(cache_c, logits_c)


def test_interleaved_decode_does_not_corrupt_prefilling_slot(tiny):
    """A decode block between two chunks writes its (discarded) KV for
    the inactive mid-prefill slot at t_max-1, never over prompt rows —
    the final chunked result must be bitwise independent of interleaving."""
    spec, params = tiny
    rng = np.random.default_rng(4)
    prompt_a = rng.integers(0, spec.vocab, (6,), np.int32)   # active slot 0
    prompt_b = rng.integers(0, spec.vocab, (20,), np.int32)  # chunked slot 1

    step = jax.jit(partial(decode_step, spec, dtype=jnp.float32))

    def with_slot0(cache):
        """Install slot 0's prefill into the given cache."""
        padded = np.zeros((8,), np.int32)
        padded[: len(prompt_a)] = prompt_a
        cache, lg = jax.jit(partial(prefill, spec, dtype=jnp.float32))(
            params, cache, jnp.asarray(padded), jnp.int32(len(prompt_a)),
            jnp.int32(0),
        )
        return cache, lg

    # baseline: chunked prefill of slot 1 with no interleaving
    cache_ref, logits_ref = _chunked_prefill(
        spec, params, prompt_b, chunk=8, slot=1
    )

    # interleaved: slot 0 decodes one token between every chunk of slot 1
    cache = init_cache(spec, 2, 64)
    cache, lg0 = with_slot0(cache)
    tok = int(jnp.argmax(lg0))
    fn = jax.jit(partial(prefill_chunk, spec, dtype=jnp.float32))
    off = 0
    while off < len(prompt_b):
        part = prompt_b[off : off + 8]
        valid = len(part)
        padded = np.zeros((8,), np.int32)
        padded[:valid] = part
        cache, logits_int = fn(
            params, cache, jnp.asarray(padded), jnp.int32(off),
            jnp.int32(valid), jnp.int32(1),
        )
        off += valid
        if off < len(prompt_b):
            ids = jnp.zeros((2,), jnp.int32).at[0].set(tok)
            cache, lg = step(params, cache, ids, jnp.asarray([True, False]))
            tok = int(jnp.argmax(lg[0]))

    # slot 1's prompt rows and final-chunk logits are untouched by the
    # interleaved decode traffic
    assert (np.asarray(cache.k)[:, 1, :20]
            == np.asarray(cache_ref.k)[:, 1, :20]).all()
    assert (np.asarray(cache.v)[:, 1, :20]
            == np.asarray(cache_ref.v)[:, 1, :20]).all()
    np.testing.assert_array_equal(
        np.asarray(logits_int), np.asarray(logits_ref)
    )
