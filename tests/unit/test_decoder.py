"""Decoder + KV-cache correctness: incremental decode with the INT8
cache must reproduce full teacher-forcing argmax decoding."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models import build_model
from starpu_inference_server_tpu.models.decoder import (
    decode_step,
    forward_logits,
    get_spec,
    init_cache,
    init_params,
    prefill,
)
from starpu_inference_server_tpu.utils.config import ModelSettings


@pytest.fixture(scope="module")
def tiny():
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    return spec, params


def test_forward_logits_shape(tiny):
    spec, params = tiny
    ids = np.random.default_rng(1).integers(0, spec.vocab, (2, 12), np.int32)
    logits = forward_logits(spec, params, jnp.asarray(ids), jnp.float32)
    assert logits.shape == (2, 12, spec.vocab)
    assert bool(jnp.all(jnp.isfinite(logits)))


def test_causality(tiny):
    """Changing a future token must not change past logits."""
    spec, params = tiny
    rng = np.random.default_rng(2)
    ids = rng.integers(0, spec.vocab, (1, 10), np.int32)
    la = forward_logits(spec, params, jnp.asarray(ids), jnp.float32)
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % spec.vocab
    lb = forward_logits(spec, params, jnp.asarray(ids2), jnp.float32)
    np.testing.assert_allclose(
        np.asarray(la[0, :-1]), np.asarray(lb[0, :-1]), rtol=1e-5, atol=1e-5
    )


def test_prefill_then_decode_matches_full_forward(tiny):
    """Greedy generation via prefill + int8-cache decode must match
    greedy generation via repeated full forwards (teacher forcing)."""
    spec, params = tiny
    rng = np.random.default_rng(3)
    prompt = rng.integers(0, spec.vocab, (6,), np.int32)
    steps = 5

    # reference: argmax over repeated full forward
    ref_tokens = []
    seq = list(prompt)
    for _ in range(steps):
        logits = forward_logits(
            spec, params, jnp.asarray([seq], jnp.int32), jnp.float32
        )
        nxt = int(jnp.argmax(logits[0, -1]))
        ref_tokens.append(nxt)
        seq.append(nxt)

    # engine path: prefill + decode_step
    cache = init_cache(spec, num_slots=2, max_len=32)
    cache, logits = prefill(
        spec, params, cache, jnp.asarray(prompt), jnp.int32(len(prompt)),
        jnp.int32(0), jnp.float32,
    )
    got = [int(jnp.argmax(logits))]
    active = jnp.asarray([True, False])
    for _ in range(steps - 1):
        ids = jnp.asarray([got[-1], 0], jnp.int32)
        cache, logits = decode_step(spec, params, cache, ids, active, jnp.float32)
        got.append(int(jnp.argmax(logits[0])))

    # int8 KV quantization may only rarely flip an argmax on random
    # weights; require exact match on this configuration
    assert got == ref_tokens


def test_decode_slots_are_independent(tiny):
    """Two slots decoding concurrently must produce the same tokens as
    each decoding alone."""
    spec, params = tiny
    rng = np.random.default_rng(4)
    p1 = rng.integers(0, spec.vocab, (5,), np.int32)
    p2 = rng.integers(0, spec.vocab, (7,), np.int32)

    def solo(prompt, steps=4):
        cache = init_cache(spec, 1, 32)
        cache, logits = prefill(
            spec, params, cache, jnp.asarray(prompt),
            jnp.int32(len(prompt)), jnp.int32(0), jnp.float32,
        )
        toks = [int(jnp.argmax(logits))]
        for _ in range(steps):
            cache, logits = decode_step(
                spec, params, cache, jnp.asarray([toks[-1]], jnp.int32),
                jnp.asarray([True]), jnp.float32,
            )
            toks.append(int(jnp.argmax(logits[0])))
        return toks

    ref1, ref2 = solo(p1), solo(p2)

    cache = init_cache(spec, 2, 32)
    cache, l1 = prefill(spec, params, cache, jnp.asarray(p1),
                        jnp.int32(len(p1)), jnp.int32(0), jnp.float32)
    cache, l2 = prefill(spec, params, cache, jnp.asarray(p2),
                        jnp.int32(len(p2)), jnp.int32(1), jnp.float32)
    toks = [[int(jnp.argmax(l1))], [int(jnp.argmax(l2))]]
    for _ in range(4):
        ids = jnp.asarray([toks[0][-1], toks[1][-1]], jnp.int32)
        cache, logits = decode_step(
            spec, params, cache, ids, jnp.asarray([True, True]), jnp.float32
        )
        toks[0].append(int(jnp.argmax(logits[0])))
        toks[1].append(int(jnp.argmax(logits[1])))

    assert toks[0] == ref1
    assert toks[1] == ref2


def test_registry_families():
    model = build_model(
        ModelSettings(
            family="llama-tiny",
            options={"layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
                     "intermediate": 256, "vocab": 128, "seq_len": 8},
            compute_dtype="FP32",
        ),
        seed=0,
    )
    ids = np.zeros((1, 8), np.int64)
    out = model.apply({"input_ids": jnp.asarray(ids)})
    assert out["logits"].shape == (1, 8, 128)
