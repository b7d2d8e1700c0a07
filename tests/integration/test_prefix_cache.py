"""Prefix caching: requests sharing a prompt prefix reuse the resident
KV rows of a completed slot (device-side row copy + tail-only prefill)
and must produce exactly the tokens the uncached engine produces."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

TINY = {"layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
        "intermediate": 256, "vocab": 128}


@pytest.fixture(scope="module")
def model():
    spec = get_spec("llama-tiny", TINY)
    return spec, init_params(spec, np.random.default_rng(0))


def _engine(model, **kw):
    spec, params = model
    kw.setdefault("num_slots", 2)
    kw.setdefault("max_len", 96)
    kw.setdefault("prefill_buckets", [8, 16, 32])
    kw.setdefault("prefill_chunk", 8)
    kw.setdefault("steps_per_sync", 2)
    return GenerationEngine(spec, params, dtype=jnp.float32, **kw)


def _run(eng, prompts, max_new=6):
    eng.start()
    try:
        reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                  max_new_tokens=max_new) for p in prompts]
        out = []
        for r in reqs:  # sequential: each completes before the next admits
            eng.submit(r)
            out.append(r.result(timeout=120.0))
        return out
    finally:
        eng.stop()


def test_prefix_hit_reuses_rows_and_matches(model):
    rng = np.random.default_rng(1)
    system = rng.integers(0, 128, (24,), np.int32)       # shared prefix
    prompts = [
        np.concatenate([system, rng.integers(0, 128, (6,), np.int32)]),
        np.concatenate([system, rng.integers(0, 128, (9,), np.int32)]),
        np.concatenate([system, rng.integers(0, 128, (3,), np.int32)]),
    ]

    plain = _engine(model)
    want = _run(plain, prompts)
    assert plain.prefix_hits == 0  # disabled by default

    cached = _engine(model, prefix_cache=True)
    got = _run(cached, prompts)
    assert got == want
    # requests 2 and 3 hit request 1's retained prefix
    assert cached.prefix_hits == 2
    assert cached.prefix_tokens_reused >= 2 * len(system) - 2


def test_identical_prompt_reuses_all_but_one_row(model):
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, 128, (20,), np.int32)
    cached = _engine(model, prefix_cache=True)
    got = _run(cached, [prompt, prompt])
    assert got[0] == got[1]
    assert cached.prefix_hits == 1
    assert cached.prefix_tokens_reused == len(prompt) - 1


def test_prefix_cache_with_speculation(model):
    spec, params = model
    rng = np.random.default_rng(3)
    system = rng.integers(0, 128, (18,), np.int32)
    prompts = [
        np.concatenate([system, rng.integers(0, 128, (5,), np.int32)]),
        np.concatenate([system, rng.integers(0, 128, (7,), np.int32)]),
    ]
    plain = _engine(model)
    want = _run(plain, prompts)

    draft_spec = get_spec("llama-tiny", {
        "layers": 1, "hidden": 64, "q_heads": 2, "kv_heads": 1,
        "intermediate": 96, "vocab": 128,
    })
    cached = _engine(
        model, prefix_cache=True, draft_spec=draft_spec,
        draft_params=init_params(draft_spec, np.random.default_rng(4)),
        speculate_k=3,
    )
    got = _run(cached, prompts)
    assert got == want
    assert cached.prefix_hits == 1


def test_prefix_cache_requires_chunked_prefill(model):
    with pytest.raises(ValueError, match="prefix_cache"):
        _engine(model, prefix_cache=True, prefill_chunk=0)
