"""Engine-level chunked prefill: long prompts admit chunk-by-chunk with
decode blocks interleaved, and concurrent requests are unaffected."""

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    return spec, params


def make_engine(setup, chunk=0, buckets=None):
    spec, params = setup
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=2, max_len=64,
        prefill_buckets=buckets or [8, 32], prefill_chunk=chunk,
    )
    eng.start()
    return eng


LONG = np.asarray(list(range(1, 21)), np.int32)   # 20 tokens > chunk 8
SHORT = np.asarray([3, 7, 11], np.int32)


def run(eng, prompts, n=6):
    try:
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=n)
                for p in prompts]
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=120) for r in reqs]
    finally:
        eng.stop()


def test_chunked_engine_matches_bucket_engine(setup):
    """Greedy tokens from a chunked prefill must match the one-shot
    bucket prefill (validated at the device level in
    tests/unit/test_chunked_prefill.py; this checks the engine plumbing)."""
    bucket_tokens = run(make_engine(setup, chunk=0), [LONG])
    chunk_tokens = run(make_engine(setup, chunk=8), [LONG])
    assert chunk_tokens == bucket_tokens
    assert len(chunk_tokens[0]) == 6


def test_concurrent_short_request_unaffected_by_chunked_prefill(setup):
    """A short request decoding while a long prompt chunk-prefills into
    another slot must produce exactly the tokens it produces alone
    (per-slot attention is row-independent; the parked inactive-slot
    write never lands on live rows)."""
    alone = run(make_engine(setup, chunk=8), [SHORT])[0]
    together = run(make_engine(setup, chunk=8), [SHORT, LONG])
    assert together[0] == alone


def test_prompt_longer_than_largest_bucket_uses_chunks(setup):
    """With chunking on, prompts past the largest bucket are served
    instead of rejected."""
    eng = make_engine(setup, chunk=8, buckets=[8])
    tokens = run(eng, [LONG])[0]
    assert len(tokens) == 6


def test_over_bucket_prompt_rejected_at_submit_without_chunking(setup):
    """With chunking off, a prompt past the largest bucket must fail at
    submit() (synchronously, so the gRPC layer maps it to
    INVALID_ARGUMENT) — and the engine must keep serving afterwards.
    Regression: this used to raise inside the engine loop after the
    request left _pending, never setting its done event (client hang)
    and killing the engine thread."""
    eng = make_engine(setup, chunk=0, buckets=[8])
    try:
        with pytest.raises(ValueError, match="prefill bucket"):
            eng.submit(GenerationRequest(prompt_ids=LONG, max_new_tokens=4))
        survivor = GenerationRequest(prompt_ids=SHORT, max_new_tokens=4)
        eng.submit(survivor)
        assert len(survivor.result(timeout=120)) == 4
    finally:
        eng.stop()


def test_chunk_must_divide_max_len(setup):
    spec, params = setup
    with pytest.raises(ValueError, match="must divide"):
        GenerationEngine(spec, params, dtype=jnp.float32, num_slots=2,
                         max_len=64, prefill_chunk=7)
