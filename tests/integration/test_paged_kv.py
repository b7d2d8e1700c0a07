"""Paged KV cache (models/paged_decoder.py + the GenerationEngine's
page allocator): output parity vs the dense cache, pool-exhaustion
backpressure, page recycling across slot churn, and composition with
chunked prefill / speculative decoding / overlapped dispatch.

No reference counterpart (the reference has no decoders or KV cache;

SURVEY.md section 5.7) — this guards VERDICT round-1 item 3: slot count
must scale with demand instead of preallocating num_slots x max_len.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    return spec, params


def make_engine(setup, paged, page=8, pool_pages=0, slots=2, steps=2,
                max_len=64, **kw):
    spec, params = setup
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=slots, max_len=max_len,
        prefill_buckets=[8, 16], steps_per_sync=steps,
        kv_page_size=page if paged else 0,
        kv_pool_pages=pool_pages,
        **kw,
    )
    eng.start()
    return eng


def run_requests(eng, reqs, timeout=180):
    try:
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=timeout) for r in reqs]
    finally:
        eng.stop()


def test_paged_matches_dense_greedy(setup):
    prompts = [np.asarray([3, 7, 11], np.int32),
               np.asarray([5, 2, 9, 1, 13], np.int32)]

    def run(paged):
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=9)
                for p in prompts]
        return run_requests(make_engine(setup, paged), reqs)

    assert run(True) == run(False)


def test_paged_matches_dense_sampled(setup):
    def run(paged):
        reqs = [
            GenerationRequest(prompt_ids=np.asarray([3, 7, 11], np.int32),
                              max_new_tokens=9, temperature=0.8, top_k=20,
                              seed=123),
            GenerationRequest(prompt_ids=np.asarray([5, 2], np.int32),
                              max_new_tokens=9, temperature=1.1, seed=7),
        ]
        return run_requests(make_engine(setup, paged), reqs)

    assert run(True) == run(False)


def test_paged_with_overlap_matches_dense(setup):
    prompts = [np.asarray([i + 1, 2 * i + 3], np.int32) for i in range(5)]

    def run(paged):
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=7)
                for p in prompts]
        return run_requests(
            make_engine(setup, paged, steps=3, decode_overlap=True,
                        pipeline_depth=3),
            reqs,
        )

    assert run(True) == run(False)


def test_paged_chunked_prefill_matches_dense(setup):
    """Long prompt through the paged chunked-prefill path (chunk = 2
    pages) must match the dense chunked engine."""
    prompt = np.arange(1, 29, dtype=np.int32)  # 28 tokens > bucket 16

    def run(paged):
        eng = make_engine(setup, paged, prefill_chunk=16)
        return run_requests(
            eng, [GenerationRequest(prompt_ids=prompt, max_new_tokens=6)]
        )

    assert run(True) == run(False)


def test_pool_exhaustion_queues_and_recovers(setup):
    """A pool sized for ~one request at a time forces later requests to
    wait for page frees; all must still complete, FIFO, with correct
    output."""
    prompts = [np.asarray([i + 2, i + 5, i + 1], np.int32) for i in range(4)]
    solo = []
    for p in prompts:
        eng = make_engine(setup, True, slots=1)
        solo.append(run_requests(
            eng, [GenerationRequest(prompt_ids=p, max_new_tokens=6)])[0])

    # need per request: ceil((3 + 6 + steps*1 - 1) / 8) = 2 pages
    # pool of 1 + 3 pages: one request in flight, one more can start
    eng = make_engine(setup, True, pool_pages=4, slots=2)
    reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=6)
            for p in prompts]
    got = run_requests(eng, reqs)
    assert got == solo
    # all pages returned to the pool after completion
    assert sorted(eng._free_pages) == [1, 2, 3]


def test_page_recycling_no_cross_talk(setup):
    """Slot churn recycles pages between requests; each request must
    match its solo run (a recycled page must never leak stale KV)."""
    prompts = [np.asarray([i + 1, 2 * i + 3], np.int32) for i in range(6)]
    solo = []
    for p in prompts:
        eng = make_engine(setup, True, slots=1)
        solo.append(run_requests(
            eng, [GenerationRequest(prompt_ids=p, max_new_tokens=8)])[0])

    eng = make_engine(setup, True, slots=2, steps=3, decode_overlap=True)
    got = run_requests(
        eng,
        [GenerationRequest(prompt_ids=p, max_new_tokens=8) for p in prompts],
    )
    assert got == solo


def test_paged_speculative_matches_dense(setup):
    spec, params = setup
    draft_spec = get_spec("llama-tiny", {"layers": 1, "hidden": 64,
                                         "q_heads": 2, "kv_heads": 1,
                                         "intermediate": 128, "vocab": 128})
    draft_params = init_params(draft_spec, np.random.default_rng(1))
    prompts = [np.asarray([3, 7, 11], np.int32),
               np.asarray([5, 2], np.int32)]

    def run(paged):
        eng = make_engine(setup, paged, steps=2, draft_spec=draft_spec,
                          draft_params=draft_params, speculate_k=3)
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=9)
                for p in prompts]
        return run_requests(eng, reqs)

    assert run(True) == run(False)


def test_paged_rejects_bad_compositions(setup):
    spec, params = setup
    with pytest.raises(ValueError, match="multiple of kv_page_size"):
        GenerationEngine(spec, params, num_slots=2, max_len=64,
                         prefill_buckets=[8], kv_page_size=8,
                         prefill_chunk=4)
    with pytest.raises(ValueError, match="must divide"):
        GenerationEngine(spec, params, num_slots=2, max_len=60,
                         prefill_buckets=[8], kv_page_size=8)


def test_paged_cancellation_frees_pages(setup):
    """Cancelling a pending/active request returns its pages."""
    eng = make_engine(setup, True, pool_pages=8, slots=2)
    try:
        free0 = len(eng._free_pages) + sum(
            len(p) for p in eng._slot_pages
        )
        reqs = [GenerationRequest(prompt_ids=np.asarray([3, 7], np.int32),
                                  max_new_tokens=20) for _ in range(3)]
        for r in reqs:
            eng.submit(r)
        reqs[2].cancel()
        for r in reqs:
            try:
                r.result(timeout=120)
            except Exception:
                pass
        # quiesce: everything released -> all pages free again
        deadline = 50
        import time
        while len(eng._free_pages) != free0 and deadline:
            time.sleep(0.1)
            deadline -= 1
        assert len(eng._free_pages) == free0
    finally:
        eng.stop()
