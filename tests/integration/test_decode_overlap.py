"""Overlapped decode dispatch (decode_overlap=True) keeps one block in
flight — block N+1 is dispatched from the device-resident carry before
block N's tokens are fetched — and must be BITWISE-identical to the
synchronous engine for greedy and seeded-sampling output, across slot
churn (release + re-admit) and speculative decoding.

No reference counterpart (the reference has no decoders; SURVEY.md
section 5.7) — this guards the TPU-native continuous-batching engine's
exactly-once token-commit contract under overlapped dispatch, the same
terminal-state discipline SURVEY.md section 5.2 describes for batch jobs.
"""

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


def make_engine(setup, overlap, steps=4, slots=2, **kw):
    spec, params = setup
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=slots, max_len=96,
        prefill_buckets=[8], steps_per_sync=steps, decode_overlap=overlap,
        **kw,
    )
    eng.start()
    return eng


def run_requests(eng, reqs):
    try:
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=180) for r in reqs]
    finally:
        eng.stop()


def test_overlap_matches_sync_greedy(setup):
    prompts = [np.asarray([3, 7, 11], np.int32),
               np.asarray([5, 2], np.int32)]

    def run(overlap):
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=9)
                for p in prompts]
        return run_requests(make_engine(setup, overlap), reqs)

    assert run(True) == run(False)


def test_overlap_matches_sync_sampled(setup):
    prompts = [np.asarray([3, 7, 11], np.int32),
               np.asarray([5, 2], np.int32)]

    def run(overlap):
        reqs = [
            GenerationRequest(prompt_ids=prompts[0], max_new_tokens=9,
                              temperature=0.8, top_k=20, seed=123),
            GenerationRequest(prompt_ids=prompts[1], max_new_tokens=9,
                              temperature=1.1, seed=7),
        ]
        return run_requests(make_engine(setup, overlap), reqs)

    assert run(True) == run(False)


def test_overlap_slot_churn_matches_solo(setup):
    """More requests than slots forces release + re-admit mid-stream;
    every request must still match its solo greedy run (an overlapped
    block dispatched for a released slot must never leak tokens into
    the slot's next occupant)."""
    prompts = [np.asarray([i + 1, 2 * i + 3], np.int32) for i in range(6)]

    solo = []
    for p in prompts:
        eng = make_engine(setup, False, steps=1, slots=1)
        solo.append(run_requests(eng, [GenerationRequest(
            prompt_ids=p, max_new_tokens=8)])[0])

    eng = make_engine(setup, True, steps=3, slots=2)
    reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=8)
            for p in prompts]
    got = run_requests(eng, reqs)
    assert got == solo


def test_overlap_eos_truncates(setup):
    probe_eng = make_engine(setup, False, steps=1)
    probe = run_requests(
        probe_eng,
        [GenerationRequest(prompt_ids=np.asarray([9, 9], np.int32),
                           max_new_tokens=8)],
    )[0]
    eos = probe[3]

    eng = make_engine(setup, True, steps=3)
    got = run_requests(
        eng,
        [GenerationRequest(prompt_ids=np.asarray([9, 9], np.int32),
                           max_new_tokens=8, eos_id=eos)],
    )[0]
    assert got == probe[:4]


def test_overlap_headroom_enforced(setup):
    """Device-side completion removes the overlap headroom: in-flight
    blocks freeze a finished slot on device, so prompt + max_new may
    fill the whole context even with blocks in flight; one token more
    is rejected at the door."""
    spec, params = setup
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=1, max_len=32,
        prefill_buckets=[8], steps_per_sync=8, decode_overlap=True,
    )
    # prompt 4 + max_new 28 = 32 fits exactly
    eng.submit(GenerationRequest(
        prompt_ids=np.asarray([1, 2, 3, 4], np.int32), max_new_tokens=28))
    with pytest.raises(ValueError):
        eng.submit(GenerationRequest(
            prompt_ids=np.asarray([1, 2, 3, 4], np.int32),
            max_new_tokens=29))


def test_overlap_speculative_matches_sync(setup):
    spec, params = setup
    draft_spec = get_spec("llama-tiny", {"layers": 1, "hidden": 64,
                                         "q_heads": 2, "kv_heads": 1,
                                         "intermediate": 128, "vocab": 128})
    draft_params = init_params(draft_spec, np.random.default_rng(1))
    prompts = [np.asarray([3, 7, 11], np.int32),
               np.asarray([5, 2], np.int32)]

    def run(overlap):
        eng = make_engine(setup, overlap, steps=2,
                          draft_spec=draft_spec, draft_params=draft_params,
                          speculate_k=3)
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=9)
                for p in prompts]
        return run_requests(eng, reqs)

    assert run(True) == run(False)
