"""Generation-request cancellation: pending requests drop at admission,
in-flight chunked prefills abort, active slots release at the next sync
block, and the slot is immediately reusable — the decoder analogue of
the batch pipeline's cancel wiring (reference:
inference_service_async.cpp:392-444, handle_cancelled_job
starpu_task_worker.cpp:688-693)."""

import threading
import time

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


def make_engine(setup, slots=1, overlap=False, **kw):
    spec, params = setup
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=slots, max_len=256,
        prefill_buckets=[8], steps_per_sync=2, decode_overlap=overlap,
        **kw,
    )
    eng.start()
    return eng


def test_cancel_active_releases_slot(setup):
    eng = make_engine(setup)
    try:
        long_req = GenerationRequest(
            prompt_ids=np.asarray([3, 7], np.int32), max_new_tokens=200)
        eng.submit(long_req)
        while len(long_req.tokens) < 4:  # running
            time.sleep(0.01)
        long_req.cancel()
        long_req.done.wait(timeout=60)
        assert long_req.done.is_set()
        assert len(long_req.tokens) < 200
        # the slot must be free for the next request
        out = eng.generate(np.asarray([5, 2], np.int32), max_new_tokens=4,
                           timeout=60)
        assert len(out) == 4
    finally:
        eng.stop()


def test_cancel_active_with_overlap(setup):
    eng = make_engine(setup, overlap=True)
    try:
        req = GenerationRequest(
            prompt_ids=np.asarray([3, 7], np.int32), max_new_tokens=200)
        eng.submit(req)
        while len(req.tokens) < 4:
            time.sleep(0.01)
        req.cancel()
        req.done.wait(timeout=60)
        assert req.done.is_set() and len(req.tokens) < 200
        out = eng.generate(np.asarray([5, 2], np.int32), max_new_tokens=4,
                           timeout=60)
        assert len(out) == 4
    finally:
        eng.stop()


def test_cancel_pending_drops_at_admission(setup):
    eng = make_engine(setup)
    try:
        blocker = GenerationRequest(
            prompt_ids=np.asarray([3, 7], np.int32), max_new_tokens=40)
        pending = GenerationRequest(
            prompt_ids=np.asarray([5, 2], np.int32), max_new_tokens=40)
        eng.submit(blocker)
        eng.submit(pending)  # queued: only one slot
        pending.cancel()
        blocker.result(timeout=120)
        assert pending.done.wait(timeout=60)
        assert pending.tokens == []
    finally:
        eng.stop()


def test_cancel_during_chunked_prefill(setup):
    eng = make_engine(setup, prefill_chunk=8)
    try:
        prompt = np.arange(1, 41, dtype=np.int32)  # 5 chunks of 8
        req = GenerationRequest(prompt_ids=prompt, max_new_tokens=20)
        req.cancel()  # cancelled before (or during) prefill
        eng.submit(req)
        assert req.done.wait(timeout=60)
        assert req.tokens == []
        # engine still serves
        out = eng.generate(np.asarray([5, 2], np.int32), max_new_tokens=4,
                           timeout=60)
        assert len(out) == 4
    finally:
        eng.stop()


def test_cancel_after_completion_is_noop(setup):
    eng = make_engine(setup)
    try:
        req = GenerationRequest(
            prompt_ids=np.asarray([3, 7], np.int32), max_new_tokens=5)
        eng.submit(req)
        toks = req.result(timeout=120)
        req.cancel()
        assert req.tokens == toks and len(toks) == 5
        out = eng.generate(np.asarray([5, 2], np.int32), max_new_tokens=4,
                           timeout=60)
        assert len(out) == 4
    finally:
        eng.stop()


def test_concurrent_cancel_storm(setup):
    """Many requests cancelled from another thread while generating:
    every request's done event fires, and the engine keeps serving."""
    eng = make_engine(setup, slots=2)
    try:
        reqs = [GenerationRequest(
            prompt_ids=np.asarray([i + 1, i + 2], np.int32),
            max_new_tokens=60) for i in range(8)]
        for r in reqs:
            eng.submit(r)

        def cancel_all():
            for r in reqs:
                time.sleep(0.02)
                r.cancel()

        t = threading.Thread(target=cancel_all)
        t.start()
        for r in reqs:
            assert r.done.wait(timeout=120)
        t.join()
        out = eng.generate(np.asarray([5, 2], np.int32), max_new_tokens=4,
                           timeout=60)
        assert len(out) == 4
    finally:
        eng.stop()
