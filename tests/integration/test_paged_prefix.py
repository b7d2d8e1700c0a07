"""Paged KV x prefix cache: page-granular zero-copy prefix reuse
(VERDICT r2 item 3 — the composition ban is lifted). A prefix hit makes
the new slot's page table point at the source slot's whole pages with a
refcount bump; released slots RETAIN their grant so hits survive slot
churn, and retention is reclaimed under pool pressure.

No reference counterpart (SURVEY.md section 5.7)."""

import time

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

pytestmark = pytest.mark.slow

PAGE = 8


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    return spec, params


def make_engine(setup, paged, slots=2, pool_pages=0, **kw):
    spec, params = setup
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=slots, max_len=64,
        prefill_buckets=[8, 16, 32], steps_per_sync=2,
        prefill_chunk=16, prefix_cache=True, prefix_cache_min=PAGE,
        kv_page_size=PAGE if paged else 0, kv_pool_pages=pool_pages,
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


SYSTEM = np.arange(1, 25, dtype=np.int32)  # 24-token shared "system prompt"


def _prompts():
    return [
        np.concatenate([SYSTEM, np.asarray([40 + i, 50 + i], np.int32)])
        for i in range(4)
    ]


def test_paged_prefix_matches_dense_prefix(setup):
    """Same tokens, and the paged engine registers page-granular hits."""
    def run(paged):
        eng = make_engine(setup, paged)
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=6)
                for p in _prompts()]
        out = run_requests(eng, reqs)
        return out, eng.prefix_hits, eng.prefix_tokens_reused

    (dense_out, dense_hits, _) = run(False)
    (paged_out, paged_hits, paged_reused) = run(True)
    assert paged_out == dense_out
    assert dense_hits >= 1 and paged_hits >= 1
    # paged reuse is rounded DOWN to whole pages: 24 shared tokens ->
    # 3 full pages of 8 per hit
    assert paged_reused % PAGE == 0
    assert paged_reused >= PAGE * paged_hits


def test_shared_pages_are_zero_copy(setup):
    """A hit's shared pages appear in BOTH slots' tables (same pool
    page ids) while the source is still granted/retained."""
    eng = make_engine(setup, True, slots=2)
    try:
        started = []
        first = GenerationRequest(
            prompt_ids=_prompts()[0], max_new_tokens=30,
            on_token=lambda t: started.append(t))
        eng.submit(first)
        deadline = time.time() + 60
        while not started and time.time() < deadline:
            time.sleep(0.02)  # first is decoding in its slot
        second = GenerationRequest(
            prompt_ids=_prompts()[1], max_new_tokens=4)
        eng.submit(second)
        second.result(timeout=120)
        assert eng.prefix_hits == 1
        grants = [set(p) for p in eng._slot_pages if p]
        assert len(grants) == 2
        shared = grants[0] & grants[1]
        assert len(shared) == 24 // PAGE  # the whole-page prefix
        # refcount 2 on shared pages, 1 elsewhere
        for p in shared:
            assert eng._page_refs[p] == 2
        first.result(timeout=120)
    finally:
        eng.stop()


def test_refcounts_settle_after_churn(setup):
    """After many hits and releases, every page is accounted exactly
    once: refcounts of free pages are 0, granted/retained pages >= 1,
    and free+granted covers the pool."""
    eng = make_engine(setup, True, slots=2)
    try:
        for r in [GenerationRequest(prompt_ids=p, max_new_tokens=5)
                  for p in _prompts() * 2]:
            eng.submit(r)
            r.result(timeout=120)
        deadline = time.time() + 10
        while time.time() < deadline and eng.active_count():
            time.sleep(0.05)
        granted = [p for pages in eng._slot_pages for p in pages]
        free = list(eng._free_pages)
        assert sorted(set(free)) == sorted(free)  # no double-free
        for p in free:
            assert eng._page_refs[p] == 0, p
        for p in set(granted):
            assert eng._page_refs[p] == granted.count(p)
        # every non-garbage page is either free or granted
        assert len(set(free) | set(granted)) == eng.kv_pool_pages - 1
    finally:
        eng.stop()


def test_retention_reclaimed_under_pressure(setup):
    """A pool too small to hold retained grants forever: admissions
    evict retained slots and the engine keeps serving correctly."""
    solo = []
    for p in _prompts():
        eng = make_engine(setup, False, slots=1)
        solo.append(run_requests(
            eng, [GenerationRequest(prompt_ids=p, max_new_tokens=5)])[0])
    # each request needs ceil((26+5)/8)=4 pages; pool of 1+9 usable ->
    # two grants + one retained at most; churn forces eviction
    eng = make_engine(setup, True, slots=2, pool_pages=10)
    got = run_requests(
        eng,
        [GenerationRequest(prompt_ids=p, max_new_tokens=5)
         for p in _prompts()],
    )
    assert got == solo


def test_paged_prefix_speculative_matches(setup):
    """Triple composition: paged x prefix x speculative (dense draft
    cache copies rows; target shares pages)."""
    spec, params = setup
    prompts = _prompts()[:3]

    def run(paged):
        eng = make_engine(setup, paged, draft_spec=spec,
                          draft_params=params, speculate_k=2)
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=6)
                for p in prompts]
        return run_requests(eng, reqs)

    assert run(True) == run(False)


def test_cancellation_storm_keeps_refcounts_sane(setup):
    """Cancel requests at every lifecycle stage while prefix sharing is
    active: page accounting must stay exact and survivors must finish."""
    import threading

    eng = make_engine(setup, True, slots=2, pool_pages=24)
    try:
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=8)
                for p in _prompts() * 3]
        cancel_targets = reqs[::3]
        for i, r in enumerate(reqs):
            eng.submit(r)
            if i % 3 == 0:
                threading.Timer(0.01 * (i % 5), r.cancel).start()
        for r in reqs:
            try:
                r.result(timeout=180)
            except Exception:
                assert r in cancel_targets or r.error is not None
        deadline = time.time() + 10
        while time.time() < deadline and eng.active_count():
            time.sleep(0.05)
        granted = [p for pages in eng._slot_pages for p in pages]
        free = list(eng._free_pages)
        assert sorted(set(free)) == sorted(free)
        for p in free:
            assert eng._page_refs[p] == 0, p
        for p in set(granted):
            assert eng._page_refs[p] == granted.count(p)
        assert len(set(free) | set(granted)) == eng.kv_pool_pages - 1
        # engine still serves after the storm
        out = eng.generate(_prompts()[0], max_new_tokens=4, timeout=120)
        assert len(out) == 4
    finally:
        eng.stop()


def test_prefix_hit_on_actively_decoding_source(setup):
    """Sharing pages from a slot that is STILL DECODING: the source's
    appends land in its own (unshared) pages, so both streams match
    their solo runs."""
    long_prompt = _prompts()[0]
    solo_a = run_requests(
        make_engine(setup, False, slots=1),
        [GenerationRequest(prompt_ids=long_prompt, max_new_tokens=24)])[0]
    solo_b = run_requests(
        make_engine(setup, False, slots=1),
        [GenerationRequest(prompt_ids=_prompts()[1], max_new_tokens=6)])[0]

    eng = make_engine(setup, True, slots=2)
    try:
        started = []
        a = GenerationRequest(prompt_ids=long_prompt, max_new_tokens=24,
                              on_token=lambda t: started.append(t))
        eng.submit(a)
        deadline = time.time() + 60
        while not started and time.time() < deadline:
            time.sleep(0.02)
        b = GenerationRequest(prompt_ids=_prompts()[1], max_new_tokens=6)
        eng.submit(b)
        got_b = b.result(timeout=120)
        got_a = a.result(timeout=120)
        assert got_a == solo_a
        assert got_b == solo_b
        assert eng.prefix_hits == 1
    finally:
        eng.stop()
