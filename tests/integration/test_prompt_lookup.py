"""Prompt-lookup speculative decoding: n-gram drafts from the
sequence's own history must reproduce the plain engine's output exactly
(lossless verify contract, same as model-draft speculation) while
needing no draft model at all. Net-new vs the reference (no decoders
there — SURVEY.md section 5.7)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    get_spec,
    init_params,
)
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
    _ngram_drafts,
)

TINY = {"layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
        "intermediate": 256, "vocab": 128}


@pytest.fixture(scope="module")
def target():
    spec = get_spec("llama-tiny", TINY)
    return spec, init_params(spec, np.random.default_rng(0))


def _make_engine(target, **kw):
    spec, params = target
    kw.setdefault("num_slots", 4)
    kw.setdefault("max_len", 64)
    kw.setdefault("prefill_buckets", [8, 16])
    eng = GenerationEngine(spec, params, dtype=jnp.float32, **kw)
    eng.start()
    return eng


def _drain(eng, prompts, max_new=10, **req_kw):
    try:
        reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                  max_new_tokens=max_new, **req_kw)
                for p in prompts]
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=120.0) for r in reqs]
    finally:
        eng.stop()


# -- the draft proposal function itself --------------------------------------

def test_ngram_drafts_finds_continuation():
    # slot 0: ... 5 6 7 9 | 5 6  -> query (5,6) matches at pos 0, drafts 7 9
    hist = np.zeros((2, 16), np.int32)
    hist[0, :6] = [5, 6, 7, 9, 5, 6]
    hist[1, :5] = [1, 2, 3, 4, 5]          # no repeated bigram
    len_h = jnp.asarray([6, 5], jnp.int32)
    drafts, found = _ngram_drafts(jnp.asarray(hist), len_h, k=3, n=2)
    drafts, found = np.asarray(drafts), np.asarray(found)
    assert found[0] and not found[1]
    # continuation after the match at pos 0: positions 2,3,4 = 7, 9, 5
    assert drafts[0].tolist() == [7, 9, 5]
    assert drafts[1].tolist() == [0, 0, 0]


def test_ngram_drafts_prefers_most_recent_match():
    # 1 2 9 | 1 2 7 | 1 2  -> two matches; the LAST one (continuation 7)
    hist = np.zeros((1, 16), np.int32)
    hist[0, :8] = [1, 2, 9, 1, 2, 7, 1, 2]
    drafts, found = _ngram_drafts(
        jnp.asarray(hist), jnp.asarray([8], jnp.int32), k=2, n=2
    )
    assert bool(np.asarray(found)[0])
    assert np.asarray(drafts)[0, 0] == 7


def test_ngram_drafts_never_reads_past_len_h():
    # stale garbage beyond len_h (a previous request's tokens) must not
    # be drafted
    hist = np.full((1, 16), 99, np.int32)
    hist[0, :4] = [1, 2, 1, 2]
    drafts, found = _ngram_drafts(
        jnp.asarray(hist), jnp.asarray([4], jnp.int32), k=4, n=2
    )
    assert bool(np.asarray(found)[0])
    # match at pos 0, continuation = pos 2,3 = [1, 2]; pos 4+ masked to 0
    assert np.asarray(drafts)[0].tolist() == [1, 2, 0, 0]


# -- engine parity (lossless contract) ---------------------------------------

def test_lookup_matches_plain_greedy(target):
    prompts = [np.asarray([3, 7, 11, 2], np.int32),
               np.asarray([9, 9, 9], np.int32),
               np.asarray([1, 2, 3, 4, 5], np.int32)]
    refs = _drain(_make_engine(target), prompts, 14)
    got = _drain(
        _make_engine(target, prompt_lookup_ngram=2, speculate_k=4),
        prompts, 14,
    )
    assert got == refs


def test_lookup_sampled_matches_plain(target):
    kw = dict(temperature=0.8, top_k=5, seed=42)
    prompts = [np.asarray([3, 7, 11, 2], np.int32)]
    refs = _drain(_make_engine(target), prompts, 8, **kw)
    got = _drain(
        _make_engine(target, prompt_lookup_ngram=2, speculate_k=3),
        prompts, 8, **kw,
    )
    assert got == refs


def test_lookup_with_steps_per_sync_and_overlap(target):
    prompts = [np.asarray([5, 6, 7], np.int32),
               np.asarray([8, 1], np.int32)]
    refs = _drain(_make_engine(target), prompts, 12)
    got = _drain(
        _make_engine(target, prompt_lookup_ngram=2, speculate_k=3,
                     steps_per_sync=2, decode_overlap=True,
                     pipeline_depth=3),
        prompts, 12,
    )
    assert got == refs


def test_lookup_repetitive_output_accepts_drafts(target):
    """Greedy decoding from a random tiny model falls into a short cycle
    — exactly the repetition prompt-lookup exploits. Acceptance must be
    strictly positive and the token stream still equals plain greedy."""
    prompt = np.asarray([3, 7, 11, 2], np.int32)
    refs = _drain(_make_engine(target), [prompt], 48)
    eng = _make_engine(target, prompt_lookup_ngram=2, speculate_k=4)
    got = _drain(eng, [prompt], 48)
    assert got == refs
    assert eng.drafted_tokens > 0
    assert eng.accepted_drafts > 0, (
        "greedy cycle never matched — acceptance machinery broken "
        f"(refs tail: {refs[0][-16:]})"
    )
    # fewer verify blocks than tokens -> speculation actually advanced
    # multiple tokens per forward
    assert eng.steps < 48


def test_lookup_eos_and_staggered_budgets(target):
    prompts = [np.asarray([3, 7, 11, 2], np.int32),
               np.asarray([1, 4], np.int32),
               np.asarray([9, 9, 9], np.int32)]
    budgets = [5, 17, 11]
    refs = [_drain(_make_engine(target), [p], b)[0]
            for p, b in zip(prompts, budgets)]
    eng = _make_engine(target, prompt_lookup_ngram=2, speculate_k=4,
                       steps_per_sync=2, decode_overlap=True)
    try:
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=b)
                for p, b in zip(prompts, budgets)]
        for r in reqs:
            eng.submit(r)
        got = [r.result(timeout=120) for r in reqs]
        assert got == refs
        assert [len(t) for t in got] == budgets
    finally:
        eng.stop()


def test_lookup_slot_reuse_is_isolated(target):
    """A reused slot's stale history (previous request's tokens) must
    never corrupt a later request: run two waves through the same tiny
    engine and compare with fresh-engine outputs."""
    wave1 = [np.asarray([3, 7, 11, 2], np.int32)]
    wave2 = [np.asarray([1, 2, 3], np.int32)]
    ref1 = _drain(_make_engine(target), wave1, 10)
    ref2 = _drain(_make_engine(target), wave2, 10)
    eng = _make_engine(target, prompt_lookup_ngram=2, speculate_k=4,
                       num_slots=1)
    try:
        got1 = [eng.generate(wave1[0], max_new_tokens=10, timeout=120)]
        got2 = [eng.generate(wave2[0], max_new_tokens=10, timeout=120)]
        assert got1 == ref1
        assert got2 == ref2
    finally:
        eng.stop()


def test_lookup_composes_with_paged_kv(target):
    prompts = [np.asarray([3, 7, 11, 2], np.int32),
               np.asarray([1, 4], np.int32)]
    refs = _drain(_make_engine(target), prompts, 12)
    got = _drain(
        _make_engine(target, prompt_lookup_ngram=2, speculate_k=3,
                     kv_page_size=16, kv_pool_pages=17),
        prompts, 12,
    )
    assert got == refs


def test_lookup_composes_with_prefix_cache(target):
    shared = np.asarray([7, 7, 3, 9, 1, 5, 2, 8] * 2, np.int32)  # len 16
    p1 = np.concatenate([shared, [4]]).astype(np.int32)
    p2 = np.concatenate([shared, [6]]).astype(np.int32)
    ref_eng = _make_engine(target, prefill_buckets=[8, 16, 32])
    refs = _drain(ref_eng, [p1, p2], 8)
    eng = _make_engine(target, prompt_lookup_ngram=2, speculate_k=3,
                       prefix_cache=True, prefix_cache_min=8,
                       prefill_chunk=8, prefill_buckets=[8, 16, 32])
    try:
        got1 = eng.generate(p1, max_new_tokens=8, timeout=120)
        got2 = eng.generate(p2, max_new_tokens=8, timeout=120)
        assert [got1, got2] == refs
        assert eng.prefix_hits >= 1
    finally:
        eng.stop()


def test_lookup_rejects_draft_model_combo(target):
    spec, params = target
    with pytest.raises(ValueError, match="mutually exclusive"):
        GenerationEngine(
            spec, params, dtype=jnp.float32,
            draft_spec=spec, draft_params=params,
            prompt_lookup_ngram=2,
        )


def test_lookup_headroom_is_k(target):
    """Same admission headroom contract as model-draft speculation: the
    verify window writes K uncommitted rows."""
    k = 3
    eng = _make_engine(target, prompt_lookup_ngram=2, speculate_k=k,
                       max_len=32)
    try:
        prompt = np.asarray([5, 4, 3, 2], np.int32)
        fits = 32 - len(prompt) - k
        with pytest.raises(ValueError, match="headroom"):
            eng.submit(GenerationRequest(prompt_ids=prompt,
                                         max_new_tokens=fits + 1))
        req = GenerationRequest(prompt_ids=prompt, max_new_tokens=fits)
        eng.submit(req)
        assert len(req.result(timeout=120)) == fits
    finally:
        eng.stop()
