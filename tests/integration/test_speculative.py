"""Speculative decoding: draft-then-verify must reproduce the plain
engine's output exactly (greedy AND sampled), for strong and weak
drafts, while committing multiple tokens per verify when drafts land."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    decode_step,
    get_spec,
    init_cache,
    init_params,
    prefill,
    verify_step,
)
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

TINY = {"layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
        "intermediate": 256, "vocab": 128}
DRAFT = {"layers": 1, "hidden": 64, "q_heads": 2, "kv_heads": 1,
         "intermediate": 128, "vocab": 128}


@pytest.fixture(scope="module")
def target():
    spec = get_spec("llama-tiny", TINY)
    return spec, init_params(spec, np.random.default_rng(0))


def _make_engine(target, draft_params_seed=None, draft_spec_opts=None,
                 same_as_target=False, **kw):
    spec, params = target
    draft_spec = None
    draft_params = None
    if same_as_target:
        draft_spec, draft_params = spec, params
    elif draft_params_seed is not None:
        draft_spec = get_spec("llama-tiny", draft_spec_opts or DRAFT)
        draft_params = init_params(
            draft_spec, np.random.default_rng(draft_params_seed)
        )
    kw.setdefault("num_slots", 4)
    kw.setdefault("max_len", 64)
    kw.setdefault("prefill_buckets", [8, 16])
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32,
        draft_spec=draft_spec, draft_params=draft_params, **kw,
    )
    eng.start()
    return eng


def test_verify_step_matches_sequential_decode(target):
    """verify_step over a W-window must produce the same logits as W
    sequential decode_steps fed the same tokens."""
    spec, params = target
    prompt = np.asarray([3, 7, 11, 2], np.int32)
    window = np.asarray([[5, 9, 4, 1]], np.int32)  # [S=1, W=4]

    cache_a = init_cache(spec, 1, 32)
    cache_a, _ = prefill(spec, params, cache_a, jnp.asarray(prompt),
                         jnp.int32(len(prompt)), jnp.int32(0), jnp.float32)
    import jax

    cache_b = jax.tree.map(lambda x: x, cache_a)

    seq_logits = []
    for tok in window[0]:
        cache_a, lg = decode_step(
            spec, params, cache_a, jnp.asarray([tok], jnp.int32),
            jnp.asarray([True]), jnp.float32,
        )
        seq_logits.append(np.asarray(lg[0]))

    cache_b, ver = verify_step(
        spec, params, cache_b, jnp.asarray(window), jnp.asarray([True]),
        jnp.float32,
    )
    # lengths must NOT advance (the caller commits)
    assert int(cache_b.lengths[0]) == len(prompt)
    np.testing.assert_allclose(
        np.asarray(ver[0]), np.stack(seq_logits), rtol=2e-4, atol=2e-4
    )


def _plain_tokens(target, prompts, max_new, **req_kw):
    eng = _make_engine(target)
    try:
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=max_new,
                                  **req_kw) for p in prompts]
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=120) for r in reqs]
    finally:
        eng.stop()


def test_perfect_draft_accepts_everything(target):
    """Draft == target: every draft is accepted, output identical, and
    each sync commits K+1 tokens per slot."""
    prompts = [np.asarray([3, 7, 11, 2], np.int32),
               np.asarray([1, 4], np.int32)]
    refs = _plain_tokens(target, prompts, 12)
    eng = _make_engine(target, same_as_target=True, speculate_k=3)
    try:
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=12)
                for p in prompts]
        for r in reqs:
            eng.submit(r)
        got = [r.result(timeout=120) for r in reqs]
        assert got == refs
        assert eng.draft_acceptance_rate() == pytest.approx(1.0)
        # 12 tokens in ceil(12/4)=3 verify blocks, not 12 decode steps
        assert eng.steps <= 4 * len(prompts)
    finally:
        eng.stop()


def test_weak_draft_still_exact(target):
    """An unrelated random draft mostly misses — output must STILL equal
    plain greedy decoding (speculation is lossless)."""
    prompts = [np.asarray([3, 7, 11, 2], np.int32),
               np.asarray([9, 9, 9], np.int32),
               np.asarray([1, 2, 3, 4, 5], np.int32)]
    refs = _plain_tokens(target, prompts, 10)
    eng = _make_engine(target, draft_params_seed=99, speculate_k=4)
    try:
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=10)
                for p in prompts]
        for r in reqs:
            eng.submit(r)
        got = [r.result(timeout=120) for r in reqs]
        assert got == refs
        assert eng.drafted_tokens > 0
    finally:
        eng.stop()


def test_sampled_slots_match_plain_engine(target):
    """temperature > 0 slots sample one verified token per block with the
    same (seed, progress) PRNG fold as the plain path -> identical
    streams."""
    prompts = [np.asarray([3, 7, 11, 2], np.int32)]
    kw = dict(temperature=0.8, top_k=5, seed=42)
    refs = _plain_tokens(target, prompts, 8, **kw)
    eng = _make_engine(target, same_as_target=True, speculate_k=3)
    try:
        req = GenerationRequest(prompt_ids=prompts[0], max_new_tokens=8, **kw)
        eng.submit(req)
        assert req.result(timeout=120) == refs[0]
    finally:
        eng.stop()


def test_eos_inside_accepted_window(target):
    """EOS landing mid-window terminates the stream exactly there."""
    probe = _plain_tokens(target, [np.asarray([9, 9], np.int32)], 6)[0]
    eos = probe[3]  # 4th generated token
    eng = _make_engine(target, same_as_target=True, speculate_k=4)
    try:
        req = GenerationRequest(
            prompt_ids=np.asarray([9, 9], np.int32),
            max_new_tokens=20, eos_id=eos,
        )
        eng.submit(req)
        tokens = req.result(timeout=120)
        assert tokens == probe[:4]
        # the slot is free again: a follow-up request must work
        again = eng.generate(np.asarray([1, 2], np.int32), max_new_tokens=3,
                             timeout=120)
        assert len(again) == 3
    finally:
        eng.stop()


def test_speculative_with_steps_per_sync(target):
    """Chained verify blocks per sync compose with speculation."""
    prompts = [np.asarray([5, 6, 7], np.int32)]
    refs = _plain_tokens(target, prompts, 9)
    eng = _make_engine(target, same_as_target=True, speculate_k=2,
                       steps_per_sync=2)
    try:
        req = GenerationRequest(prompt_ids=prompts[0], max_new_tokens=9)
        eng.submit(req)
        assert req.result(timeout=120) == refs[0]
    finally:
        eng.stop()


def test_draft_requires_matching_vocab(target):
    spec, params = target
    bad = get_spec("llama-tiny", dict(DRAFT, vocab=64))
    with pytest.raises(ValueError):
        GenerationEngine(
            spec, params, dtype=jnp.float32,
            draft_spec=bad, draft_params=init_params(
                bad, np.random.default_rng(1)
            ),
        )


def test_speculation_composes_with_chunked_prefill(target):
    """The former guard is gone: the engine constructs with both
    speculation and chunked prefill (each chunk advances both caches)."""
    spec, params = target
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, max_len=64, prefill_chunk=16,
        draft_spec=spec, draft_params=params,
    )
    assert eng._draft_prefill_chunk is not None


# -- speculative x pipelined composition -------------------------------------

def _drain(eng, prompts, max_new=10):
    try:
        reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                  max_new_tokens=max_new) for p in prompts]
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=120.0) for r in reqs]
    finally:
        eng.stop()


@pytest.mark.parametrize("tp", [1, 2], ids=["pipe2", "pipe2xtp2"])
def test_speculative_pipelined_matches_plain(target, tp):
    """Speculative decoding under a pipe (x model) mesh produces the
    plain single-device engine's greedy tokens exactly (pipelined
    verify + replicated draft; lossless-greedy contract preserved)."""
    from starpu_inference_server_tpu.parallel.mesh import (
        MeshAxes,
        make_device_mesh,
    )

    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, 128, (n,), np.int32) for n in (5, 7, 3, 8)]

    plain = _make_engine(target, steps_per_sync=2)
    want = _drain(plain, prompts)

    mesh = make_device_mesh(MeshAxes(pipe=2, model=tp))
    spec_eng = _make_engine(
        target, draft_params_seed=12, steps_per_sync=2, mesh=mesh,
        speculate_k=3,
    )
    assert spec_eng._pipe_stages == 2
    got = _drain(spec_eng, prompts)
    assert got == want
    assert spec_eng.drafted_tokens > 0


def test_speculative_chunked_prefill_matches_plain(target):
    """Speculative decoding with chunked prefill: long prompts prefill
    chunk-by-chunk into BOTH caches; greedy output equals the plain
    chunked engine's exactly."""
    rng = np.random.default_rng(13)
    # longer than the largest bucket (16) -> forces the chunked path
    prompts = [rng.integers(0, 128, (n,), np.int32) for n in (20, 25, 18)]

    plain = _make_engine(target, steps_per_sync=2, prefill_chunk=8)
    want = _drain(plain, prompts)

    spec_eng = _make_engine(
        target, draft_params_seed=12, steps_per_sync=2, prefill_chunk=8,
        speculate_k=3,
    )
    got = _drain(spec_eng, prompts)
    assert got == want
    assert spec_eng.drafted_tokens > 0


def test_headroom_is_exactly_k(target):
    """Device-side completion collapsed the speculative admission
    headroom to K (the verify window's uncommitted rows): a request
    with prompt + max_new + K == max_len is admitted and completes
    exactly at its budget; one token more is rejected at the door."""
    k = 3
    eng = _make_engine(target, same_as_target=True, speculate_k=k,
                       max_len=32, steps_per_sync=2, decode_overlap=True,
                       pipeline_depth=3)
    try:
        prompt = np.asarray([5, 4, 3, 2], np.int32)  # len 4
        fits = 32 - len(prompt) - k                  # max_new = 25
        with pytest.raises(ValueError, match="headroom"):
            eng.submit(GenerationRequest(prompt_ids=prompt,
                                         max_new_tokens=fits + 1))
        req = GenerationRequest(prompt_ids=prompt, max_new_tokens=fits)
        eng.submit(req)
        tokens = req.result(timeout=120)
        assert len(tokens) == fits
    finally:
        eng.stop()


def test_staggered_budgets_freeze_on_device(target):
    """Slots with different budgets complete at exactly their limits
    while sharing verify blocks — frozen slots stop advancing on device
    without invalidating the overlapped pipeline."""
    prompts = [np.asarray([3, 7, 11, 2], np.int32),
               np.asarray([1, 4], np.int32),
               np.asarray([9, 9, 9], np.int32)]
    budgets = [5, 17, 11]
    refs = [_plain_tokens(target, [p], b)[0]
            for p, b in zip(prompts, budgets)]
    eng = _make_engine(target, same_as_target=True, speculate_k=4,
                       steps_per_sync=4, decode_overlap=True)
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
