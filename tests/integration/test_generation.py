"""Continuous-batching generation engine integration tests."""


import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    decode_step,
    get_spec,
    init_cache,
    init_params,
    prefill,
)
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

import jax.numpy as jnp


@pytest.fixture(scope="module")
def engine():
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=4, max_len=64,
        prefill_buckets=[8, 16],
    )
    eng.start()
    yield eng
    eng.stop()


def _reference_tokens(engine, prompt, steps):
    spec = engine.spec
    params = engine.params
    cache = init_cache(spec, 1, 64)
    cache, logits = prefill(
        spec, params, cache, jnp.asarray(prompt, jnp.int32),
        jnp.int32(len(prompt)), jnp.int32(0), jnp.float32,
    )
    toks = [int(jnp.argmax(logits))]
    for _ in range(steps - 1):
        cache, logits = decode_step(
            spec, params, cache, jnp.asarray([toks[-1]], jnp.int32),
            jnp.asarray([True]), jnp.float32,
        )
        toks.append(int(jnp.argmax(logits[0])))
    return toks


def test_single_generation(engine):
    prompt = np.asarray([3, 7, 11, 2], np.int32)
    tokens = engine.generate(prompt, max_new_tokens=6, timeout=120)
    assert len(tokens) == 6
    assert tokens == _reference_tokens(engine, prompt, 6)


def test_concurrent_generations_match_solo(engine):
    rng = np.random.default_rng(5)
    prompts = [rng.integers(0, 128, (rng.integers(2, 8),)).astype(np.int32)
               for _ in range(6)]  # 6 requests > 4 slots: queueing happens
    refs = [_reference_tokens(engine, p, 5) for p in prompts]

    requests = [
        GenerationRequest(prompt_ids=p, max_new_tokens=5) for p in prompts
    ]
    for r in requests:
        engine.submit(r)
    results = [r.result(timeout=120) for r in requests]
    assert results == refs


def test_streaming_callback(engine):
    seen = []
    req = GenerationRequest(
        prompt_ids=np.asarray([1, 2, 3], np.int32),
        max_new_tokens=4,
        on_token=seen.append,
    )
    engine.submit(req)
    tokens = req.result(timeout=120)
    assert seen == tokens


def test_eos_terminates_early(engine):
    # find the first generated token, then use it as the EOS id
    probe = engine.generate(np.asarray([9, 9], np.int32), max_new_tokens=3,
                            timeout=120)
    req = GenerationRequest(
        prompt_ids=np.asarray([9, 9], np.int32),
        max_new_tokens=10,
        eos_id=probe[0],
    )
    engine.submit(req)
    tokens = req.result(timeout=120)
    assert tokens[-1] == probe[0]
    assert len(tokens) == 1  # stopped at the first token


def test_prompt_too_long_rejected(engine):
    with pytest.raises(ValueError):
        engine.submit(GenerationRequest(
            prompt_ids=np.zeros((60,), np.int32), max_new_tokens=10
        ))


def test_throughput_counters(engine):
    before = engine.generated_tokens
    engine.generate(np.asarray([5, 6], np.int32), max_new_tokens=3, timeout=120)
    assert engine.generated_tokens >= before + 3


def test_batched_prefill_matches_sequential():
    """A wave of same-bucket admissions dispatches as ONE batched
    prefill program; tokens must equal one-at-a-time admission."""
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128,
                                   "q_heads": 4, "kv_heads": 2,
                                   "intermediate": 256, "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    prompts = [np.asarray([3 + i, 7, 11 - i], np.int32) for i in range(6)]

    solo = []
    for p in prompts:
        eng = GenerationEngine(spec, params, dtype=jnp.float32,
                               num_slots=1, max_len=64,
                               prefill_buckets=[8], steps_per_sync=2)
        eng.start()
        try:
            solo.append(eng.generate(p, max_new_tokens=6, timeout=120))
        finally:
            eng.stop()

    eng = GenerationEngine(spec, params, dtype=jnp.float32, num_slots=6,
                           max_len=64, prefill_buckets=[8],
                           steps_per_sync=2, decode_overlap=True)
    eng.start()
    try:
        reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=6)
                for p in prompts]
        # submit before start of admission so one loop pass sees all 6
        for r in reqs:
            eng.submit(r)
        got = [r.result(timeout=120) for r in reqs]
        assert got == solo
    finally:
        eng.stop()


def test_pinned_cache_layouts_parity():
    """pin_cache_layouts=True (opt-in entry/exit layout pinning, round
    5): tokens must match the unpinned engine exactly. On CPU the
    pinned layout equals the default, so this exercises the Format
    plumbing (in/out_shardings on every cache-touching jit), not a
    relayout."""
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.serving.generation import (
        GenerationEngine,
        GenerationRequest,
    )

    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128,
                                   "q_heads": 4, "kv_heads": 2,
                                   "intermediate": 256, "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    outs = []
    for pin in (False, True):
        eng = GenerationEngine(
            spec, params, dtype=jnp.float32, num_slots=4, max_len=64,
            prefill_buckets=[8], steps_per_sync=2,
            pin_cache_layouts=pin,
        )
        eng.start()
        try:
            reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                      max_new_tokens=6)
                    for p in ([3, 7, 11], [5, 2])]
            for r in reqs:
                eng.submit(r)
            outs.append([r.result(timeout=120) for r in reqs])
        finally:
            eng.stop()
    assert outs[0] == outs[1]


def test_flat_cache_layout_matches_standard():
    """kv_cache_layout='flat' produces the same greedy tokens as the
    standard layout through the full engine (dense and paged), including
    multi-step blocks and chunked prefill."""
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 256, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(3))
    rng = np.random.default_rng(4)
    prompts = [rng.integers(0, 128, (rng.integers(3, 12),)).astype(np.int32)
               for _ in range(5)]

    def run(layout, **kw):
        eng = GenerationEngine(
            spec, params, dtype=jnp.float32, num_slots=4, max_len=64,
            prefill_buckets=[8, 16], steps_per_sync=3,
            kv_cache_layout=layout, **kw,
        )
        eng.start()
        try:
            reqs = [GenerationRequest(prompt_ids=p, max_new_tokens=6)
                    for p in prompts]
            for r in reqs:
                eng.submit(r)
            return [r.result(timeout=120) for r in reqs]
        finally:
            eng.stop()

    assert run("flat") == run("standard")
    assert (run("flat", kv_page_size=32, kv_pool_pages=9)
            == run("standard", kv_page_size=32, kv_pool_pages=9))


def test_flat_cache_layout_rejects_pinning():
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    with pytest.raises(ValueError, match="redundant"):
        GenerationEngine(
            spec, params, dtype=jnp.float32, num_slots=2, max_len=64,
            kv_cache_layout="flat", pin_cache_layouts=True,
        )
