"""Composition-matrix robustness: the feature combinations VERDICT r1
flagged as untested — speculative x prefix-cache x PIPELINED decoding,
cancellation storms during chunked prefill on a MESH engine, and
overlap x speculation x paged interplay. Reference pattern: per-domain
robustness suites (/root/reference/tests/unit/*/robustness/); these are
net-new compositions the reference does not have (SURVEY.md section
5.7/2.9).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.parallel.mesh import MeshAxes, make_device_mesh
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

pytestmark = pytest.mark.slow

TINY = {"layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
        "intermediate": 256, "vocab": 128}
DRAFT = {"layers": 1, "hidden": 64, "q_heads": 2, "kv_heads": 1,
         "intermediate": 128, "vocab": 128}


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(0))
    draft_spec = get_spec("llama-tiny", DRAFT)
    draft_params = init_params(draft_spec, np.random.default_rng(1))
    return spec, params, draft_spec, draft_params


def started(eng):
    eng.start()
    return eng


def run_prompts(eng, prompts, max_new=6, timeout=240, sequential=True):
    try:
        outs = []
        if sequential:
            for p in prompts:
                r = GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                      max_new_tokens=max_new)
                eng.submit(r)
                outs.append(r.result(timeout=timeout))
            return outs
        reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                  max_new_tokens=max_new) for p in prompts]
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=timeout) for r in reqs]
    finally:
        eng.stop()


def test_speculative_pipelined_concurrent_matches_plain(setup):
    """PIPELINED decode (pipe=2 mesh) + speculation under concurrent
    submission and slot churn must reproduce the plain single-device
    engine's greedy tokens."""
    spec, params, draft_spec, draft_params = setup
    base = np.arange(1, 25, dtype=np.int32)
    prompts = [base, np.concatenate([base, [77]]), [2, 4, 6]]

    plain = run_prompts(
        started(GenerationEngine(spec, params, dtype=jnp.float32, num_slots=2,
                         max_len=96, prefill_buckets=[8, 32],
                         steps_per_sync=2)),
        prompts, sequential=False,
    )

    mesh = make_device_mesh(MeshAxes(pipe=2))
    eng = started(GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=2, max_len=96,
        prefill_buckets=[8, 32], steps_per_sync=2, mesh=mesh,
        draft_spec=draft_spec, draft_params=draft_params, speculate_k=2,
    ))
    fancy = run_prompts(eng, prompts, sequential=False)
    assert fancy == plain


def test_prefix_cache_pipelined_rejected_cleanly(setup):
    """prefix_cache needs chunked prefill; pipelined mode chunks over
    the stages instead and forbids prefill_chunk — the incompatible
    triple must be rejected at CONSTRUCTION with a clear error, not die
    inside the engine loop."""
    spec, params, _, _ = setup
    mesh = make_device_mesh(MeshAxes(pipe=2))
    with pytest.raises(ValueError, match="prefix_cache|prefill_chunk"):
        GenerationEngine(
            spec, params, dtype=jnp.float32, num_slots=2, max_len=96,
            prefill_buckets=[8, 32], steps_per_sync=2, mesh=mesh,
            prefix_cache=True, prefix_cache_min=8,
        )


def test_mesh_cancel_storm_during_chunked_prefill(setup):
    """Cancellation storm against a MESH (data x model) engine while a
    chunked prefill is in flight: every request's done event fires, no
    hang, survivors still produce tokens."""
    spec, params, _, _ = setup
    mesh = make_device_mesh(MeshAxes(data=2, model=2))
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=2, max_len=96,
        prefill_buckets=[8], prefill_chunk=8, steps_per_sync=2, mesh=mesh,
    )
    eng.start()
    try:
        long_prompt = np.arange(1, 41, dtype=np.int32)  # 5 chunks
        victims = [GenerationRequest(prompt_ids=long_prompt,
                                     max_new_tokens=8) for _ in range(4)]
        survivor = GenerationRequest(
            prompt_ids=np.asarray([3, 5, 7], np.int32), max_new_tokens=4
        )
        for v in victims:
            eng.submit(v)
        eng.submit(survivor)
        for v in victims:
            v.cancel()
        for v in victims:
            v.done.wait(timeout=240)
            assert v.done.is_set()
        out = survivor.result(timeout=240)
        assert len(out) == 4
    finally:
        eng.stop()


def test_overlap_speculative_prefix_matches_plain(setup):
    """decode_overlap (pipelined dispatch) x speculation x prefix cache
    on one device: bitwise-equal greedy tokens vs the plain engine under
    concurrent submission and slot churn."""
    spec, params, draft_spec, draft_params = setup
    base = np.arange(1, 17, dtype=np.int32)
    prompts = [base, np.concatenate([base, [9]]), [2, 4, 6],
               np.concatenate([base, [11, 13]])]

    plain = run_prompts(
        started(GenerationEngine(spec, params, dtype=jnp.float32, num_slots=2,
                         max_len=128, prefill_buckets=[8, 32],
                         steps_per_sync=2)),
        prompts,
    )
    eng = started(GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=2, max_len=128,
        prefill_buckets=[8, 32], steps_per_sync=2, decode_overlap=True,
        pipeline_depth=2, draft_spec=draft_spec, draft_params=draft_params,
        speculate_k=2, prefix_cache=True, prefix_cache_min=8,
        prefill_chunk=8,
    ))
    fancy = run_prompts(eng, prompts)
    assert fancy == plain


def test_paged_overlap_concurrent_matches_plain(setup):
    """Paged KV x decode_overlap under CONCURRENT load: page-table
    indirection with blocks in flight must match the dense-slot engine's
    tokens (sequential admission keeps slot assignment deterministic is
    NOT assumed — greedy decode is slot-order independent)."""
    spec, params, _, _ = setup
    prompts = [[3, 7, 11], [5, 2], [9, 9, 9, 9], [1]]
    plain = run_prompts(
        started(GenerationEngine(spec, params, dtype=jnp.float32, num_slots=2,
                         max_len=96, prefill_buckets=[8],
                         steps_per_sync=2)),
        prompts, sequential=False,
    )
    eng = started(GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=2, max_len=96,
        prefill_buckets=[8], steps_per_sync=2, decode_overlap=True,
        pipeline_depth=2, kv_page_size=16, kv_pool_pages=12,
    ))
    paged = run_prompts(eng, prompts, sequential=False)
    assert paged == plain
