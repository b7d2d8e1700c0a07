"""Mesh-sharded continuous-batching generation: weights tensor-/expert-
parallel, KV-cache slots sharded over the data axis. Must reproduce the
single-device engine's tokens on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.parallel.mesh import MeshAxes, make_device_mesh
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

TINY = {"layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
        "intermediate": 256, "vocab": 128}


def run_engine(spec, params, mesh=None, family="llama-tiny", slots=2):
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=slots, max_len=64,
        prefill_buckets=[8], mesh=mesh, family=family,
    )
    eng.start()
    try:
        reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                  max_new_tokens=6)
                for p in ([3, 7, 11], [5, 2])]
        for r in reqs:
            eng.submit(r)
        return [r.result(timeout=180) for r in reqs]
    finally:
        eng.stop()


def test_mesh_generation_matches_single_device():
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(0))
    single = run_engine(spec, params)
    mesh = make_device_mesh(MeshAxes(data=2, model=2))
    sharded = run_engine(spec, params, mesh=mesh)
    assert sharded == single


def test_mesh_generation_moe_expert_parallel():
    spec = get_spec("moe-tiny", dict(TINY, num_experts=4))
    params = init_params(spec, np.random.default_rng(0))
    single = run_engine(spec, params, family="moe-tiny")
    mesh = make_device_mesh(MeshAxes(data=2, expert=2, model=2))
    sharded = run_engine(spec, params, mesh=mesh, family="moe-tiny")
    assert sharded == single


def test_mesh_slots_must_divide_data_axis():
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(0))
    mesh = make_device_mesh(MeshAxes(data=2, model=1))
    with pytest.raises(ValueError, match="divisible"):
        GenerationEngine(spec, params, dtype=jnp.float32, num_slots=3,
                         max_len=64, prefill_buckets=[8], mesh=mesh)
