"""Pipeline parallelism (GPipe-style shard_map pipeline over the 'pipe'
mesh axis): generic layer pipeline and the pipelined decoder forward
must match sequential execution bitwise-close on the virtual CPU mesh."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    forward_logits,
    get_spec,
    init_params,

)
from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree
from starpu_inference_server_tpu.parallel.mesh import MeshAxes, make_device_mesh
from starpu_inference_server_tpu.parallel.pipeline import (
    pipeline_forward,
    pipelined_decoder_logits,
    stack_layers,
)

pytestmark = pytest.mark.slow

TINY = {"layers": 4, "hidden": 128, "q_heads": 4, "kv_heads": 2,
        "intermediate": 256, "vocab": 128}


def test_generic_pipeline_matches_sequential():
    """A stack of simple affine layers pipelined over 4 stages must equal
    applying them in order."""
    rng = np.random.default_rng(0)
    layers = [{"w": jnp.asarray(rng.standard_normal((16, 16)) * 0.3,
                                jnp.float32),
               "b": jnp.asarray(rng.standard_normal((16,)) * 0.1,
                                jnp.float32)}
              for _ in range(8)]

    def layer_fn(p, x):
        return jnp.tanh(x @ p["w"] + p["b"])

    x = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    want = x
    for p in layers:
        want = layer_fn(p, want)

    mesh = make_device_mesh(MeshAxes(pipe=4))
    got = pipeline_forward(mesh, layer_fn, stack_layers(layers), x,
                           num_microbatches=4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("num_micro", [1, 2, 4, 8])
def test_pipeline_microbatch_counts(num_micro):
    rng = np.random.default_rng(1)
    layers = [{"w": jnp.asarray(rng.standard_normal((8, 8)) * 0.3,
                                jnp.float32)} for _ in range(4)]

    def layer_fn(p, x):
        return jnp.tanh(x @ p["w"])

    x = jnp.asarray(rng.standard_normal((8, 8)), jnp.float32)
    want = x
    for p in layers:
        want = layer_fn(p, want)
    mesh = make_device_mesh(MeshAxes(pipe=2))
    got = pipeline_forward(mesh, layer_fn, stack_layers(layers), x,
                           num_microbatches=num_micro)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_pipeline_validation_errors():
    mesh = make_device_mesh(MeshAxes(pipe=4))
    layers = [{"w": jnp.zeros((4, 4))} for _ in range(6)]  # 6 % 4 != 0
    x = jnp.zeros((4, 4))
    with pytest.raises(ValueError, match="divisible by 4 pipeline"):
        pipeline_forward(mesh, lambda p, x: x, stack_layers(layers), x, 2)
    layers = [{"w": jnp.zeros((4, 4))} for _ in range(4)]
    with pytest.raises(ValueError, match="not divisible by num_microbatches"):
        pipeline_forward(mesh, lambda p, x: x, stack_layers(layers), x, 3)


def test_pipelined_decoder_matches_forward_logits():
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(2))
    ids = np.random.default_rng(3).integers(0, spec.vocab, (8, 12), np.int32)
    want = np.asarray(forward_logits(spec, params, jnp.asarray(ids),
                                     jnp.float32))
    mesh = make_device_mesh(MeshAxes(pipe=4))
    got = np.asarray(pipelined_decoder_logits(
        spec, params, jnp.asarray(ids), mesh, num_microbatches=4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pipelined_decoder_quantized_and_moe():
    # int8-quantized dense decoder
    spec = get_spec("llama-tiny", TINY)
    params = maybe_quantize_tree(init_params(spec, np.random.default_rng(4)),
                                 bits=8)
    ids = np.random.default_rng(5).integers(0, spec.vocab, (4, 8), np.int32)
    want = np.asarray(forward_logits(spec, params, jnp.asarray(ids),
                                     jnp.float32))
    mesh = make_device_mesh(MeshAxes(pipe=2))
    got = np.asarray(pipelined_decoder_logits(
        spec, params, jnp.asarray(ids), mesh, num_microbatches=2))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    # MoE decoder pipelines too (pipe x expert composition)
    mspec = get_spec("moe-tiny", dict(TINY, num_experts=4))
    mparams = init_params(mspec, np.random.default_rng(6))
    mwant = np.asarray(forward_logits(mspec, mparams, jnp.asarray(ids),
                                      jnp.float32))
    mesh = make_device_mesh(MeshAxes(pipe=2, expert=2))
    mgot = np.asarray(pipelined_decoder_logits(
        mspec, mparams, jnp.asarray(ids), mesh, num_microbatches=2))
    np.testing.assert_allclose(mgot, mwant, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("quant", [None, 8])
def test_pipelined_decoder_with_tensor_parallel_stages(quant):
    """pipe=2 x model=2: per-layer weights shard over 'model' INSIDE each
    pipeline stage (manual Megatron TP with block-shuffled fused
    projections + psum) and must still match the sequential forward."""
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(7))
    if quant:
        params = maybe_quantize_tree(params, bits=quant)
    ids = np.random.default_rng(8).integers(0, spec.vocab, (4, 8), np.int32)
    want = np.asarray(forward_logits(spec, params, jnp.asarray(ids),
                                     jnp.float32))
    mesh = make_device_mesh(MeshAxes(pipe=2, model=2))
    got = np.asarray(pipelined_decoder_logits(
        spec, params, jnp.asarray(ids), mesh, num_microbatches=2))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_pipelined_moe_with_expert_and_tensor_parallel_stages():
    """pipe=2 x expert=2 x model=2 (8 devices): EP + TP inside each
    pipeline stage; one psum over (expert, model) completes the MoE
    combine."""
    mspec = get_spec("moe-tiny", dict(TINY, num_experts=4))
    mparams = init_params(mspec, np.random.default_rng(9))
    ids = np.random.default_rng(10).integers(0, mspec.vocab, (4, 8), np.int32)
    want = np.asarray(forward_logits(mspec, mparams, jnp.asarray(ids),
                                     jnp.float32))
    mesh = make_device_mesh(MeshAxes(pipe=2, expert=2, model=2))
    got = np.asarray(pipelined_decoder_logits(
        mspec, mparams, jnp.asarray(ids), mesh, num_microbatches=2))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)
