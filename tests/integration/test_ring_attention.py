"""Sequence parallelism (parallel/ring_attention.py): the ring-rotated
causal attention and the sequence-sharded decoder forward must match the
single-device math."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    forward_logits,
    get_spec,
    init_params,

)
from starpu_inference_server_tpu.parallel.mesh import (
    DATA_AXIS,
    MeshAxes,
    make_device_mesh,
)
from starpu_inference_server_tpu.parallel.ring_attention import (
    ring_causal_attention,
    sequence_parallel_decoder_logits,
)

pytestmark = pytest.mark.slow

TINY = {"layers": 2, "hidden": 64, "q_heads": 4, "kv_heads": 2,
        "intermediate": 96, "vocab": 128}


@pytest.mark.parametrize("n", [2, 4])
def test_ring_causal_attention_matches_full(n):
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_device_mesh(MeshAxes(data=n))
    b, t, hkv, rep, d = 2, 32, 2, 2, 16
    hq = hkv * rep
    rng = np.random.default_rng(0)
    q = rng.standard_normal((b, t, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, t, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, t, hkv, d)).astype(np.float32)

    kwargs = dict(
        mesh=mesh,
        in_specs=(P(None, DATA_AXIS), P(None, DATA_AXIS), P(None, DATA_AXIS)),
        out_specs=P(None, DATA_AXIS),
    )
    try:
        fn = shard_map(
            lambda a, b_, c: ring_causal_attention(a, b_, c, DATA_AXIS, rep=rep),
            check_vma=False, **kwargs,
        )
    except TypeError:
        fn = shard_map(
            lambda a, b_, c: ring_causal_attention(a, b_, c, DATA_AXIS, rep=rep),
            check_rep=False, **kwargs,
        )
    got = np.asarray(fn(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v)))

    kf = np.repeat(k, rep, axis=2)
    vf = np.repeat(v, rep, axis=2)
    logits = np.einsum("bqhd,bkhd->bhqk", q, kf) / np.sqrt(d)
    causal = np.tril(np.ones((t, t), bool))[None, None]
    logits = np.where(causal, logits, -1e30)
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.einsum("bhqk,bkhd->bqhd", probs, vf)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize(
    "n,tp", [(2, 1), (4, 1), (2, 2)], ids=["sp2", "sp4", "sp2xtp2"]
)
def test_sequence_parallel_forward_matches(n, tp):
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(1))
    mesh = make_device_mesh(MeshAxes(data=n, model=tp))
    ids = np.random.default_rng(2).integers(0, 128, (2, 16), np.int32)

    want = np.asarray(
        forward_logits(spec, params, jnp.asarray(ids), jnp.float32)
    )
    got = np.asarray(sequence_parallel_decoder_logits(
        spec, params, jnp.asarray(ids), mesh, jnp.float32
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_sequence_parallel_quantized():
    from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree

    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(3))
    q_params = maybe_quantize_tree(params, 8)
    mesh = make_device_mesh(MeshAxes(data=2))
    ids = np.random.default_rng(4).integers(0, 128, (1, 8), np.int32)
    want = np.asarray(
        forward_logits(spec, q_params, jnp.asarray(ids), jnp.float32)
    )
    got = np.asarray(sequence_parallel_decoder_logits(
        spec, q_params, jnp.asarray(ids), mesh, jnp.float32
    ))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
