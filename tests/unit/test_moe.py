"""MoE decoder (mixtral-style routed SwiGLU): routing math, decode/
teacher-forcing parity, quantized stacked experts, expert-parallel
sharding. No reference counterpart (SURVEY.md section 2.9 lists EP as a
TPU-native extension axis)."""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    _moe_mlp,
    decode_step,
    forward_logits,
    get_spec,
    init_cache,
    init_params,
    prefill,
)
from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree


@pytest.fixture(scope="module")
def tiny_moe():
    spec = get_spec("moe-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                 "kv_heads": 2, "intermediate": 256,
                                 "vocab": 128, "num_experts": 4})
    params = init_params(spec, np.random.default_rng(0))
    return spec, params


def test_moe_params_shape(tiny_moe):
    spec, params = tiny_moe
    mlp = params["layers"][0]["mlp"]
    assert mlp["router"]["w"].shape == (128, 4)
    assert mlp["experts"]["gate_up"]["w"].shape == (4, 128, 512)
    assert mlp["experts"]["down"]["w"].shape == (4, 256, 128)


def test_moe_mlp_matches_manual_top2(tiny_moe):
    """The dense-dispatch einsum must equal explicitly running each
    token through its top-2 experts with renormalized router weights."""
    spec, params = tiny_moe
    layer = params["layers"][0]
    rng = np.random.default_rng(1)
    x = rng.standard_normal((5, spec.hidden)).astype(np.float32)

    got = np.asarray(_moe_mlp(spec, layer, jnp.asarray(x), jnp.float32))

    router = layer["mlp"]["router"]["w"]
    wg = layer["mlp"]["experts"]["gate_up"]["w"]
    wd = layer["mlp"]["experts"]["down"]["w"]
    logits = x @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs /= probs.sum(-1, keepdims=True)
    want = np.zeros_like(x)
    for t in range(x.shape[0]):
        top = np.argsort(probs[t])[::-1][:2]
        weights = probs[t, top] / probs[t, top].sum()
        for e, wgt in zip(top, weights):
            h = x[t] @ wg[e]
            inter = h.shape[-1] // 2
            act = (h[:inter] / (1 + np.exp(-h[:inter]))) * h[inter:]
            want[t] += wgt * (act @ wd[e])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_moe_forward_and_decode_parity(tiny_moe):
    """Greedy generation via prefill + int8-cache decode must match
    greedy teacher-forcing with the MoE MLP in the loop."""
    spec, params = tiny_moe
    rng = np.random.default_rng(2)
    prompt = rng.integers(0, spec.vocab, (6,), np.int32)
    steps = 4

    # teacher forcing
    ids = list(prompt)
    for _ in range(steps):
        logits = forward_logits(
            spec, params, jnp.asarray(np.asarray(ids)[None]), jnp.float32
        )
        ids.append(int(jnp.argmax(logits[0, len(ids) - 1])))
    want = ids[len(prompt):]

    # prefill + decode
    cache = init_cache(spec, 2, 64)
    padded = np.zeros((8,), np.int32)
    padded[: len(prompt)] = prompt
    cache, logits = jax.jit(partial(prefill, spec, dtype=jnp.float32))(
        params, cache, jnp.asarray(padded), jnp.int32(len(prompt)), jnp.int32(0)
    )
    got = [int(jnp.argmax(logits))]
    step = jax.jit(partial(decode_step, spec, dtype=jnp.float32))
    for _ in range(steps - 1):
        cur = jnp.zeros((2,), jnp.int32).at[0].set(got[-1])
        cache, lg = step(params, cache, cur, jnp.asarray([True, False]))
        got.append(int(jnp.argmax(lg[0])))
    assert got == want


def test_moe_quantized_experts_close_to_dense(tiny_moe):
    spec, params = tiny_moe
    qparams = maybe_quantize_tree(params, bits=8)
    leaf = qparams["layers"][0]["mlp"]["experts"]["gate_up"]["w"]
    assert leaf["w_q"].shape == (4, 128, 512)
    assert leaf["scale"].shape == (4, 1, 512)  # per-(expert, column)
    rng = np.random.default_rng(3)
    ids = rng.integers(0, spec.vocab, (1, 8), np.int32)
    dense = np.asarray(forward_logits(spec, params, jnp.asarray(ids), jnp.float32))
    quant = np.asarray(forward_logits(spec, qparams, jnp.asarray(ids), jnp.float32))
    # int8 per-channel noise through 2 layers; routing can amplify
    rel = np.abs(dense - quant).max() / (np.abs(dense).max() + 1e-9)
    assert rel < 0.05, rel


def test_moe_expert_parallel_matches_unsharded(tiny_moe):
    """Forward over a (data=1, expert=4, model=2) mesh with the expert
    axis sharding the stacked weights must reproduce the single-device
    output."""
    from starpu_inference_server_tpu.parallel.mesh import MeshAxes, make_device_mesh
    from starpu_inference_server_tpu.parallel.partition import (
        partition_rules_for,
        shard_params,
    )

    spec, params = tiny_moe
    rng = np.random.default_rng(4)
    ids = rng.integers(0, spec.vocab, (2, 8), np.int32)
    want = np.asarray(forward_logits(spec, params, jnp.asarray(ids), jnp.float32))

    mesh = make_device_mesh(MeshAxes(data=1, expert=4, model=2))
    rules = partition_rules_for("moe-tiny")
    sharded = shard_params(params, mesh, rules)
    # confirm the stacked expert weight actually shards over 'expert'
    wg = sharded["layers"][0]["mlp"]["experts"]["gate_up"]["w"]
    assert "expert" in str(wg.sharding.spec)
    got = np.asarray(
        jax.jit(partial(forward_logits, spec, dtype=jnp.float32))(
            sharded, jnp.asarray(ids)
        )
    )
    np.testing.assert_allclose(want, got, rtol=2e-4, atol=2e-4)


def test_moe_generation_engine(tiny_moe):
    from starpu_inference_server_tpu.serving.generation import GenerationEngine

    spec, params = tiny_moe
    eng = GenerationEngine(spec, params, dtype=jnp.float32, num_slots=2,
                           max_len=64, prefill_buckets=[8])
    eng.start()
    try:
        tokens = eng.generate(np.asarray([3, 7, 11], np.int32), max_new_tokens=5)
        assert len(tokens) == 5
        assert all(0 <= t < spec.vocab for t in tokens)
    finally:
        eng.stop()
