"""Pipelined decoding (parallel/pipeline_decode.py): prefill sequence
chunks and decode slot-microgroups flowing over the 'pipe' mesh axis
must reproduce the single-device engine's math — prefill matches
sequential prefill_chunk (same INT8 round-trips), decode matches
decode_step exactly, and the GenerationEngine produces identical greedy
tokens through the pipelined path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    decode_step,
    get_spec,
    init_cache,
    init_params,
    prefill,
    prefill_chunk,
    stack_cache,
)
from starpu_inference_server_tpu.parallel.mesh import MeshAxes, make_device_mesh
from starpu_inference_server_tpu.parallel.partition import partition_rules_for
from starpu_inference_server_tpu.parallel.pipeline import (
    prepare_pipelined_params,
)
from starpu_inference_server_tpu.parallel.pipeline_decode import (
    pipelined_decode_step,
    pipelined_prefill,
    validate_pipe_mesh,
)
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

pytestmark = pytest.mark.slow

TINY = {"layers": 4, "hidden": 64, "q_heads": 4, "kv_heads": 2,
        "intermediate": 96, "vocab": 128}


def _stacked(spec, params, mesh, family="llama-tiny"):
    from starpu_inference_server_tpu.parallel.tp_layout import (
        shuffle_decoder_layer_for_tp,
    )

    tp = mesh.shape["model"]
    shuffle = (
        (lambda layer: shuffle_decoder_layer_for_tp(spec, layer, tp))
        if tp > 1
        else None
    )
    return prepare_pipelined_params(
        params, mesh, partition_rules_for(family), layer_shuffle=shuffle
    )


def test_validate_pipe_mesh_rejects_data_axis():
    mesh = make_device_mesh(MeshAxes(pipe=2, data=2))
    with pytest.raises(ValueError, match="'data' mesh axis"):
        validate_pipe_mesh(mesh)
    # model/expert compose inside the stages
    assert validate_pipe_mesh(make_device_mesh(MeshAxes(pipe=2, model=2))) == 2
    assert validate_pipe_mesh(make_device_mesh(MeshAxes(pipe=2, expert=2))) == 2


@pytest.mark.parametrize(
    "stages,tp", [(2, 1), (4, 1), (2, 2)], ids=["p2", "p4", "p2xm2"]
)
def test_pipelined_prefill_matches_sequential_chunks(stages, tp):
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(0))
    mesh = make_device_mesh(MeshAxes(pipe=stages, model=tp))
    bucket, length, slot = 16, 13, 1
    c = bucket // stages
    prompt = np.random.default_rng(1).integers(0, spec.vocab, (length,),
                                               np.int32)
    padded = np.zeros((bucket,), np.int32)
    padded[:length] = prompt

    # reference: prefill_chunk applied chunk-by-chunk (same boundaries)
    ref_cache = init_cache(spec, 4, 64)
    logits_ref = None
    for start in range(0, bucket, c):
        chunk = padded[start : start + c]
        valid = min(c, max(0, length - start))
        ref_cache, lg = prefill_chunk(
            spec, params, ref_cache, jnp.asarray(chunk), jnp.int32(start),
            jnp.int32(max(valid, 1)), jnp.int32(slot), jnp.float32,
        )
        if start < length <= start + c:
            logits_ref = np.asarray(lg)
    ref_cache = ref_cache._replace(
        lengths=ref_cache.lengths.at[slot].set(length)
    )

    cache = init_cache(spec, 4, 64, stacked=True)
    cache, logits = pipelined_prefill(
        spec, _stacked(spec, params, mesh), cache, jnp.asarray(padded),
        jnp.int32(length), jnp.int32(slot), mesh, jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(logits), logits_ref,
                               rtol=2e-4, atol=2e-4)
    # the written INT8 rows must carry the same values once dequantized
    for name in ("k", "v"):
        got_q = np.asarray(getattr(cache, name))[:, slot, :length]
        want_q = np.asarray(getattr(ref_cache, name))[:, slot, :length]
        got_s = np.asarray(getattr(cache, name + "_scale"))[:, slot, :length]
        want_s = np.asarray(getattr(ref_cache, name + "_scale"))[:, slot, :length]
        np.testing.assert_allclose(
            got_q.astype(np.float32) * got_s[..., None],
            want_q.astype(np.float32) * want_s[..., None],
            rtol=2e-3, atol=2e-3,
        )
    assert int(np.asarray(cache.lengths)[slot]) == length


@pytest.mark.parametrize(
    "family,tp,ep",
    [
        ("llama-tiny", 1, 1),
        ("moe-tiny", 1, 1),
        ("llama-tiny", 2, 1),   # TP inside pipeline stages
        ("moe-tiny", 1, 2),     # EP inside pipeline stages
        ("moe-tiny", 2, 2),     # TP x EP inside pipeline stages
    ],
    ids=["llama", "moe", "llama-tp2", "moe-ep2", "moe-tp2xep2"],
)
def test_pipelined_decode_step_matches_decode_step(family, tp, ep):
    opts = dict(TINY)
    if family == "moe-tiny":
        opts["num_experts"] = 4
    spec = get_spec(family, opts)
    params = init_params(spec, np.random.default_rng(2))
    mesh = make_device_mesh(MeshAxes(pipe=2, model=tp, expert=ep))
    num_slots, max_len = 4, 32

    # identical starting state: plain prefill into 3 of 4 slots
    cache = init_cache(spec, num_slots, max_len)
    rng = np.random.default_rng(3)
    for slot, length in [(0, 5), (1, 8), (3, 3)]:
        prompt = np.zeros((8,), np.int32)
        prompt[:length] = rng.integers(0, spec.vocab, (length,))
        cache, _ = prefill(
            spec, params, cache, jnp.asarray(prompt), jnp.int32(length),
            jnp.int32(slot), jnp.float32,
        )
    ids = np.asarray([7, 11, 0, 3], np.int32)
    active = np.asarray([True, True, False, True])

    ref_cache, ref_logits = decode_step(
        spec, params, jax.tree.map(jnp.copy, cache), jnp.asarray(ids),
        jnp.asarray(active), jnp.float32,
    )
    # the pipe path keeps the STACKED layout (layer axis shards over
    # 'pipe'); convert the plain-prefill layered cache at the boundary
    got_cache, got_logits = pipelined_decode_step(
        spec, _stacked(spec, params, mesh, family), stack_cache(cache),
        jnp.asarray(ids), jnp.asarray(active), mesh, jnp.float32,
    )
    np.testing.assert_allclose(
        np.asarray(got_logits)[active], np.asarray(ref_logits)[active],
        rtol=2e-4, atol=2e-4,
    )
    np.testing.assert_array_equal(
        np.asarray(got_cache.lengths), np.asarray(ref_cache.lengths)
    )
    # cache rows written this step (per active slot at its old length)
    lengths_before = [5, 8, 0, 3]
    for s in range(num_slots):
        if not active[s]:
            continue
        pos = lengths_before[s]
        got = np.asarray(got_cache.k)[:, s, pos].astype(np.float32)
        want = np.asarray(ref_cache.k)[:, s, pos].astype(np.float32)
        gs = np.asarray(got_cache.k_scale)[:, s, pos]
        ws = np.asarray(ref_cache.k_scale)[:, s, pos]
        np.testing.assert_allclose(
            got * gs[..., None], want * ws[..., None], rtol=2e-3, atol=2e-3
        )


def _run_engine(engine, prompts, max_new=6):
    engine.start()
    try:
        reqs = [
            GenerationRequest(
                prompt_ids=np.asarray(p, np.int32), max_new_tokens=max_new
            )
            for p in prompts
        ]
        for r in reqs:
            engine.submit(r)
        return [r.result(timeout=120.0) for r in reqs]
    finally:
        engine.stop()


@pytest.mark.parametrize(
    "family,tp",
    [("llama-tiny", 1), ("moe-tiny", 1), ("llama-tiny", 2)],
    ids=["llama", "moe", "llama-tp2"],
)
def test_generation_engine_pipelined_matches_chunked(family, tp):
    """Greedy tokens through the pipelined engine equal the single-device
    engine with prefill_chunk at the pipeline's chunk size (identical
    numerics: same chunk boundaries, same INT8 round-trips)."""
    opts = dict(TINY)
    if family == "moe-tiny":
        opts["num_experts"] = 4
    spec = get_spec(family, opts)
    params = init_params(spec, np.random.default_rng(4))
    stages = 2
    bucket = 8
    chunk = bucket // stages  # pipelined prefill's chunk size
    rng = np.random.default_rng(5)
    # lengths in (chunk, bucket] so BOTH engines take the chunked path
    # with the same boundaries
    prompts = [
        rng.integers(0, spec.vocab, (n,), np.int32) for n in (5, 7, 8, 6)
    ]

    ref = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=4, max_len=64,
        prefill_buckets=[bucket], steps_per_sync=2, prefill_chunk=chunk,
        family=family,
    )
    want = _run_engine(ref, prompts)

    mesh = make_device_mesh(MeshAxes(pipe=stages, model=tp))
    pipe = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=4, max_len=64,
        prefill_buckets=[bucket], steps_per_sync=2, mesh=mesh,
        family=family,
    )
    got = _run_engine(pipe, prompts)
    assert got == want
    assert pipe._pipe_stages == stages


def test_pipelined_engine_guards():
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(6))
    mesh = make_device_mesh(MeshAxes(pipe=2))
    with pytest.raises(ValueError, match="prefill_chunk"):
        GenerationEngine(
            spec, params, mesh=mesh, prefill_buckets=[8], prefill_chunk=4
        )
    with pytest.raises(ValueError, match="not divisible"):
        GenerationEngine(
            spec, params, mesh=mesh, prefill_buckets=[9]
        )
    with pytest.raises(ValueError, match="microgroups"):
        GenerationEngine(
            spec, params, mesh=mesh, prefill_buckets=[8], num_slots=5,
            pipe_microgroups=2,
        )


def test_pipelined_bodies_match_with_fused_kernels():
    """The stage bodies route attention through the Pallas kernels
    (interpret mode here) and must reproduce the jnp-path results:
    decode logits exactly-close, prefill logits and written rows."""
    from starpu_inference_server_tpu.models.decoder import (
        _use_fused_decode_attention,
        _use_fused_prefill_attention,
    )
    from starpu_inference_server_tpu.ops import decode_attention as da
    from starpu_inference_server_tpu.ops import nn
    from starpu_inference_server_tpu.ops import prefill_attention as pa
    from starpu_inference_server_tpu.parallel.pipeline_decode import (
        pipelined_verify_step,
    )

    # head_dim 64 and t_max 512 clear both kernel gates
    opts = {"layers": 2, "hidden": 256, "q_heads": 4, "kv_heads": 2,
            "intermediate": 96, "vocab": 64}
    spec = get_spec("llama-tiny", opts)
    params = init_params(spec, np.random.default_rng(20))
    mesh = make_device_mesh(MeshAxes(pipe=2))
    stacked = _stacked(spec, params, mesh)
    rng = np.random.default_rng(21)
    prompt = np.zeros((16,), np.int32)
    prompt[:11] = rng.integers(0, 64, (11,))
    ids = rng.integers(0, 64, (4,), np.int32)
    win = rng.integers(0, 64, (4, 3), np.int32)
    active = np.asarray([True, True, False, True])

    def run():
        cache = init_cache(spec, 4, 512, stacked=True)
        cache, pf_logits = pipelined_prefill(
            spec, stacked, cache, jnp.asarray(prompt), jnp.int32(11),
            jnp.int32(0), mesh, jnp.float32,
        )
        dcache, d_logits = pipelined_decode_step(
            spec, stacked, jax.tree.map(jnp.copy, cache), jnp.asarray(ids),
            jnp.asarray(active), mesh, jnp.float32,
        )
        vcache, v_logits = pipelined_verify_step(
            spec, stacked, cache, jnp.asarray(win), jnp.asarray(active),
            mesh, jnp.float32,
        )
        return (np.asarray(pf_logits), np.asarray(d_logits),
                np.asarray(v_logits))

    want = run()
    nn.set_use_pallas(True)
    da.set_interpret(True)
    pa.set_interpret(True)
    try:
        assert _use_fused_decode_attention(spec, 512)
        assert _use_fused_prefill_attention(spec, 512, min_seq=512)
        got = run()
    finally:
        nn.set_use_pallas(False)
        da.set_interpret(False)
        pa.set_interpret(False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=5e-4, atol=5e-4)
