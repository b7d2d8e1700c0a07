"""Block-aligned TP layouts (parallel/tp_layout.py): the fused-projection
column shuffle must make contiguous 1/tp slices exactly [q_d|k_d|v_d]
(resp. [gate_d|up_d]), commute with quantization, and pairwise-packed
int4 row shards must equal per-shard packs."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.ops.quant import (
    maybe_quantize_tree,
    pack_int4,
    quantize_per_channel,
    unpack_int4,
)
from starpu_inference_server_tpu.parallel.tp_layout import (
    block_tp_permutation,
    permute_out_columns,
    repack_int4_rows,
    shuffle_decoder_layer_for_tp,
    validate_decoder_tp,
)

TINY = {"layers": 2, "hidden": 64, "q_heads": 4, "kv_heads": 2,
        "intermediate": 32, "vocab": 64}


def test_block_tp_permutation_blocks():
    # groups [q=8, k=4, v=4], tp=2: device 0's contiguous half must be
    # [q0..3 | k0..1 | v0..1] in original indices
    perm = block_tp_permutation([8, 4, 4], 2)
    np.testing.assert_array_equal(
        perm,
        [0, 1, 2, 3, 8, 9, 12, 13, 4, 5, 6, 7, 10, 11, 14, 15],
    )


def test_block_tp_permutation_divisibility():
    with pytest.raises(ValueError, match="not divisible"):
        block_tp_permutation([6, 4], 4)


def test_permute_commutes_with_quantization():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 24)).astype(np.float32)
    perm = block_tp_permutation([12, 12], 2)
    w_q, scale = quantize_per_channel(jnp.asarray(w), bits=8, axis=-1)
    node = {"w_q": w_q, "scale": scale, "bits": 8}
    shuffled = permute_out_columns(node, perm)
    # quantize(shuffle(w)) == shuffle(quantize(w)) for per-column scales
    wq2, scale2 = quantize_per_channel(jnp.asarray(w[:, perm]), bits=8, axis=-1)
    np.testing.assert_array_equal(np.asarray(shuffled["w_q"]), np.asarray(wq2))
    np.testing.assert_allclose(
        np.asarray(shuffled["scale"]), np.asarray(scale2)
    )


def test_repack_int4_rows_shards_are_per_shard_packs():
    rng = np.random.default_rng(1)
    w = rng.integers(-7, 8, (16, 8)).astype(np.int8)
    node = {"w_p4": pack_int4(jnp.asarray(w)),
            "scale": jnp.ones((1, 8), jnp.float32), "bits": 4}
    tp = 2
    repacked = repack_int4_rows(node, tp)["w_p4"]  # [16/2, 8] packed
    rows_per_shard = repacked.shape[0] // tp
    for d in range(tp):
        shard = repacked[d * rows_per_shard : (d + 1) * rows_per_shard]
        want = pack_int4(jnp.asarray(w[d * 8 : (d + 1) * 8]))
        np.testing.assert_array_equal(np.asarray(shard), np.asarray(want))
        # and unpacking the shard yields the original row shard
        np.testing.assert_array_equal(
            np.asarray(unpack_int4(shard)), w[d * 8 : (d + 1) * 8]
        )


@pytest.mark.parametrize("quant", [None, 8])
def test_shuffled_layer_shards_match_per_projection_slices(quant):
    """Device d's contiguous qkv column shard of the SHUFFLED fused weight
    equals the concat of per-projection head slices — the invariant the
    shard_map layer body relies on."""
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(2))
    if quant:
        params = maybe_quantize_tree(params, bits=quant)
    layer = params["layers"][0]
    tp = 2
    shuffled = shuffle_decoder_layer_for_tp(spec, layer, tp)

    def dense_w(node):
        from starpu_inference_server_tpu.ops.nn import resolve_weight

        return np.asarray(resolve_weight(node["w"], jnp.float32))

    w = dense_w(layer["attn"]["qkv"])
    ws = dense_w(shuffled["attn"]["qkv"])
    d = spec.head_dim
    dq, dkv = spec.q_heads * d, spec.kv_heads * d
    q, k, v = w[:, :dq], w[:, dq : dq + dkv], w[:, dq + dkv :]
    cols = ws.shape[1] // tp
    for dev in range(tp):
        shard = ws[:, dev * cols : (dev + 1) * cols]
        lq, lkv = dq // tp, dkv // tp
        want = np.concatenate(
            [
                q[:, dev * lq : (dev + 1) * lq],
                k[:, dev * lkv : (dev + 1) * lkv],
                v[:, dev * lkv : (dev + 1) * lkv],
            ],
            axis=1,
        )
        np.testing.assert_allclose(shard, want, rtol=1e-6, atol=1e-6)

    # gate_up: local columns are [gate_d | up_d]
    g = dense_w(layer["mlp"]["gate_up"])
    gs = dense_w(shuffled["mlp"]["gate_up"])
    inter = spec.intermediate
    cols = gs.shape[1] // tp
    for dev in range(tp):
        shard = gs[:, dev * cols : (dev + 1) * cols]
        li = inter // tp
        want = np.concatenate(
            [
                g[:, dev * li : (dev + 1) * li],
                g[:, inter + dev * li : inter + (dev + 1) * li],
            ],
            axis=1,
        )
        np.testing.assert_allclose(shard, want, rtol=1e-6, atol=1e-6)


def test_validate_decoder_tp():
    spec = get_spec("llama-tiny", TINY)  # q=4, kv=2
    validate_decoder_tp(spec, 2)
    with pytest.raises(ValueError, match="must divide"):
        validate_decoder_tp(spec, 8)
