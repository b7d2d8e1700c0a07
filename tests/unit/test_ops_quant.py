"""Quantization op tests: per-channel roundtrip error, int4 packing,
tree quantization selectivity."""

import jax.numpy as jnp
import numpy as np

from starpu_inference_server_tpu.ops.quant import (
    dequantize,
    is_quantized_leaf,
    maybe_quantize_tree,
    pack_int4,
    quantization_error,
    quantize_per_channel,
    unpack_int4,
)


def test_int8_roundtrip_error_small():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((64, 32)), jnp.float32)
    assert quantization_error(w, bits=8) < 0.01


def test_int4_roundtrip_error_larger_but_bounded():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((64, 32)), jnp.float32)
    err4 = quantization_error(w, bits=4)
    err8 = quantization_error(w, bits=8)
    assert err8 < err4 < 0.2


def test_scale_per_output_channel():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8)), jnp.float32)
    w_q, scale = quantize_per_channel(w, bits=8, axis=-1)
    assert w_q.shape == (16, 8) and w_q.dtype == jnp.int8
    assert scale.shape == (1, 8)
    # each channel hits full range
    assert int(jnp.abs(w_q).max()) == 127


def test_zero_channel_safe():
    w = jnp.zeros((4, 4), jnp.float32)
    w_q, scale = quantize_per_channel(w)
    np.testing.assert_array_equal(np.asarray(dequantize(w_q, scale, jnp.float32)), 0)


def test_int4_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.integers(-7, 8, (16, 8)), jnp.int8)
    packed = pack_int4(w)
    assert packed.shape == (8, 8) and packed.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(unpack_int4(packed)), np.asarray(w))


def test_tree_quantization_only_hits_weights():
    tree = {
        "fc": {
            "w": jnp.ones((8, 8), jnp.float32),
            "b": jnp.ones((8,), jnp.float32),
        },
        "ln": {"gamma": jnp.ones((8,), jnp.float32)},
        "blocks": [{"w": jnp.ones((4, 4), jnp.float32)}],
    }
    out = maybe_quantize_tree(tree, bits=8)
    assert is_quantized_leaf(out["fc"]["w"])
    assert not is_quantized_leaf(out["fc"]["b"])
    assert out["ln"]["gamma"].dtype == jnp.float32
    assert is_quantized_leaf(out["blocks"][0]["w"])
    # bits=None is identity
    assert maybe_quantize_tree(tree, None) is tree
