"""Model-zoo unit tests: registry surface, forward shapes, determinism,
save/load roundtrip, quantized build. Uses tiny image sizes / seq lens so
CPU tests stay fast (reference test analogue: unit/core model-loader
tests with tiny TorchScript fixtures)."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models import (
    available_families,
    build_model,
    get_family,
)
from starpu_inference_server_tpu.models.registry import load_params, save_params
from starpu_inference_server_tpu.utils.config import ModelSettings, QuantMode
from starpu_inference_server_tpu.utils.exceptions import UnknownModelFamilyError

REFERENCE_FAMILIES = [
    # the 9 ResNet-family variants from reference models/import_resnet.py
    "resnet18", "resnet34", "resnet50", "resnet101", "resnet152",
    "resnext50_32x4d", "resnext101_32x8d", "wide_resnet50_2", "wide_resnet101_2",
    # reference models/import_vit.py
    "vit_b_16", "vit_l_16",
    # reference models/import_bert-base-uncased.py
    "bert-base-uncased",
]


def test_reference_families_all_registered():
    families = available_families()
    for fam in REFERENCE_FAMILIES:
        assert fam in families, fam


def test_unknown_family_raises():
    with pytest.raises(UnknownModelFamilyError):
        get_family("resnet19")


@pytest.mark.parametrize("variant", ["resnet18", "resnet50", "resnext50_32x4d",
                                     "wide_resnet50_2"])
def test_resnet_forward_shape(variant):
    model = build_model(
        ModelSettings(family=variant, options={"image_size": 32, "num_classes": 10},
                      compute_dtype="FP32"),
        seed=0,
    )
    x = np.random.default_rng(0).standard_normal((2, 3, 32, 32)).astype(np.float32)
    out = model.apply({"input": jnp.asarray(x)})
    assert out["output"].shape == (2, 10)
    assert out["output"].dtype == jnp.float32
    assert bool(jnp.all(jnp.isfinite(out["output"])))


def test_vit_forward_shape():
    model = build_model(
        ModelSettings(family="vit_b_16", options={"image_size": 32, "num_classes": 10},
                      compute_dtype="FP32"),
        seed=0,
    )
    x = np.zeros((2, 3, 32, 32), np.float32)
    out = model.apply({"input": jnp.asarray(x)})
    assert out["output"].shape == (2, 10)


def test_bert_forward_shape():
    model = build_model(
        ModelSettings(family="bert-base-uncased", options={"seq_len": 16},
                      compute_dtype="FP32"),
        seed=0,
    )
    ids = np.random.default_rng(0).integers(0, 30522, (2, 16), dtype=np.int64)
    mask = np.ones((2, 16), np.int64)
    out = model.apply({"input_ids": jnp.asarray(ids),
                       "attention_mask": jnp.asarray(mask)})
    assert out["last_hidden_state"].shape == (2, 16, 768)
    assert bool(jnp.all(jnp.isfinite(out["last_hidden_state"])))


def test_bert_mask_changes_output():
    model = build_model(
        ModelSettings(family="bert-base-uncased", options={"seq_len": 8},
                      compute_dtype="FP32"),
        seed=0,
    )
    ids = np.random.default_rng(1).integers(0, 30522, (1, 8), dtype=np.int64)
    full = model.apply({"input_ids": jnp.asarray(ids),
                        "attention_mask": jnp.ones((1, 8), jnp.int64)})
    half_mask = np.array([[1, 1, 1, 1, 0, 0, 0, 0]], np.int64)
    half = model.apply({"input_ids": jnp.asarray(ids),
                        "attention_mask": jnp.asarray(half_mask)})
    assert not np.allclose(np.asarray(full["last_hidden_state"][0, 0]),
                           np.asarray(half["last_hidden_state"][0, 0]))


def test_add_one_matches_reference_e2e_model():
    # the reference e2e smoke model is forward(x) = x + 1
    model = build_model(ModelSettings(family="add_one"), seed=0)
    x = np.arange(8, dtype=np.float32)[None]
    out = model.apply({"input": jnp.asarray(x)})
    np.testing.assert_allclose(np.asarray(out["output"]), x + 1)


def test_deterministic_init():
    settings = ModelSettings(family="matmul", options={"dim": 16})
    m1 = build_model(settings, seed=3)
    m2 = build_model(settings, seed=3)
    np.testing.assert_array_equal(m1.params["fc"]["w"], m2.params["fc"]["w"])


def test_params_save_load_roundtrip(tmp_path):
    model = build_model(
        ModelSettings(family="resnet18", options={"image_size": 32},
                      compute_dtype="FP32"),
        seed=0,
    )
    path = str(tmp_path / "ckpt.npz")
    save_params(path, model.params)
    loaded = load_params(path)
    np.testing.assert_array_equal(
        loaded["layer1"][0]["conv1"]["w"], model.params["layer1"][0]["conv1"]["w"]
    )
    # lists restored as lists
    assert isinstance(loaded["layer1"], list)


def test_int8_build_quantizes_weights():
    model = build_model(
        ModelSettings(family="matmul", options={"dim": 64},
                      quantization=QuantMode.INT8, compute_dtype="FP32"),
        seed=0,
    )
    leaf = model.params["fc"]["w"]
    assert isinstance(leaf, dict) and leaf["w_q"].dtype == jnp.int8
    x = np.random.default_rng(0).standard_normal((2, 64)).astype(np.float32)
    out_q = model.apply({"input": jnp.asarray(x)})
    ref = build_model(
        ModelSettings(family="matmul", options={"dim": 64}, compute_dtype="FP32"),
        seed=0,
    )
    out_f = ref.apply({"input": jnp.asarray(x)})
    err = np.abs(np.asarray(out_q["output"]) - np.asarray(out_f["output"])).max()
    scale = np.abs(np.asarray(out_f["output"])).max()
    assert err / scale < 0.05  # int8 weight-only should be close


def test_stem_space_to_depth_matches_direct():
    """The folded 4x4/s1 stem conv is the exact same arithmetic as the
    direct 7x7/s2 conv: same logits (fp32 rtol covers summation-order
    drift), and bit-exact on the int8 conv path (exact int32
    accumulator)."""
    from starpu_inference_server_tpu.models import build_model
    from starpu_inference_server_tpu.ops import nn as _nn
    from starpu_inference_server_tpu.utils.config import (
        ModelSettings,
        QuantMode,
    )

    x = np.random.default_rng(0).standard_normal(
        (2, 3, 64, 64)
    ).astype(np.float32)

    def run(stem_s2d, quant=None, w8a8=False):
        m = build_model(
            ModelSettings(
                family="resnet18", compute_dtype="FP32",
                quantization=QuantMode(quant) if quant else QuantMode.NONE,
                options={"image_size": 64, "num_classes": 10,
                         "stem_s2d": stem_s2d},
            ),
            seed=0,
        )
        _nn.set_w8a8(w8a8)
        try:
            return np.asarray(m.apply({"input": jnp.asarray(x)})["output"])
        finally:
            _nn.set_w8a8(False)

    np.testing.assert_allclose(run(True), run(False), rtol=2e-4, atol=2e-4)
    a, b = run(True, "int8", True), run(False, "int8", True)
    np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_resnet_nhwc_wire_layout_matches_nchw(quant):
    """options.input_layout=NHWC accepts [H,W,3] wire samples and must
    produce EXACTLY the NCHW build's outputs for the same logical image
    (the s2d rearrange yields the identical z tensor either way) —
    VERDICT r3 item 3."""
    rng = np.random.default_rng(0)
    x_nchw = rng.standard_normal((2, 3, 32, 32)).astype(np.float32)
    x_nhwc = np.transpose(x_nchw, (0, 2, 3, 1)).copy()

    outs = {}
    for layout, x in (("NCHW", x_nchw), ("NHWC", x_nhwc)):
        model = build_model(
            ModelSettings(
                family="resnet18",
                compute_dtype="FP32",
                quantization=QuantMode(quant),
                options={"image_size": 32, "input_layout": layout},
            ),
            seed=0,
        )
        expected = (32, 32, 3) if layout == "NHWC" else (3, 32, 32)
        assert model.definition.input_specs[0].dims == expected
        outs[layout] = np.asarray(
            model.definition.apply(
                model.params, {"input": jnp.asarray(x)}, jnp.float32
            )["output"]
        )
    np.testing.assert_array_equal(outs["NCHW"], outs["NHWC"])


def test_resnet_rejects_bad_layout():
    with pytest.raises(ValueError, match="input_layout"):
        build_model(
            ModelSettings(
                family="resnet18",
                compute_dtype="FP32",
                quantization=QuantMode("none"),
                options={"input_layout": "CHWN"},
            ),
            seed=0,
        )
