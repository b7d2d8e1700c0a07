"""Sharding tests over the virtual 8-device CPU mesh: mesh construction,
TP partition rules, sharded forward correctness vs single-device
(the TPU analogue of the reference's simulated-topology tests,
SURVEY.md section 4.7)."""

import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from starpu_inference_server_tpu.models import build_model
from starpu_inference_server_tpu.parallel import (
    MeshAxes,
    make_device_mesh,
    partition_rules_for,
    shard_params,
    sharded_forward,
)
from starpu_inference_server_tpu.parallel.partition import _spec_for_path
from starpu_inference_server_tpu.utils.config import ModelSettings, QuantMode


def test_mesh_shapes():
    mesh = make_device_mesh(MeshAxes(data=4, model=2))
    assert mesh.shape == {"data": 4, "pipe": 1, "expert": 1, "model": 2}
    mesh = make_device_mesh(MeshAxes(data=1, model=8))
    assert mesh.shape == {"data": 1, "pipe": 1, "expert": 1, "model": 8}
    mesh = make_device_mesh(MeshAxes(data=1, expert=4, model=2))
    assert mesh.shape == {"data": 1, "pipe": 1, "expert": 4, "model": 2}


def test_mesh_too_large_raises():
    with pytest.raises(ValueError):
        make_device_mesh(MeshAxes(data=16, model=2))


def test_partition_rules_transformer_vs_conv():
    rules = partition_rules_for("bert-base-uncased")
    assert rules
    assert _spec_for_path("layers/0/attn/q/w", rules) == P(None, "model")
    assert _spec_for_path("layers/0/attn/o/w", rules) == P("model", None)
    assert _spec_for_path("layers/0/ffn/fc1/w", rules) == P(None, "model")
    assert _spec_for_path("layers/0/ffn/fc2/w", rules) == P("model", None)
    assert _spec_for_path("layers/0/attn_ln/gamma", rules) == P()
    assert partition_rules_for("resnet18") == []


def test_sharded_params_placement():
    mesh = make_device_mesh(MeshAxes(data=2, model=2))
    model = build_model(
        ModelSettings(family="bert-base-uncased",
                      options={"seq_len": 16, "vocab_size": 512},
                      compute_dtype="FP32"),
        seed=0,
    )
    rules = partition_rules_for("bert-base-uncased")
    params = shard_params(model.params, mesh, rules)
    qw = params["layers"][0]["attn"]["q"]["w"]
    # column-parallel: feature dim split over 2 model shards
    shard_shapes = {s.data.shape for s in qw.addressable_shards}
    assert shard_shapes == {(768, 384)}
    gamma = params["layers"][0]["attn_ln"]["gamma"]
    assert {s.data.shape for s in gamma.addressable_shards} == {(768,)}


def test_sharded_forward_matches_single_device():
    model = build_model(
        ModelSettings(family="bert-base-uncased",
                      options={"seq_len": 8, "vocab_size": 256},
                      compute_dtype="FP32"),
        seed=0,
    )
    ids = np.random.default_rng(0).integers(0, 256, (4, 8), dtype=np.int64)
    mask = np.ones((4, 8), np.int64)
    ref = model.apply({"input_ids": ids, "attention_mask": mask})

    mesh = make_device_mesh(MeshAxes(data=2, model=4))
    _, run = sharded_forward(model, mesh, partition_rules_for("bert-base-uncased"))
    out = run({"input_ids": ids, "attention_mask": mask})
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        np.asarray(ref["last_hidden_state"]),
        rtol=2e-4, atol=2e-4,
    )


def test_sharded_forward_int8_quantized():
    model = build_model(
        ModelSettings(family="bert-base-uncased",
                      options={"seq_len": 8, "vocab_size": 256},
                      compute_dtype="FP32", quantization=QuantMode.INT8),
        seed=0,
    )
    mesh = make_device_mesh(MeshAxes(data=2, model=4))
    params, run = sharded_forward(
        model, mesh, partition_rules_for("bert-base-uncased")
    )
    # quantized leaf: int8 weight sharded like the dense weight
    leaf = params["layers"][0]["attn"]["q"]["w"]
    assert {s.data.shape for s in leaf["w_q"].addressable_shards} == {(768, 192)}
    ids = np.zeros((4, 8), np.int64)
    out = run({"input_ids": ids, "attention_mask": np.ones((4, 8), np.int64)})
    assert np.asarray(out["last_hidden_state"]).shape == (4, 8, 768)


def test_data_parallel_resnet():
    model = build_model(
        ModelSettings(family="resnet18",
                      options={"image_size": 32, "num_classes": 10},
                      compute_dtype="FP32"),
        seed=0,
    )
    mesh = make_device_mesh(MeshAxes(data=8, model=1))
    _, run = sharded_forward(model, mesh, partition_rules_for("resnet18"))
    x = np.random.default_rng(0).standard_normal((8, 3, 32, 32)).astype(np.float32)
    out = run({"input": x})
    ref = model.apply({"input": x})
    np.testing.assert_allclose(
        np.asarray(out["output"]), np.asarray(ref["output"]), rtol=2e-4, atol=2e-4
    )
