"""Pipeline-parallel SERVING: ModelEngine with devices.mesh.pipe > 1
routes the decoder forward through the GPipe shard_map program
(parallel/pipeline.py) with the layer stack sharded over 'pipe' — and
the result must match the plain single-device forward."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.core.engine import ModelEngine
from starpu_inference_server_tpu.models import build_model
from starpu_inference_server_tpu.utils.config import parse_config

pytestmark = pytest.mark.slow


TINY_OPTS = {"layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
             "intermediate": 256, "vocab": 128, "seq_len": 8}


def pipe_cfg(quant="none", data=1, pipe=2, model=1, expert=1, micro=2,
             family="llama-tiny", opts=None):
    return parse_config({
        "name": "llama_pipe",
        "model": {
            "family": family,
            "compute_dtype": "FP32",
            "quantization": quant,
            "options": dict(TINY_OPTS, **(opts or {})),
        },
        "inputs": [{"name": "input_ids", "dims": [8], "dtype": "INT64"}],
        "outputs": [{"name": "logits", "dims": [8, 128], "dtype": "FP32"}],
        "pool_size": 1,
        "max_batch_size": 4,
        "batch_coalesce_timeout_ms": 0,
        "batching_strategy": "disabled",
        "max_queue_size": 16,
        "max_inflight_tasks": 2,
        "congestion": {"enabled": False},
        "metrics_enabled": False,
        "devices": {"mesh": {"data": data, "pipe": pipe, "model": model,
                             "expert": expert, "microbatches": micro}},
    })


def _compare(cfg):
    model = build_model(cfg.model, seed=cfg.seed)
    engine = ModelEngine(cfg, model)
    assert engine._pipelined
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 128, (4, 8)).astype(np.int64)
    got = engine.fetch(engine.run_padded({"input_ids": ids}))["logits"]
    ref = np.asarray(model.apply({"input_ids": jnp.asarray(ids)})["logits"])
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_pipelined_forward_matches_plain():
    _compare(pipe_cfg())


def test_pipelined_forward_quantized_int8():
    # exercises quant-aware layer stacking (static 'bits' split/merge)
    _compare(pipe_cfg(quant="int8"))


def test_pipelined_composes_with_data_and_model_axes():
    _compare(pipe_cfg(data=2, pipe=2, model=2, micro=2))


def test_pipelined_moe_decoder():
    _compare(pipe_cfg(
        family="moe-tiny",
        opts={"num_experts": 2, "experts_per_token": 1},
    ))


def test_bucket_granularity_includes_microbatches():
    cfg = pipe_cfg(data=2, pipe=2, micro=4)
    model = build_model(cfg.model, seed=cfg.seed)
    engine = ModelEngine(cfg, model)
    # lcm(data=2, microbatches=4) = 4
    assert engine.min_batch_granularity() == 4
    assert engine.effective_bucket(1) == 4


def test_pipe_axis_without_pipeline_apply_raises():
    cfg = parse_config({
        "name": "bert_pipe",
        "model": {
            "family": "bert-base-uncased",
            "compute_dtype": "FP32",
            "options": {"seq_len": 8, "vocab_size": 256},
        },
        "inputs": [
            {"name": "input_ids", "dims": [8], "dtype": "INT64"},
            {"name": "attention_mask", "dims": [8], "dtype": "INT64"},
        ],
        "outputs": [
            {"name": "last_hidden_state", "dims": [8, 768], "dtype": "FP32"},
        ],
        "pool_size": 1,
        "max_batch_size": 4,
        "batch_coalesce_timeout_ms": 0,
        "batching_strategy": "disabled",
        "congestion": {"enabled": False},
        "metrics_enabled": False,
        "devices": {"mesh": {"pipe": 2}},
    })
    model = build_model(cfg.model, seed=cfg.seed)
    from starpu_inference_server_tpu.utils.exceptions import DeviceError

    with pytest.raises(DeviceError):
        ModelEngine(cfg, model)


def test_pipelined_moe_composes_expert_and_model_axes():
    # pipe=2 x expert=2 x model=2 (8 devices): serving path applies the
    # tp_layer_shuffle hook and the manual EP+TP collectives
    _compare(pipe_cfg(
        family="moe-tiny", pipe=2, expert=2, model=2,
        opts={"num_experts": 4, "experts_per_token": 2},
    ))
