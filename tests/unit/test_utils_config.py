"""Unit tests for the strict YAML config loader.

Mirrors the reference's config test strategy: unknown-key fatality with
did-you-mean, required keys, cross-field invariants, auto message size
(reference: config_loader.cpp:82-171, runtime_config.hpp:302-438).
"""

import textwrap

import pytest

from starpu_inference_server_tpu.utils.config import (
    BatchingStrategyKind,
    MIN_MESSAGE_BYTES,
    QuantMode,
    SchedulerPolicy,
    load_config,
    parse_config,
)
from starpu_inference_server_tpu.utils.exceptions import (
    InvalidConfigValueError,
    MissingConfigKeyError,
    UnknownConfigKeyError,
)


def base_config():
    return {
        "name": "resnet18",
        "model": {"family": "resnet18", "quantization": "int8"},
        "inputs": [{"name": "input", "dims": [3, 224, 224], "dtype": "FP32"}],
        "outputs": [{"name": "output", "dims": [1000], "dtype": "FP32"}],
        "pool_size": 4,
        "max_batch_size": 16,
        "batch_coalesce_timeout_ms": 2.0,
        "batching_strategy": "adaptive",
        "max_queue_size": 128,
        "max_inflight_tasks": 8,
    }


def test_parse_minimal_config():
    cfg = parse_config(base_config())
    assert cfg.name == "resnet18"
    assert cfg.model.family == "resnet18"
    assert cfg.model.quantization is QuantMode.INT8
    assert cfg.batching_strategy is BatchingStrategyKind.ADAPTIVE
    assert cfg.inputs[0].bytes_per_sample == 3 * 224 * 224 * 4
    assert cfg.devices.scheduler is SchedulerPolicy.EWMA


def test_required_keys():
    for key in ["name", "model", "inputs", "outputs", "pool_size",
                "batch_coalesce_timeout_ms", "batching_strategy"]:
        raw = base_config()
        del raw[key]
        with pytest.raises(MissingConfigKeyError):
            parse_config(raw)


def test_unknown_key_fatal_with_suggestion():
    raw = base_config()
    raw["max_batchsize"] = 4
    with pytest.raises(UnknownConfigKeyError) as exc:
        parse_config(raw)
    assert "max_batch_size" in str(exc.value)


def test_unknown_nested_key():
    raw = base_config()
    raw["devices"] = {"use_gpu": True}
    with pytest.raises(UnknownConfigKeyError):
        parse_config(raw)


def test_queue_vs_batch_invariant():
    raw = base_config()
    raw["max_queue_size"] = 4  # < max_batch_size 16
    with pytest.raises(InvalidConfigValueError):
        parse_config(raw)


def test_inflight_vs_pool_invariant():
    raw = base_config()
    raw["max_inflight_tasks"] = 2  # < pool_size 4
    with pytest.raises(InvalidConfigValueError):
        parse_config(raw)


def test_fixed_batch_must_fit_max():
    raw = base_config()
    raw["batching_strategy"] = "fixed"
    raw["fixed_batching"] = {"batch_size": 32}
    with pytest.raises(InvalidConfigValueError):
        parse_config(raw)


def test_default_buckets_are_powers_of_two_ending_at_max():
    cfg = parse_config(base_config())
    assert cfg.buckets == (1, 2, 4, 8, 16)
    assert cfg.bucket_for(3) == 4
    assert cfg.bucket_for(16) == 16
    assert cfg.bucket_for(100) == 16


def test_explicit_buckets_must_end_at_max():
    raw = base_config()
    raw["batch_bucket_sizes"] = [1, 4, 8]
    with pytest.raises(InvalidConfigValueError):
        parse_config(raw)
    raw["batch_bucket_sizes"] = [1, 4, 16]
    cfg = parse_config(raw)
    assert cfg.buckets == (1, 4, 16)


def test_auto_message_bytes_has_floor():
    cfg = parse_config(base_config())
    assert cfg.resolved_max_message_bytes >= MIN_MESSAGE_BYTES


def test_auto_message_bytes_scales_with_io():
    raw = base_config()
    raw["inputs"] = [{"name": "x", "dims": [4096, 4096], "dtype": "FP32"}]
    raw["max_batch_size"] = 16
    raw["max_queue_size"] = 128
    cfg = parse_config(raw)
    assert cfg.resolved_max_message_bytes > MIN_MESSAGE_BYTES


def test_string_dtype_rejected():
    raw = base_config()
    raw["inputs"] = [{"name": "x", "dims": [8], "dtype": "BYTES"}]
    with pytest.raises(Exception):
        parse_config(raw)


def test_model_params_path_must_exist():
    raw = base_config()
    raw["model"] = {"family": "resnet18", "params": "/nonexistent/ckpt"}
    with pytest.raises(InvalidConfigValueError):
        parse_config(raw)


def test_load_config_roundtrip(tmp_path):
    yml = textwrap.dedent(
        """
        name: tiny
        model: identity
        inputs:
          - {name: x, dims: [8], dtype: FP32}
        outputs:
          - {name: y, dims: [8], dtype: FP32}
        pool_size: 2
        max_batch_size: 4
        batch_coalesce_timeout_ms: 0
        batching_strategy: disabled
        max_inflight_tasks: 4
        xla_env:
          XLA_FLAGS: "--foo"
        """
    )
    path = tmp_path / "cfg.yml"
    path.write_text(yml)
    cfg = load_config(str(path))
    assert cfg.model.family == "identity"
    assert cfg.xla_env["XLA_FLAGS"] == "--foo"


def test_load_config_missing_file():
    with pytest.raises(InvalidConfigValueError):
        load_config("/nonexistent/cfg.yml")
