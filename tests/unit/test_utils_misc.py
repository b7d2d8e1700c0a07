"""Unit tests for dtypes, logger verbosity, exceptions, input generator,
latency statistics (reference: tests/unit/utils/*)."""

import numpy as np
import pytest

from starpu_inference_server_tpu.utils import dtypes
from starpu_inference_server_tpu.utils.config import TensorSpec
from starpu_inference_server_tpu.utils.exceptions import (
    CancelledError,
    ErrorCategory,
    InferenceEngineError,
    InvalidDtypeError,
    QueueFullError,
    UnsupportedDtypeError,
    classify_exception,
    run_with_logged_exceptions,
)
from starpu_inference_server_tpu.utils.input_generator import (
    generate_input,
    pre_generate_inputs,
)
from starpu_inference_server_tpu.utils.latency_statistics import summarize
from starpu_inference_server_tpu.utils.logger import Verbosity


class TestDtypes:
    def test_roundtrip_all(self):
        for name in dtypes.ALL_WIRE_DTYPES:
            dt = dtypes.numpy_dtype(name)
            assert dtypes.wire_name(dt) == name
            assert dtypes.element_size(name) == dt.itemsize

    def test_aliases(self):
        assert dtypes.canonical_dtype_name("float32") == "FP32"
        assert dtypes.canonical_dtype_name("bfloat16") == "BF16"
        assert dtypes.canonical_dtype_name("TYPE_FP16") == "FP16"

    def test_bf16_element_size(self):
        assert dtypes.element_size("BF16") == 2

    def test_string_rejected(self):
        with pytest.raises(UnsupportedDtypeError):
            dtypes.canonical_dtype_name("BYTES")

    def test_unknown_rejected(self):
        with pytest.raises(InvalidDtypeError):
            dtypes.canonical_dtype_name("FP128")


class TestVerbosity:
    def test_parse_forms(self):
        assert Verbosity.parse("debug") is Verbosity.DEBUG
        assert Verbosity.parse(2) is Verbosity.STATS
        assert Verbosity.parse("4") is Verbosity.TRACE
        assert Verbosity.parse(Verbosity.INFO) is Verbosity.INFO

    def test_parse_invalid(self):
        with pytest.raises(ValueError):
            Verbosity.parse("loud")
        with pytest.raises(ValueError):
            Verbosity.parse(9)


class TestExceptions:
    def test_classification(self):
        assert classify_exception(QueueFullError()) is ErrorCategory.INFERENCE_ENGINE
        assert classify_exception(CancelledError()) is ErrorCategory.INFERENCE_ENGINE
        assert classify_exception(MemoryError()) is ErrorCategory.BAD_ALLOC
        assert classify_exception(ValueError()) is ErrorCategory.LOGIC_ERROR
        assert classify_exception(RuntimeError()) is ErrorCategory.RUNTIME_ERROR
        assert classify_exception(OSError()) is ErrorCategory.STD_EXCEPTION

    def test_hierarchy_root(self):
        assert issubclass(QueueFullError, InferenceEngineError)

    def test_run_with_logged_exceptions_contains(self):
        assert run_with_logged_exceptions(lambda: 7, "ok") == 7
        assert run_with_logged_exceptions(
            lambda: (_ for _ in ()).throw(RuntimeError("boom")), "bad"
        ) is None


class TestInputGenerator:
    def test_float_shape_dtype(self, rng):
        spec = TensorSpec("x", (3, 8, 8), "FP32")
        arr = generate_input(spec, 4, rng)
        assert arr.shape == (4, 3, 8, 8)
        assert arr.dtype == np.float32

    def test_token_ids_bounded(self, rng):
        spec = TensorSpec("ids", (128,), "INT64")
        arr = generate_input(spec, 2, rng)
        assert arr.max() < 30522 and arr.min() >= 0

    def test_mask_like_small_ints(self, rng):
        spec = TensorSpec("mask", (8,), "INT32")
        arr = generate_input(spec, 2, rng)
        assert set(np.unique(arr)) <= {0, 1}

    def test_pregenerate_deterministic(self):
        specs = [TensorSpec("x", (4,), "FP32")]
        a = pre_generate_inputs(specs, 1, 3, seed=7)
        b = pre_generate_inputs(specs, 1, 3, seed=7)
        for da, db in zip(a, b):
            np.testing.assert_array_equal(da["x"], db["x"])


class TestLatencyStats:
    def test_summary_fields(self):
        s = summarize([1.0, 2.0, 3.0, 4.0])
        assert set(s) == {"mean", "p50", "p85", "p95", "p100"}
        assert s["p100"] == 4.0
        assert s["mean"] == 2.5

    def test_empty(self):
        s = summarize([])
        assert s["p95"] == 0.0
