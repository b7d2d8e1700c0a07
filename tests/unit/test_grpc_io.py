"""I/O validation/conversion unit tests (reference:
tests/unit/grpc/unit_inference_service_io*.cpp behaviors)."""

import numpy as np
import pytest

from starpu_inference_server_tpu.grpc import kserve_v2_pb2 as pb
from starpu_inference_server_tpu.grpc.io import (
    fill_timing_fields,
    populate_response,
    validate_and_convert_inputs,
)
from starpu_inference_server_tpu.utils.config import parse_config
from starpu_inference_server_tpu.utils.exceptions import InputValidationError


def cfg(**over):
    raw = {
        "name": "m",
        "model": "identity",
        "inputs": [
            {"name": "a", "dims": [4], "dtype": "FP32"},
            {"name": "b", "dims": [2, 3], "dtype": "INT64"},
        ],
        "outputs": [{"name": "out", "dims": [4], "dtype": "FP32"}],
        "pool_size": 1,
        "max_batch_size": 4,
        "batch_coalesce_timeout_ms": 0,
        "batching_strategy": "disabled",
        "max_inflight_tasks": 1,
    }
    raw.update(over)
    return parse_config(raw)


def request(a=None, b=None, names=("a", "b"), shapes=None, dtypes=("FP32", "INT64")):
    a = a if a is not None else np.zeros((1, 4), np.float32)
    b = b if b is not None else np.zeros((1, 2, 3), np.int64)
    req = pb.ModelInferRequest(model_name="m")
    arrays = [a, b]
    shapes = shapes or [arr.shape for arr in arrays]
    for name, arr, shape, dt in zip(names, arrays, shapes, dtypes):
        t = req.inputs.add()
        if name:
            t.name = name
        t.datatype = dt
        t.shape.extend(shape)
        req.raw_input_contents.append(arr.tobytes())
    return req


class TestValidate:
    def test_happy_path_zero_copy(self):
        c = cfg()
        req = request()
        out = validate_and_convert_inputs(c, req)
        assert out["a"].shape == (1, 4)
        assert out["b"].shape == (1, 2, 3)
        assert out["b"].dtype == np.int64

    def test_implicit_batch_one(self):
        c = cfg()
        req = request(shapes=[(4,), (2, 3)])
        out = validate_and_convert_inputs(c, req)
        assert out["a"].shape == (1, 4)

    def test_named_inputs_reordered(self):
        c = cfg()
        req = pb.ModelInferRequest(model_name="m")
        b = np.ones((1, 2, 3), np.int64)
        a = np.ones((1, 4), np.float32)
        for name, arr, dt in (("b", b, "INT64"), ("a", a, "FP32")):
            t = req.inputs.add()
            t.name = name
            t.datatype = dt
            t.shape.extend(arr.shape)
            req.raw_input_contents.append(arr.tobytes())
        out = validate_and_convert_inputs(c, req)
        np.testing.assert_array_equal(out["a"], a)

    def test_wrong_input_count(self):
        c = cfg()
        req = request()
        del req.inputs[1]
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, req)

    def test_partial_names_rejected(self):
        c = cfg()
        req = request(names=("a", ""))
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, req)

    def test_unknown_name_rejected(self):
        c = cfg()
        req = request(names=("a", "zzz"))
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, req)

    def test_dtype_mismatch(self):
        c = cfg()
        req = request(dtypes=("FP64", "INT64"))
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, req)

    def test_batch_exceeds_max(self):
        c = cfg()
        a = np.zeros((9, 4), np.float32)
        b = np.zeros((9, 2, 3), np.int64)
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, request(a=a, b=b))

    def test_inconsistent_batch_dims(self):
        c = cfg()
        a = np.zeros((2, 4), np.float32)
        b = np.zeros((3, 2, 3), np.int64)
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, request(a=a, b=b))

    def test_byte_size_mismatch(self):
        c = cfg()
        req = request()
        req.raw_input_contents[0] = req.raw_input_contents[0][:-4]
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, req)

    def test_raw_count_mismatch(self):
        c = cfg()
        req = request()
        req.raw_input_contents.append(b"extra")
        with pytest.raises(InputValidationError):
            validate_and_convert_inputs(c, req)


class TestResponse:
    def test_populate_and_timing(self):
        c = cfg()
        req = request()
        req.id = "r1"
        out = {"out": np.arange(4, dtype=np.float32).reshape(1, 4)}
        resp = populate_response(c, req, out)
        assert resp.id == "r1"
        assert resp.outputs[0].datatype == "FP32"
        assert list(resp.outputs[0].shape) == [1, 4]
        np.testing.assert_array_equal(
            np.frombuffer(resp.raw_output_contents[0], np.float32),
            [0, 1, 2, 3],
        )
        fill_timing_fields(resp, {"total_ms": 5.0, "queue_ms": 1.0},
                           server_receive_ms=123.0, preprocess_ms=0.5)
        assert resp.server_total_ms == 5.0
        assert resp.server_queue_ms == 1.0
        assert resp.server_preprocess_ms == 0.5
        assert resp.server_send_ms >= 123

    def test_requested_output_subset(self):
        c = cfg()
        req = request()
        ro = req.outputs.add()
        ro.name = "out"
        resp = populate_response(c, req, {"out": np.zeros((1, 4), np.float32)})
        assert len(resp.outputs) == 1

    def test_missing_output_raises(self):
        c = cfg()
        req = request()
        ro = req.outputs.add()
        ro.name = "nope"
        with pytest.raises(InputValidationError):
            populate_response(c, req, {"out": np.zeros((1, 4), np.float32)})
