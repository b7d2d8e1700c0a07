"""ModelInfer I/O: request validation/conversion and response fill.

Reference counterpart: src/grpc/server/inference_service_io.cpp:

- input count must equal the configured count, and raw_input_contents
  must match the inputs list (.cpp:203-223);
- named inputs are all-or-nothing and must match expected names
  (.cpp:225-318);
- dtype must parse and match the config; shape must match configured
  dims with a leading batch dim allowed up to max_batch_size
  (validate_configured_shape, .cpp:31-114);
- raw byte size must equal numel x element-size;
- zero-copy: request-owned bytes are wrapped as numpy views without
  copying (np.frombuffer; the copy into the staging slot happens once,
  at batch assembly) — the analogue of the reference's
  ``torch::from_blob`` over request memory (.cpp:142-196);
- response: raw_output_contents + shape/dtype, with ``outputN``
  fallback names (.cpp:377-560).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..utils.config import RuntimeConfig
from ..utils.dtypes import canonical_dtype_name, numpy_dtype, wire_name
from ..utils.exceptions import InputValidationError
from . import kserve_v2_pb2 as pb


def validate_and_convert_inputs(
    cfg: RuntimeConfig, request: pb.ModelInferRequest
) -> Dict[str, np.ndarray]:
    """Validate a ModelInferRequest against the model config and return
    zero-copy numpy views (one per input, batch-leading)."""
    expected = {spec.name: spec for spec in cfg.inputs}
    inputs = list(request.inputs)

    if len(inputs) != len(cfg.inputs):
        raise InputValidationError(
            f"expected {len(cfg.inputs)} inputs, got {len(inputs)}"
        )
    if len(request.raw_input_contents) != len(inputs):
        raise InputValidationError(
            f"raw_input_contents count {len(request.raw_input_contents)} "
            f"does not match inputs count {len(inputs)}"
        )

    # named inputs are all-or-nothing
    names = [t.name for t in inputs]
    named = [n for n in names if n]
    if named and len(named) != len(names):
        raise InputValidationError("either name all inputs or none")
    if named:
        if set(named) != set(expected):
            raise InputValidationError(
                f"input names {sorted(named)} do not match expected "
                f"{sorted(expected)}"
            )
        order = {t.name: i for i, t in enumerate(inputs)}
        pairs = [
            (expected[spec.name], inputs[order[spec.name]],
             request.raw_input_contents[order[spec.name]])
            for spec in cfg.inputs
        ]
    else:
        pairs = [
            (spec, tensor, raw)
            for spec, tensor, raw in zip(
                cfg.inputs, inputs, request.raw_input_contents
            )
        ]

    batch: Optional[int] = None
    out: Dict[str, np.ndarray] = {}
    for spec, tensor, raw in pairs:
        dtype_name = canonical_dtype_name(tensor.datatype)
        if dtype_name != spec.dtype:
            raise InputValidationError(
                f"input {spec.name!r}: dtype {tensor.datatype} does not "
                f"match configured {spec.dtype}"
            )
        shape = tuple(int(d) for d in tensor.shape)
        this_batch = _validate_configured_shape(spec, shape, cfg.max_batch_size)
        if batch is None:
            batch = this_batch
        elif this_batch != batch:
            raise InputValidationError(
                f"input {spec.name!r}: batch dim {this_batch} differs from "
                f"{batch}"
            )
        dt = numpy_dtype(spec.dtype)
        expected_bytes = this_batch * spec.elements_per_sample * dt.itemsize
        if len(raw) != expected_bytes:
            raise InputValidationError(
                f"input {spec.name!r}: raw size {len(raw)} != expected "
                f"{expected_bytes}"
            )
        # zero-copy view over the request-owned buffer
        out[spec.name] = np.frombuffer(raw, dtype=dt).reshape(
            (this_batch, *spec.dims)
        )
    return out


def _validate_configured_shape(spec, shape, max_batch: int) -> int:
    """Returns the batch size. Accepts [dims...] (implicit batch 1) or
    [B, dims...] with 1 <= B <= max_batch
    (reference: validate_configured_shape, inference_service_io.cpp:31-114)."""
    dims = spec.dims
    if shape == dims:
        return 1
    if len(shape) == len(dims) + 1 and tuple(shape[1:]) == dims:
        b = shape[0]
        if b < 1 or b > max_batch:
            raise InputValidationError(
                f"input {spec.name!r}: batch dim {b} outside [1, {max_batch}]"
            )
        return b
    raise InputValidationError(
        f"input {spec.name!r}: shape {list(shape)} does not match configured "
        f"dims {list(dims)} (with optional leading batch dim)"
    )


def populate_response(
    cfg: RuntimeConfig,
    request: pb.ModelInferRequest,
    outputs: Dict[str, np.ndarray],
    response: Optional[pb.ModelInferResponse] = None,
) -> pb.ModelInferResponse:
    """Fill raw_output_contents + output metadata
    (reference: populate_response, inference_service_io.cpp:377-560)."""
    resp = response or pb.ModelInferResponse()
    resp.model_name = request.model_name or cfg.name
    resp.model_version = request.model_version or "1"
    resp.id = request.id

    requested: List[str] = [t.name for t in request.outputs if t.name]
    spec_names = [s.name for s in cfg.outputs]
    order = requested if requested else spec_names

    for i, name in enumerate(order):
        arr = outputs.get(name)
        if arr is None and not requested:
            # fallback resolution: positional outputN naming
            arr = outputs.get(f"output{i}")
        if arr is None:
            raise InputValidationError(f"no output named {name!r}")
        tensor = resp.outputs.add()
        tensor.name = name or f"output{i}"
        tensor.datatype = wire_name(arr.dtype)
        tensor.shape.extend(int(d) for d in arr.shape)
        resp.raw_output_contents.append(np.ascontiguousarray(arr).tobytes())
    return resp


def fill_timing_fields(
    response: pb.ModelInferResponse,
    breakdown: Dict[str, float],
    server_receive_ms: float,
    preprocess_ms: float = 0.0,
    postprocess_ms: float = 0.0,
) -> None:
    """Per-phase server timing surfaced to the client
    (reference: AsyncOps::build_latency_breakdown,
    inference_service_async.cpp:234-249; fields grpc_service.proto:823-908)."""
    from ..utils.clock import wall_ms

    response.server_receive_ms = int(server_receive_ms)
    response.server_queue_ms = breakdown.get("queue_ms", 0.0)
    response.server_batch_ms = breakdown.get("batch_ms", 0.0)
    response.server_submit_ms = breakdown.get("submit_ms", 0.0)
    response.server_scheduling_ms = breakdown.get("scheduling_ms", 0.0)
    response.server_codelet_ms = breakdown.get("codelet_ms", 0.0)
    response.server_inference_ms = breakdown.get("inference_ms", 0.0)
    response.server_callback_ms = breakdown.get("callback_ms", 0.0)
    response.server_total_ms = breakdown.get("total_ms", 0.0)
    response.server_preprocess_ms = preprocess_ms
    response.server_postprocess_ms = postprocess_ms
    now = wall_ms()
    response.server_send_ms = int(now)
    response.server_overall_ms = max(0.0, now - server_receive_ms)
