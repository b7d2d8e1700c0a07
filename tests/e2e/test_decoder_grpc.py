"""E2E: decoder generation over gRPC — ModelInfer full generation and
ModelStreamInfer token streaming (net-new vs the reference, which leaves
ModelStreamInfer UNIMPLEMENTED)."""

import asyncio

import grpc
import numpy as np
import pytest

from starpu_inference_server_tpu.grpc import kserve_v2_pb2 as pb
from starpu_inference_server_tpu.utils.config import parse_config
from tests.e2e.test_grpc_e2e import ServerHarness, run_async


def decoder_cfg():
    return parse_config({
        "name": "llama",
        "model": {
            "family": "llama-tiny",
            "compute_dtype": "FP32",
            "options": {
                "layers": 2, "hidden": 128, "q_heads": 4, "kv_heads": 2,
                "intermediate": 256, "vocab": 128, "seq_len": 16,
                "num_slots": 2, "max_len": 64, "prefill_buckets": [8, 16],
            },
        },
        "inputs": [{"name": "input_ids", "dims": [16], "dtype": "INT64"}],
        "outputs": [{"name": "logits", "dims": [16, 128], "dtype": "FP32"}],
        "pool_size": 1,
        "max_batch_size": 1,
        "batch_coalesce_timeout_ms": 0,
        "batching_strategy": "disabled",
        "max_queue_size": 16,
        "max_inflight_tasks": 1,
        "congestion": {"enabled": False},
        "metrics_enabled": False,
        "server": {"address": "127.0.0.1:0"},
    })


@pytest.fixture(scope="module")
def harness():
    with ServerHarness(decoder_cfg()) as h:
        yield h


def _infer_request(prompt, max_new=5, rid="gen-1"):
    req = pb.ModelInferRequest(model_name="llama", id=rid)
    t = req.inputs.add()
    t.name = "input_ids"
    t.datatype = "INT64"
    t.shape.extend([1, len(prompt)])
    req.raw_input_contents.append(np.asarray(prompt, np.int64).tobytes())
    req.parameters["max_new_tokens"].int64_param = max_new
    return req


def test_model_infer_generates(harness):
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelInferResponse.FromString,
        )
        resp = await infer(_infer_request([3, 7, 11], max_new=5))
        await channel.close()
        return resp

    resp = run_async(go())
    assert resp.outputs[0].name == "output_ids"
    tokens = np.frombuffer(resp.raw_output_contents[0], np.int32)
    assert tokens.shape == (5,)
    assert (tokens >= 0).all() and (tokens < 128).all()
    assert resp.server_total_ms > 0


def test_generation_deterministic(harness):
    async def once():
        channel = grpc.aio.insecure_channel(harness.target)
        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelInferResponse.FromString,
        )
        resp = await infer(_infer_request([5, 9], max_new=4))
        await channel.close()
        return np.frombuffer(resp.raw_output_contents[0], np.int32).tolist()

    assert run_async(once()) == run_async(once())


def test_stream_infer_tokens(harness):
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        stream = channel.stream_stream(
            "/inference.GRPCInferenceService/ModelStreamInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelStreamInferResponse.FromString,
        )

        async def requests():
            yield _infer_request([3, 7, 11], max_new=5, rid="s1")

        tokens = []
        async for resp in stream(requests()):
            assert not resp.error_message
            tokens.append(
                int(np.frombuffer(
                    resp.infer_response.raw_output_contents[0], np.int32
                )[0])
            )
        await channel.close()
        return tokens

    streamed = run_async(go())
    assert len(streamed) == 5

    # streaming and unary must produce identical tokens
    async def unary():
        channel = grpc.aio.insecure_channel(harness.target)
        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelInferResponse.FromString,
        )
        resp = await infer(_infer_request([3, 7, 11], max_new=5))
        await channel.close()
        return np.frombuffer(resp.raw_output_contents[0], np.int32).tolist()

    assert streamed == run_async(unary())


def test_bad_prompt_rejected(harness):
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelInferResponse.FromString,
        )
        req = pb.ModelInferRequest(model_name="llama")
        t = req.inputs.add()
        t.name = "wrong_name"
        t.datatype = "INT64"
        t.shape.extend([1, 3])
        req.raw_input_contents.append(np.zeros(3, np.int64).tobytes())
        try:
            await infer(req)
            return None
        except grpc.aio.AioRpcError as exc:
            return exc.code()
        finally:
            await channel.close()

    assert run_async(go()) == grpc.StatusCode.INVALID_ARGUMENT


def test_client_cancel_frees_slot(harness):
    """Cancelling a long ModelInfer mid-generation stops the engine from
    burning the slot: a follow-up request completes promptly (reference
    parity: AsyncOps::setup_async_cancellation)."""
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelInferResponse.FromString,
        )
        call = infer(_infer_request([3, 7, 11], max_new=40, rid="cxl"),
                     timeout=120)
        await asyncio.sleep(0.3)  # let it enter a slot and decode
        call.cancel()
        try:
            await call
        except (asyncio.CancelledError, grpc.aio.AioRpcError):
            pass
        # the engine must still serve (slot released, not leaked)
        resp = await infer(_infer_request([5, 9], max_new=4, rid="after"),
                           timeout=120)
        await channel.close()
        return np.frombuffer(resp.raw_output_contents[0], np.int32)

    tokens = run_async(go())
    assert tokens.shape == (4,)
