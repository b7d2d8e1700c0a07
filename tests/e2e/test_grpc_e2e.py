"""E2E smoke: real gRPC server + client over localhost with the x+1
model (reference: tests/e2e/smoke/test_full_inference.cpp:46-100 — a
TorchScript ``forward(x) = x + 1`` model served end-to-end, asserting
response bytes and timing fields) and a queue-full regression test
(reference: tests/e2e/regression/test_race_shutdown.cpp:71+)."""

import asyncio
import threading

import grpc
import numpy as np
import pytest

from starpu_inference_server_tpu.clients.client import InferenceClient
from starpu_inference_server_tpu.grpc import kserve_v2_pb2 as pb
from starpu_inference_server_tpu.grpc.server import InferenceServer
from starpu_inference_server_tpu.utils.config import TensorSpec, parse_config


def e2e_cfg(**over):
    raw = {
        "name": "add_one",
        "model": {"family": "add_one"},
        "inputs": [{"name": "input", "dims": [8], "dtype": "FP32"}],
        "outputs": [{"name": "output", "dims": [8], "dtype": "FP32"}],
        "pool_size": 2,
        "max_batch_size": 4,
        "batch_coalesce_timeout_ms": 1.0,
        "batching_strategy": "fixed",
        "fixed_batching": {"batch_size": 4},
        "max_queue_size": 64,
        "max_inflight_tasks": 4,
        "warmup_request_nb": 1,
        "congestion": {"enabled": False},
        "metrics_enabled": False,
        "server": {"address": "127.0.0.1:0"},
    }
    raw.update(over)
    return parse_config(raw)


class ServerHarness:
    """Runs InferenceServer.serve() on a private asyncio loop thread."""

    def __init__(self, cfg):
        self.server = InferenceServer(cfg, expose_metrics=False)
        self.ready = threading.Event()
        self.loop = asyncio.new_event_loop()
        self.thread = threading.Thread(target=self._run, daemon=True)

    def _run(self):
        asyncio.set_event_loop(self.loop)
        self.loop.run_until_complete(
            self.server.serve(warmup=True, ready_event=self.ready)
        )
        self.loop.close()

    def __enter__(self):
        self.thread.start()
        assert self.ready.wait(timeout=60), "server failed to start"
        self.target = f"127.0.0.1:{self.server.bound_port}"
        return self

    def __exit__(self, *exc):
        self.loop.call_soon_threadsafe(self.server.request_stop)
        self.thread.join(timeout=30)


@pytest.fixture(scope="module")
def harness():
    with ServerHarness(e2e_cfg()) as h:
        yield h


def run_async(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_model_infer_roundtrip(harness):
    async def go():
        specs = [TensorSpec("input", (8,), "FP32")]
        client = InferenceClient(harness.target, "add_one", specs)
        await client.wait_ready()
        elapsed = await client.run_fixed(count=10, delay_us=500)
        summary = client.summary(elapsed)
        await client.close()
        return client, summary

    client, summary = run_async(go())
    assert summary["requests"]["handled"] == 10
    assert summary["requests"]["rejected"] == 0
    assert summary["throughput_rps"] > 0
    # timing extension fields must be populated
    assert summary["latency_ms"]["server_overall"]["p100"] > 0
    assert summary["latency_ms"]["codelet"]["p100"] > 0
    assert summary["latency_ms"]["job_total"]["p100"] > 0


def test_output_bytes_are_x_plus_one(harness):
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelInferResponse.FromString,
        )
        x = np.arange(8, dtype=np.float32).reshape(1, 8)
        req = pb.ModelInferRequest(model_name="add_one", id="t1")
        t = req.inputs.add()
        t.name = "input"
        t.datatype = "FP32"
        t.shape.extend([1, 8])
        req.raw_input_contents.append(x.tobytes())
        resp = await infer(req)
        await channel.close()
        return x, resp

    x, resp = run_async(go())
    assert resp.id == "t1"
    assert resp.outputs[0].name == "output"
    assert resp.outputs[0].datatype == "FP32"
    assert list(resp.outputs[0].shape) == [1, 8]
    out = np.frombuffer(resp.raw_output_contents[0], np.float32).reshape(1, 8)
    np.testing.assert_allclose(out, x + 1)
    assert resp.server_total_ms > 0
    assert resp.server_send_ms >= resp.server_receive_ms


def test_metadata_rpcs(harness):
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)

        async def call(rpc_name, req_cls, resp_cls, **kw):
            rpc = channel.unary_unary(
                f"/inference.GRPCInferenceService/{rpc_name}",
                request_serializer=req_cls.SerializeToString,
                response_deserializer=resp_cls.FromString,
            )
            return await rpc(req_cls(**kw))

        live = await call("ServerLive", pb.ServerLiveRequest, pb.ServerLiveResponse)
        meta = await call("ServerMetadata", pb.ServerMetadataRequest,
                          pb.ServerMetadataResponse)
        mmeta = await call("ModelMetadata", pb.ModelMetadataRequest,
                           pb.ModelMetadataResponse, name="add_one")
        mcfg = await call("ModelConfig", pb.ModelConfigRequest,
                          pb.ModelConfigResponse, name="add_one")
        mready = await call("ModelReady", pb.ModelReadyRequest,
                            pb.ModelReadyResponse, name="add_one")
        await channel.close()
        return live, meta, mmeta, mcfg, mready

    live, meta, mmeta, mcfg, mready = run_async(go())
    assert live.live and mready.ready
    assert meta.name == "starpu-inference-server-tpu"
    assert mmeta.platform == "jax_xla_tpu"
    assert mmeta.inputs[0].name == "input"
    assert list(mmeta.inputs[0].shape) == [-1, 8]
    assert mcfg.config.max_batch_size == 4
    assert mcfg.config.input[0].data_type == pb.TYPE_FP32


def test_statistics_accumulate(harness):
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        stats = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelStatistics",
            request_serializer=pb.ModelStatisticsRequest.SerializeToString,
            response_deserializer=pb.ModelStatisticsResponse.FromString,
        )
        resp = await stats(pb.ModelStatisticsRequest(name="add_one"))
        await channel.close()
        return resp

    resp = run_async(go())
    stat = resp.model_stats[0]
    assert stat.inference_count > 0
    assert stat.inference_stats.success.count > 0
    # per-batch-size aggregates (reference: InferBatchStatistics)
    assert len(stat.batch_stats) > 0
    assert sum(b.compute_infer.count for b in stat.batch_stats) > 0


def test_unimplemented_rpcs(harness):
    """Shared-memory RPCs stay UNIMPLEMENTED (no CUDA/system shm on TPU).

    Repository*/LogSettings/TraceSetting are implemented here (beyond the
    reference, which leaves them UNIMPLEMENTED too:
    inference_service_metadata.cpp:293-400) — see the dedicated tests below.
    """

    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        rpc = channel.unary_unary(
            "/inference.GRPCInferenceService/SystemSharedMemoryStatus",
            request_serializer=pb.SystemSharedMemoryStatusRequest.SerializeToString,
            response_deserializer=pb.SystemSharedMemoryStatusResponse.FromString,
        )
        try:
            await rpc(pb.SystemSharedMemoryStatusRequest())
            return None
        except grpc.aio.AioRpcError as exc:
            return exc.code()
        finally:
            await channel.close()

    assert run_async(go()) == grpc.StatusCode.UNIMPLEMENTED


def test_repository_index_and_load_cycle(harness):
    """RepositoryIndex reports READY; unload gates infers; load restores."""

    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        index = channel.unary_unary(
            "/inference.GRPCInferenceService/RepositoryIndex",
            request_serializer=pb.RepositoryIndexRequest.SerializeToString,
            response_deserializer=pb.RepositoryIndexResponse.FromString,
        )
        unload = channel.unary_unary(
            "/inference.GRPCInferenceService/RepositoryModelUnload",
            request_serializer=pb.RepositoryModelUnloadRequest.SerializeToString,
            response_deserializer=pb.RepositoryModelUnloadResponse.FromString,
        )
        load = channel.unary_unary(
            "/inference.GRPCInferenceService/RepositoryModelLoad",
            request_serializer=pb.RepositoryModelLoadRequest.SerializeToString,
            response_deserializer=pb.RepositoryModelLoadResponse.FromString,
        )
        try:
            resp = await index(pb.RepositoryIndexRequest())
            assert len(resp.models) == 1
            assert resp.models[0].state == "READY"

            await unload(pb.RepositoryModelUnloadRequest(model_name="add_one"))
            resp = await index(pb.RepositoryIndexRequest())
            assert resp.models[0].state == "UNAVAILABLE"
            # ready=true filters out the unloaded model entirely
            resp = await index(pb.RepositoryIndexRequest(ready=True))
            assert len(resp.models) == 0

            await load(pb.RepositoryModelLoadRequest(model_name="add_one"))
            resp = await index(pb.RepositoryIndexRequest(ready=True))
            assert len(resp.models) == 1 and resp.models[0].state == "READY"
        finally:
            await channel.close()

    run_async(go())


def test_invalid_input_rejected(harness):
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        infer = channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=pb.ModelInferRequest.SerializeToString,
            response_deserializer=pb.ModelInferResponse.FromString,
        )
        req = pb.ModelInferRequest(model_name="add_one")
        t = req.inputs.add()
        t.name = "input"
        t.datatype = "FP32"
        t.shape.extend([1, 5])  # wrong trailing dim
        req.raw_input_contents.append(b"\0" * 20)
        try:
            await infer(req)
            return None
        except grpc.aio.AioRpcError as exc:
            return exc.code()
        finally:
            await channel.close()

    assert run_async(go()) == grpc.StatusCode.INVALID_ARGUMENT


def test_queue_full_returns_resource_exhausted():
    """Reference regression: a size-1 queue under concurrent load must
    reject with RESOURCE_EXHAUSTED and shut down race-free
    (tests/e2e/regression/test_race_shutdown.cpp:71+)."""
    cfg = e2e_cfg(
        max_queue_size=1,
        max_batch_size=1,
        pool_size=1,
        max_inflight_tasks=1,
        batching_strategy="disabled",
        fixed_batching=None,
    )
    with ServerHarness(cfg) as h:
        async def go():
            specs = [TensorSpec("input", (8,), "FP32")]
            client = InferenceClient(h.target, "add_one", specs)
            await client.wait_ready()
            elapsed = await client.run_fixed(count=200, delay_us=0)
            summary = client.summary(elapsed)
            await client.close()
            return summary

        summary = run_async(go())
    assert summary["requests"]["handled"] + summary["requests"]["rejected"] == 200
    assert summary["requests"]["errors"] == 0
    assert summary["requests"]["handled"] > 0


def test_health_service(harness):
    """The standard grpc.health.v1.Health service answers SERVING
    (hand-encoded wire format; reference registers the same service,
    inference_service_async_server.cpp:446-457)."""
    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        check = channel.unary_unary(
            "/grpc.health.v1.Health/Check",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        resp = await check(b"")
        assert resp == b"\x08\x01"  # status: SERVING
        watch = channel.unary_stream(
            "/grpc.health.v1.Health/Watch",
            request_serializer=lambda b: b,
            response_deserializer=lambda b: b,
        )
        async for msg in watch(b""):
            assert msg == b"\x08\x01"
            break
        await channel.close()

    run_async(go())


def test_client_response_validation(harness):
    """--validate: every response's bytes check out against the analytic
    oracle; a wrong oracle trips the failure counter (the load client
    must fail on wrong bytes, not just slow ones — reference:
    inference_client.cpp expected-output verification)."""

    async def go(expected_fn):
        specs = [TensorSpec("input", (8,), "FP32")]
        client = InferenceClient(
            harness.target, "add_one", specs,
            validate=True, expected_fn=expected_fn,
        )
        await client.wait_ready()
        await client.prime_expected()
        elapsed = await client.run_fixed(count=10, delay_us=200)
        summary = client.summary(elapsed)
        await client.close()
        return summary

    good = run_async(go(lambda inputs: {"output": inputs["input"] + 1.0}))
    assert good["validation"]["checked"] == 10
    assert good["validation"]["failures"] == 0

    bad = run_async(go(lambda inputs: {"output": inputs["input"] + 2.0}))
    assert bad["validation"]["failures"] > 0
    assert "mismatch" in bad["validation"]["first_mismatch"]

    # no oracle: priming-pass self-consistency also passes
    auto = run_async(go(None))
    assert auto["validation"]["checked"] == 10
    assert auto["validation"]["failures"] == 0


def test_reflection_service(harness):
    """grpc.reflection.v1alpha works: list_services names the inference
    + health + reflection services and file_containing_symbol returns a
    parseable FileDescriptorProto for the kserve file (grpcurl's
    discovery flow)."""
    from google.protobuf import descriptor_pb2

    from starpu_inference_server_tpu.grpc import kserve_v2_pb2 as pb
    from starpu_inference_server_tpu.grpc import reflection_v1alpha_pb2 as rpb

    async def go():
        channel = grpc.aio.insecure_channel(harness.target)
        stream = channel.stream_stream(
            "/grpc.reflection.v1alpha.ServerReflection/ServerReflectionInfo",
            request_serializer=rpb.ServerReflectionRequest.SerializeToString,
            response_deserializer=rpb.ServerReflectionResponse.FromString,
        )
        reqs = [
            rpb.ServerReflectionRequest(list_services="*"),
            rpb.ServerReflectionRequest(
                file_containing_symbol="inference.GRPCInferenceService"
            ),
            rpb.ServerReflectionRequest(file_by_filename="nope.proto"),
            rpb.ServerReflectionRequest(
                file_containing_symbol="grpc.health.v1.Health"
            ),
            rpb.ServerReflectionRequest(
                file_containing_symbol=(
                    "grpc.reflection.v1alpha.ServerReflection"
                )
            ),
            rpb.ServerReflectionRequest(
                all_extension_numbers_of_type="no.such.Type"
            ),
        ]
        out = []
        call = stream()
        for r in reqs:
            await call.write(r)
            out.append(await call.read())
        await call.done_writing()
        await channel.close()
        return out

    listed, by_symbol, missing, health_sym, refl_sym, bad_ext = run_async(go())
    names = {s.name for s in listed.list_services_response.service}
    assert "inference.GRPCInferenceService" in names
    assert "grpc.health.v1.Health" in names
    assert "grpc.reflection.v1alpha.ServerReflection" in names
    fds = by_symbol.file_descriptor_response.file_descriptor_proto
    assert len(fds) == 1
    fdp = descriptor_pb2.FileDescriptorProto.FromString(fds[0])
    assert fdp.name == pb.DESCRIPTOR.name
    assert any(s.name == "GRPCInferenceService" for s in fdp.service)
    assert missing.error_response.error_code != 0
    # every advertised service must be describable (grpcurl `describe`)
    for got, svc in ((health_sym, "Health"), (refl_sym, "ServerReflection")):
        fds = got.file_descriptor_response.file_descriptor_proto
        assert len(fds) == 1, got
        fdp = descriptor_pb2.FileDescriptorProto.FromString(fds[0])
        assert any(s.name == svc for s in fdp.service)
    # unknown types are NOT_FOUND, not silently-empty extension sets
    assert bad_ext.error_response.error_code != 0
