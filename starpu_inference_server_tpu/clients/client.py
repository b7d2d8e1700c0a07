"""Async gRPC load-generator client.

Reference counterpart: src/grpc/client/{client_main.cpp,
inference_client.*} — an async ModelInfer generator driven either by a
fixed delay or a **schedule replay** CSV of ``delta_us,repeat[,input_id]``
segments over a pool of 5 pre-generated input tensors
(docs/client_guide.md:104-132), producing a summary JSON with
``requests{sent,handled,rejected}``, ``throughput_rps`` and
mean/p50/p85/p95/p100 for the roundtrip and all server-side phases
(inference_client.hpp:30-67; write_summary_json
inference_client.cpp:277-360). The perf CI gates
(scripts/check_perf_summary.py / compare_perf_summaries.py) consume this
exact schema.
"""

from __future__ import annotations

import argparse
import asyncio
import dataclasses
import json
import time
from typing import Dict, List, Optional, Sequence

import grpc
import numpy as np

from ..utils.clock import wall_ms
from ..utils.config import TensorSpec
from ..utils.dtypes import canonical_dtype_name
from ..utils.input_generator import generate_inputs
from ..utils.latency_statistics import summarize
from . import _pb  # re-exported generated module

INPUT_POOL_SIZE = 5  # reference pre-generates 5 tensors

PHASE_FIELDS = (
    ("server_overall", "server_overall_ms"),
    ("preprocess", "server_preprocess_ms"),
    ("queue", "server_queue_ms"),
    ("batching", "server_batch_ms"),
    ("submit", "server_submit_ms"),
    ("scheduling", "server_scheduling_ms"),
    ("codelet", "server_codelet_ms"),
    ("inference", "server_inference_ms"),
    ("callback", "server_callback_ms"),
    ("postprocess", "server_postprocess_ms"),
    ("job_total", "server_total_ms"),
)


@dataclasses.dataclass
class LatencySample:
    roundtrip_ms: float
    request_ms: float     # client send -> server receive
    response_ms: float    # server send -> client receive
    phases: Dict[str, float]


@dataclasses.dataclass
class ScheduleSegment:
    delta_us: int
    repeat: int
    input_id: Optional[int] = None


def parse_input_arg(arg: str) -> TensorSpec:
    """--input name:dxdxd:dtype, e.g. input:3x224x224:FP32."""
    parts = arg.split(":")
    if len(parts) != 3:
        raise ValueError(f"--input must be name:shape:dtype, got {arg!r}")
    name, shape_s, dtype = parts
    dims = tuple(int(d) for d in shape_s.lower().split("x"))
    return TensorSpec(name=name, dims=dims, dtype=canonical_dtype_name(dtype))


def load_schedule(path: str) -> List[ScheduleSegment]:
    """CSV rows ``delta_us,repeat[,input_id]``
    (reference: docs/client_guide.md:104-132)."""
    segments = []
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split(",")
            segments.append(
                ScheduleSegment(
                    delta_us=int(parts[0]),
                    repeat=int(parts[1]),
                    input_id=int(parts[2]) if len(parts) > 2 else None,
                )
            )
    return segments


class InferenceClient:
    def __init__(
        self,
        target: str,
        model_name: str,
        specs: Sequence[TensorSpec],
        batch: int = 1,
        seed: int = 7,
        max_message_bytes: int = 256 * 1024 * 1024,
    ):
        self.target = target
        self.model_name = model_name
        self.specs = list(specs)
        self.batch = batch
        options = [
            ("grpc.max_receive_message_length", max_message_bytes),
            ("grpc.max_send_message_length", max_message_bytes),
        ]
        self._channel = grpc.aio.insecure_channel(target, options=options)
        self._infer = self._channel.unary_unary(
            "/inference.GRPCInferenceService/ModelInfer",
            request_serializer=_pb.ModelInferRequest.SerializeToString,
            response_deserializer=_pb.ModelInferResponse.FromString,
        )
        self._live = self._channel.unary_unary(
            "/inference.GRPCInferenceService/ServerLive",
            request_serializer=_pb.ServerLiveRequest.SerializeToString,
            response_deserializer=_pb.ServerLiveResponse.FromString,
        )
        self._ready = self._channel.unary_unary(
            "/inference.GRPCInferenceService/ServerReady",
            request_serializer=_pb.ServerReadyRequest.SerializeToString,
            response_deserializer=_pb.ServerReadyResponse.FromString,
        )
        rng = np.random.default_rng(seed)
        self.input_pool = [
            generate_inputs(self.specs, batch, rng) for _ in range(INPUT_POOL_SIZE)
        ]
        self.samples: List[LatencySample] = []
        self.sent = 0
        self.handled = 0
        self.rejected = 0
        self.errors = 0

    async def wait_ready(self, timeout_s: float = 300.0) -> None:
        # default generous: server warmup compiles one executable per
        # (device, bucket) before flipping ready
        deadline = time.monotonic() + timeout_s
        while time.monotonic() < deadline:
            try:
                live = await self._live(_pb.ServerLiveRequest(), timeout=2.0)
                ready = await self._ready(_pb.ServerReadyRequest(), timeout=2.0)
                if live.live and ready.ready:
                    return
            except grpc.aio.AioRpcError:
                pass
            await asyncio.sleep(0.2)
        raise TimeoutError(f"server at {self.target} not ready in {timeout_s}s")

    def _build_request(self, input_id: int, request_id: str) -> _pb.ModelInferRequest:
        req = _pb.ModelInferRequest(model_name=self.model_name, id=request_id)
        data = self.input_pool[input_id % INPUT_POOL_SIZE]
        for spec in self.specs:
            arr = data[spec.name]
            t = req.inputs.add()
            t.name = spec.name
            t.datatype = spec.dtype
            t.shape.extend(arr.shape)
            req.raw_input_contents.append(arr.tobytes())
        req.client_send_ms = int(wall_ms())
        return req

    async def _one_request(self, input_id: int, rid: int) -> None:
        req = self._build_request(input_id, f"req-{rid}")
        t0 = wall_ms()
        self.sent += 1
        try:
            resp = await self._infer(req)
        except grpc.aio.AioRpcError as exc:
            if exc.code() == grpc.StatusCode.RESOURCE_EXHAUSTED:
                self.rejected += 1
            else:
                self.errors += 1
            return
        t1 = wall_ms()
        phases = {key: getattr(resp, field) for key, field in PHASE_FIELDS}
        self.samples.append(
            LatencySample(
                roundtrip_ms=t1 - t0,
                request_ms=max(0.0, resp.server_receive_ms - req.client_send_ms),
                response_ms=max(0.0, t1 - resp.server_send_ms),
                phases=phases,
            )
        )
        self.handled += 1

    async def run_fixed(self, count: int, delay_us: int) -> float:
        """count requests at a fixed gap; returns elapsed seconds."""
        start = time.monotonic()
        tasks = []
        next_at = start
        for i in range(count):
            now = time.monotonic()
            if now < next_at:
                await asyncio.sleep(next_at - now)
            tasks.append(asyncio.ensure_future(self._one_request(i, i)))
            next_at += delay_us / 1e6
        await asyncio.gather(*tasks)
        return time.monotonic() - start

    async def run_schedule(self, segments: Sequence[ScheduleSegment]) -> float:
        """Replay a recorded arrival schedule
        (reference: client_main.cpp:31-48)."""
        start = time.monotonic()
        tasks = []
        rid = 0
        next_at = start
        for seg in segments:
            for _ in range(seg.repeat):
                now = time.monotonic()
                if now < next_at:
                    await asyncio.sleep(next_at - now)
                input_id = seg.input_id if seg.input_id is not None else rid
                tasks.append(
                    asyncio.ensure_future(self._one_request(input_id, rid))
                )
                rid += 1
                next_at += seg.delta_us / 1e6
        await asyncio.gather(*tasks)
        return time.monotonic() - start

    def summary(self, elapsed_s: float) -> Dict:
        """Summary JSON matching the reference schema
        (write_summary_json, inference_client.cpp:277-360)."""
        latency: Dict[str, Dict[str, float]] = {
            "roundtrip": summarize([s.roundtrip_ms for s in self.samples]),
            "request": summarize([s.request_ms for s in self.samples]),
            "response": summarize([s.response_ms for s in self.samples]),
            "client_overhead": summarize(
                [
                    max(0.0, s.roundtrip_ms - s.phases.get("server_overall", 0.0))
                    for s in self.samples
                ]
            ),
        }
        for key, _field in PHASE_FIELDS:
            latency[key] = summarize([s.phases[key] for s in self.samples])
        return {
            "requests": {
                "sent": self.sent,
                "handled": self.handled,
                "rejected": self.rejected,
                "errors": self.errors,
            },
            "throughput_rps": self.handled / elapsed_s if elapsed_s > 0 else 0.0,
            "elapsed_s": elapsed_s,
            "latency_ms": latency,
        }

    async def close(self) -> None:
        await self._channel.close()


async def _amain(args) -> Dict:
    specs = [parse_input_arg(a) for a in args.input]
    client = InferenceClient(
        args.target, args.model, specs, batch=args.batch, seed=args.seed
    )
    await client.wait_ready(timeout_s=args.ready_timeout_s)
    if args.schedule:
        elapsed = await client.run_schedule(load_schedule(args.schedule))
    else:
        elapsed = await client.run_fixed(args.request_number, args.delay_us)
    await client.close()
    return client.summary(elapsed)


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description="inference load client")
    parser.add_argument("--target", default="127.0.0.1:8001")
    parser.add_argument("--model", required=True)
    parser.add_argument(
        "--input", action="append", required=True,
        help="name:shape:dtype, e.g. input:3x224x224:FP32",
    )
    parser.add_argument("--request-number", type=int, default=100)
    parser.add_argument("--delay-us", type=int, default=1000)
    parser.add_argument("--batch", type=int, default=1)
    parser.add_argument("--schedule", help="CSV delta_us,repeat[,input_id]")
    parser.add_argument("--seed", type=int, default=7)
    parser.add_argument("--ready-timeout-s", type=float, default=300.0)
    parser.add_argument("--summary-json", help="write summary JSON here")
    args = parser.parse_args(argv)

    summary = asyncio.run(_amain(args))
    text = json.dumps(summary, indent=2)
    print(text)
    if args.summary_json:
        with open(args.summary_json, "w") as fh:
            fh.write(text)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
