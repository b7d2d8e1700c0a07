"""Integration tests: the full serving pipeline (queue -> collector ->
lanes -> dispatcher) over real jitted models on the virtual-CPU device
set (reference: tests/integration/integration_inference_runner.cpp —
inference through actual codelets with real StarPU CPU workers)."""

import threading

import numpy as np

from starpu_inference_server_tpu.core.engine import ModelEngine
from starpu_inference_server_tpu.core.job import InferenceJob
from starpu_inference_server_tpu.models import build_model
from starpu_inference_server_tpu.serving.queue import InferenceQueue
from starpu_inference_server_tpu.serving.runner import TaskRunner
from starpu_inference_server_tpu.utils.config import parse_config
from starpu_inference_server_tpu.utils.exceptions import CancelledError


def tiny_cfg(**over):
    raw = {
        "name": "tiny",
        "model": {"family": "add_one"},
        "inputs": [{"name": "input", "dims": [8], "dtype": "FP32"}],
        "outputs": [{"name": "output", "dims": [8], "dtype": "FP32"}],
        "pool_size": 2,
        "max_batch_size": 4,
        "batch_coalesce_timeout_ms": 5.0,
        "batching_strategy": "fixed",
        "fixed_batching": {"batch_size": 4},
        "max_queue_size": 64,
        "max_inflight_tasks": 4,
        "warmup_request_nb": 1,
        "congestion": {"enabled": False},
        "metrics_enabled": False,
    }
    raw.update(over)
    return parse_config(raw)


def make_runner(cfg):
    model = build_model(cfg.model, seed=cfg.seed)
    engine = ModelEngine(cfg, model)
    queue = InferenceQueue(cfg.max_queue_size)
    runner = TaskRunner(cfg, engine, queue)
    return runner, queue


class Collector:
    def __init__(self, n):
        self.results = {}
        self.errors = {}
        self.done = threading.Event()
        self._n = n
        self._lock = threading.Lock()

    def __call__(self, job, outputs, error):
        with self._lock:
            if error is not None:
                self.errors[job.request_id] = error
            else:
                self.results[job.request_id] = outputs
            if len(self.results) + len(self.errors) >= self._n:
                self.done.set()


def push_jobs(queue, collector, count, dims=(8,), batch=1):
    jobs = []
    for i in range(count):
        x = np.full((batch, *dims), float(i), np.float32)
        job = InferenceJob({"input": x}, request_id=f"req{i}", completion=collector)
        job.timing.stamp("enqueued_at")
        queue.push(job)
        jobs.append(job)
    return jobs


def test_end_to_end_single_jobs():
    cfg = tiny_cfg(batching_strategy="disabled")
    runner, queue = make_runner(cfg)
    runner.start()
    try:
        c = Collector(5)
        push_jobs(queue, c, 5)
        assert c.done.wait(timeout=30)
        assert not c.errors
        for i in range(5):
            np.testing.assert_allclose(
                c.results[f"req{i}"]["output"], np.full((1, 8), i + 1.0)
            )
    finally:
        runner.stop()


def test_end_to_end_batched_results_sliced_correctly():
    cfg = tiny_cfg()
    runner, queue = make_runner(cfg)
    runner.start()
    try:
        c = Collector(8)
        push_jobs(queue, c, 8)
        assert c.done.wait(timeout=30)
        assert not c.errors
        for i in range(8):
            np.testing.assert_allclose(
                c.results[f"req{i}"]["output"], np.full((1, 8), i + 1.0)
            )
        # with a 4-sample fixed batch and 8 queued jobs, at least one
        # executed batch must have been a real aggregate
        assert any(l.executed_batches for l in runner.lanes)
    finally:
        runner.stop()


def test_latency_breakdown_populated():
    cfg = tiny_cfg(batching_strategy="disabled")
    runner, queue = make_runner(cfg)
    runner.start()
    try:
        c = Collector(1)
        jobs = push_jobs(queue, c, 1)
        assert c.done.wait(timeout=30)
        lb = jobs[0].latency_breakdown
        assert lb["total_ms"] > 0
        assert lb["codelet_ms"] > 0
        assert jobs[0].executed_on is not None
    finally:
        runner.stop()


def test_multi_sample_requests_merge():
    cfg = tiny_cfg()
    runner, queue = make_runner(cfg)
    runner.start()
    try:
        c = Collector(2)
        push_jobs(queue, c, 2, batch=2)
        assert c.done.wait(timeout=30)
        for rid, out in c.results.items():
            assert out["output"].shape == (2, 8)
    finally:
        runner.stop()


def test_cancelled_before_execution():
    cfg = tiny_cfg(batching_strategy="disabled")
    runner, queue = make_runner(cfg)
    c = Collector(1)
    job = InferenceJob(
        {"input": np.zeros((1, 8), np.float32)}, request_id="c0", completion=c
    )
    job.timing.stamp("enqueued_at")
    job.cancel()
    queue.push(job)
    runner.start()
    try:
        assert c.done.wait(timeout=30)
        assert isinstance(c.errors["c0"], CancelledError)
    finally:
        runner.stop()


def test_warmup_primes_and_drains():
    cfg = tiny_cfg()
    runner, queue = make_runner(cfg)
    try:
        n = runner.warmup()
        assert n == len(runner.lanes) * len(cfg.buckets) * cfg.warmup_request_nb
        assert runner.dispatcher.completed_jobs >= n
        # warmup jobs must not leak inflight slots
        assert runner.inflight.count() == 0
    finally:
        runner.stop(drain=False)


def test_graceful_shutdown_drains_outstanding():
    cfg = tiny_cfg()
    runner, queue = make_runner(cfg)
    runner.start()
    c = Collector(20)
    push_jobs(queue, c, 20)
    runner.stop()  # must drain all 20 before stopping
    assert len(c.results) == 20


def test_matmul_model_through_pipeline():
    cfg = tiny_cfg(
        model={"family": "matmul", "options": {"dim": 64}},
        inputs=[{"name": "input", "dims": [64], "dtype": "FP32"}],
        outputs=[{"name": "output", "dims": [64], "dtype": "FP32"}],
    )
    runner, queue = make_runner(cfg)
    runner.start()
    try:
        c = Collector(3)
        push_jobs(queue, c, 3, dims=(64,))
        assert c.done.wait(timeout=30)
        assert not c.errors
        for out in c.results.values():
            assert out["output"].shape == (1, 64)
            assert np.all(np.isfinite(out["output"]))
    finally:
        runner.stop()
