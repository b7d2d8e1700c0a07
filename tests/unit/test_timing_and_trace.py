"""TimingInfo breakdown + trace logger + metrics recorder unit tests."""

import json

import numpy as np
import pytest

from starpu_inference_server_tpu.core.job import InferenceJob
from starpu_inference_server_tpu.core.timing import (
    TimingInfo,
    compute_latency_breakdown,
)
from starpu_inference_server_tpu.monitoring.trace import BatchingTraceLogger


class TestTiming:
    def test_breakdown_ordering(self):
        t = TimingInfo()
        base = 1000.0
        for i, field in enumerate([
            "enqueued_at", "dequeued_at", "batch_collect_start",
            "batch_collect_end", "before_submit_at", "lane_start_at",
            "codelet_start_at", "inference_start_at", "codelet_end_at",
            "callback_start_at", "callback_end_at",
        ]):
            setattr(t, field, base + i * 0.010)
        lb = compute_latency_breakdown(t)
        assert lb["queue_ms"] == pytest.approx(10.0, abs=0.01)
        assert lb["batch_ms"] == pytest.approx(10.0, abs=0.01)
        assert lb["scheduling_ms"] == pytest.approx(10.0, abs=0.01)
        assert lb["codelet_ms"] == pytest.approx(20.0, abs=0.01)
        assert lb["inference_ms"] == pytest.approx(10.0, abs=0.01)
        assert lb["total_ms"] == pytest.approx(100.0, abs=0.01)

    def test_missing_stamps_give_zero(self):
        lb = compute_latency_breakdown(TimingInfo())
        assert all(v == 0.0 for v in lb.values())

    def test_copy_from_preserves_own(self):
        a, b = TimingInfo(), TimingInfo()
        a.enqueued_at = 5.0
        b.enqueued_at = 1.0
        b.codelet_end_at = 9.0
        a.copy_from(b)
        assert a.enqueued_at == 1.0  # copy_from overwrites set fields
        assert a.codelet_end_at == 9.0


class TestTraceLogger:
    def make_master(self):
        job = InferenceJob({"x": np.zeros((2, 4), np.float32)}, request_id="r1")
        job.is_batched_master = True
        job.effective_batch = 2
        job.bucket_size = 2
        job.executed_on = "lane0@cpu:0"
        job.submission_id = 1
        t = job.timing
        t.enqueued_at = 1.0
        t.batch_collect_start = 1.001
        t.batch_collect_end = 1.002
        t.codelet_start_at = 1.003
        t.codelet_end_at = 1.010
        job.latency_breakdown = {"queue_ms": 1.0, "codelet_ms": 7.0,
                                 "total_ms": 10.0}
        return job

    def test_artifacts_written(self, tmp_path):
        logger = BatchingTraceLogger(str(tmp_path))
        master = self.make_master()
        logger.log_request_enqueued(master, queue_size=1)
        logger.log_queue_sample(1)
        logger.log_batch_executed(master, congested=False)
        logger.log_rejection("r9")
        logger.log_congestion_span(1.0, 2.0, 1.5)
        logger.flush()

        trace = json.load(open(tmp_path / "batching_trace.json"))
        names = {e["name"] for e in trace["traceEvents"]}
        assert {"request_enqueued", "batch_build", "batch",
                "request_rejected", "congested"} <= names

        rows = open(tmp_path / "trace.csv").read().splitlines()
        assert len(rows) == 2  # header + one batch
        assert "lane0@cpu:0" in rows[1]

        metrics = open(tmp_path / "metrics.csv").read().splitlines()
        assert metrics[0].startswith("t_us")

    def test_warmup_suppression(self, tmp_path):
        logger = BatchingTraceLogger(str(tmp_path))
        master = self.make_master()
        master.is_warmup = True
        logger.set_warmup_suppressed(True)
        logger.log_batch_executed(master, congested=False)
        logger.set_warmup_suppressed(False)
        logger.flush()
        trace = json.load(open(tmp_path / "batching_trace.json"))
        assert not trace["traceEvents"]

    def test_warmup_prefix_when_not_suppressed(self, tmp_path):
        logger = BatchingTraceLogger(str(tmp_path))
        master = self.make_master()
        master.is_warmup = True
        logger.log_batch_executed(master, congested=False)
        logger.flush()
        trace = json.load(open(tmp_path / "batching_trace.json"))
        names = {e["name"] for e in trace["traceEvents"]}
        assert "warming_batch" in names


class TestMetricsRecorder:
    def test_record_and_scrape(self):
        from prometheus_client import generate_latest

        from starpu_inference_server_tpu.monitoring.metrics import MetricsRecorder

        rec = MetricsRecorder(port=None, model_name="m")
        rec.on_queue_size(3, 10)
        job = InferenceJob({"x": np.zeros((1, 4), np.float32)})
        job.is_batched_master = True
        job.effective_batch = 4
        job.bucket_size = 4
        job.logical_jobs = 2
        job.executed_on = "lane0"
        job.latency_breakdown = {"total_ms": 12.0, "queue_ms": 1.0,
                                 "codelet_ms": 8.0, "inference_ms": 6.0}
        rec.record_job(job)
        rec.record_failure("execute", "RuntimeError")
        rec.sample_process_stats()
        text = generate_latest(rec.registry).decode()
        assert "inference_queue_size 3.0" in text
        assert "inference_completed_total 1.0" in text
        assert 'inference_failures_total_total' in text or "inference_failures_total" in text
        assert "inference_batch_size_bucket" in text
        assert "process_resident_memory_bytes" in text


def test_generation_engine_metrics():
    """The engine publishes tokens/TTFT/slot/prefix families when given
    a MetricsRecorder (decoder analogue of the batch pipeline's per-job
    metrics)."""
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.monitoring.metrics import MetricsRecorder
    from starpu_inference_server_tpu.serving.generation import (
        GenerationEngine,
        GenerationRequest,
    )

    spec = get_spec("llama-tiny", {
        "layers": 1, "hidden": 64, "q_heads": 2, "kv_heads": 1,
        "intermediate": 96, "vocab": 64,
    })
    m = MetricsRecorder(port=None, model_name="gen-metrics-test")
    eng = GenerationEngine(
        spec, init_params(spec, np.random.default_rng(0)),
        dtype=jnp.float32, num_slots=2, max_len=64, prefill_buckets=[8],
        prefill_chunk=8, prefix_cache=True, prefix_cache_min=4,
        metrics=m,
    )
    eng.start()
    try:
        prompt = np.arange(1, 7, dtype=np.int32)
        for _ in range(2):
            req = GenerationRequest(prompt_ids=prompt, max_new_tokens=4)
            eng.submit(req)
            req.result(timeout=60.0)
    finally:
        eng.stop()

    def value(metric):
        return metric._value.get()

    assert value(m.generated_tokens_total) == 8
    assert value(m.prefix_cache_hits_total) == 1
    assert value(m.prefix_tokens_reused_total) == len(prompt) - 1
    assert m.generation_ttft._sum.get() > 0
    assert value(m.generation_active_slots) == 0  # all released
