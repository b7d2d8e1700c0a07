"""Robustness / edge-case suites per domain (reference pattern:
tests/unit/<domain>/robustness/edgecases_*.cpp — every domain has an
explicit error-path suite)."""

import threading
import time

import numpy as np
import pytest

from starpu_inference_server_tpu.core.engine import ModelEngine
from starpu_inference_server_tpu.core.job import InferenceJob
from starpu_inference_server_tpu.core.slot_pool import SlotPool, SlotReleaseGuard
from starpu_inference_server_tpu.models import build_model
from starpu_inference_server_tpu.serving.collector import InflightTracker, can_merge
from starpu_inference_server_tpu.serving.dispatcher import ResultDispatcher
from starpu_inference_server_tpu.serving.queue import InferenceQueue
from starpu_inference_server_tpu.utils.config import (
    ModelSettings,
    TensorSpec,
    parse_config,
)
from starpu_inference_server_tpu.utils.exceptions import (
    DeviceError,
    PipelineError,
    QueueClosedError,
)


def job(arr=None, **kw):
    if arr is None:
        arr = np.zeros((1, 4), np.float32)
    return InferenceJob({"x": arr}, **kw)


class TestJobTerminal:
    def test_terminal_cas_single_winner(self):
        j = job()
        results = []

        def race():
            results.append(j.try_mark_terminal_handled())

        threads = [threading.Thread(target=race) for _ in range(8)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        assert sum(results) == 1

    def test_completion_runs_once(self):
        calls = []
        j = job(completion=lambda *a: calls.append(a))
        assert j.try_mark_terminal_handled()
        j.run_completion({"x": np.ones(1)}, None)
        j.run_completion({"x": np.ones(1)}, None)  # second is a no-op
        assert len(calls) == 1


class TestComposition:
    def test_dtype_mismatch_blocks_merge(self):
        a = job(np.zeros((1, 4), np.float32))
        b = job(np.zeros((1, 4), np.float64))
        assert not can_merge(a, b)

    def test_shape_mismatch_blocks_merge(self):
        a = job(np.zeros((1, 4), np.float32))
        b = job(np.zeros((1, 8), np.float32))
        assert not can_merge(a, b)

    def test_name_mismatch_blocks_merge(self):
        a = InferenceJob({"x": np.zeros((1, 4), np.float32)})
        b = InferenceJob({"y": np.zeros((1, 4), np.float32)})
        assert not can_merge(a, b)

    def test_pinned_jobs_never_merge(self):
        a = job(fixed_lane_id=0)
        b = job()
        assert not can_merge(a, b)
        assert not can_merge(b, a)

    def test_batch_dims_may_differ(self):
        a = job(np.zeros((2, 4), np.float32))
        b = job(np.zeros((3, 4), np.float32))
        assert can_merge(a, b)


class TestSlotPool:
    def specs(self):
        return [TensorSpec("x", (4,), "FP32")]

    def test_double_release_raises(self):
        pool = SlotPool(self.specs(), max_batch=2, pool_size=1)
        slot = pool.acquire()
        pool.release(slot)
        with pytest.raises(PipelineError):
            pool.release(slot)

    def test_release_guard_idempotent(self):
        pool = SlotPool(self.specs(), max_batch=2, pool_size=1)
        guard = SlotReleaseGuard(pool, pool.acquire())
        guard.release()
        guard.release()  # no raise
        assert pool.free_count() == 1

    def test_acquire_timeout(self):
        pool = SlotPool(self.specs(), max_batch=2, pool_size=1)
        slot = pool.acquire()
        assert pool.acquire(timeout=0.05) is None
        pool.release(slot)

    def test_close_wakes_blocked_acquire(self):
        pool = SlotPool(self.specs(), max_batch=2, pool_size=1)
        pool.acquire()
        result = []

        def blocked():
            result.append(pool.acquire(timeout=5.0))

        t = threading.Thread(target=blocked)
        t.start()
        time.sleep(0.05)
        pool.close()
        t.join(timeout=2.0)
        assert result == [None]

    def test_try_acquire_exhaustion(self):
        pool = SlotPool(self.specs(), max_batch=2, pool_size=2)
        assert pool.try_acquire() is not None
        assert pool.try_acquire() is not None
        assert pool.try_acquire() is None


class TestInflight:
    def test_underflow_raises(self):
        tracker = InflightTracker(2)
        with pytest.raises(RuntimeError):
            tracker.decrement()

    def test_wait_below_cap_releases(self):
        tracker = InflightTracker(1)
        tracker.increment()
        passed = threading.Event()

        def waiter():
            tracker.wait_below_cap(lambda: False)
            passed.set()

        t = threading.Thread(target=waiter)
        t.start()
        time.sleep(0.05)
        assert not passed.is_set()
        tracker.decrement()
        t.join(timeout=2.0)
        assert passed.is_set()


class TestDispatcherFailures:
    def test_error_fans_out_to_all_sub_jobs(self):
        errors = {}

        def completion(j, outputs, error):
            errors[j.request_id] = error

        master = job()
        master.request_id = "m"
        master.set_completion(completion)
        subs = []
        for i in range(3):
            s = job()
            s.request_id = f"s{i}"
            s.set_completion(completion)
            subs.append(s)
        master.sub_jobs = subs
        master.logical_jobs = 4
        master.is_batched_master = True

        tracker = InflightTracker(4)
        tracker.increment()
        dispatcher = ResultDispatcher(tracker)
        boom = RuntimeError("boom")
        dispatcher.complete(master, None, boom)
        assert set(errors) == {"m", "s0", "s1", "s2"}
        assert all(e is boom for e in errors.values())
        assert dispatcher.completed_jobs == 4
        assert dispatcher.failed_jobs == 4
        assert tracker.count() == 0

    def test_callback_exception_contained(self):
        def bad_completion(j, outputs, error):
            raise ValueError("client callback blew up")

        master = job(completion=bad_completion)
        tracker = InflightTracker(1)
        tracker.increment()
        dispatcher = ResultDispatcher(tracker)
        # must not raise
        dispatcher.complete(master, {"x": np.zeros((1, 4))}, None)
        assert dispatcher.completed_jobs == 1

    def test_fail_unsubmitted_exactly_once(self):
        calls = []
        j = job(completion=lambda *a: calls.append(a))
        tracker = InflightTracker(1)
        dispatcher = ResultDispatcher(tracker)
        dispatcher.fail_unsubmitted_job(j, RuntimeError("x"))
        dispatcher.fail_unsubmitted_job(j, RuntimeError("y"))
        assert len(calls) == 1


class TestQueueEdgecases:
    def test_observer_exception_contained(self):
        def bad_observer(size, cap):
            raise RuntimeError("metrics down")

        q = InferenceQueue(4, on_size_change=bad_observer)
        q.push(job())  # must not raise
        assert q.size() == 1

    def test_push_after_shutdown(self):
        q = InferenceQueue(4)
        q.shutdown()
        with pytest.raises(QueueClosedError):
            q.push(job())


class TestEngineEdgecases:
    def test_bad_device_ids(self):
        cfg = parse_config({
            "name": "t", "model": "identity",
            "inputs": [{"name": "input", "dims": [4], "dtype": "FP32"}],
            "outputs": [{"name": "output", "dims": [4], "dtype": "FP32"}],
            "pool_size": 1, "batch_coalesce_timeout_ms": 0,
            "batching_strategy": "disabled", "max_inflight_tasks": 1,
            "devices": {"device_ids": [99]},
        })
        model = build_model(ModelSettings(family="identity"), seed=0)
        with pytest.raises(DeviceError):
            ModelEngine(cfg, model)
