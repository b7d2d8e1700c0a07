"""InferenceQueue unit tests (reference:
tests/unit/starpu/unit_inference_queue*.cpp behavioral surface)."""

import threading
import time

import numpy as np
import pytest

from starpu_inference_server_tpu.core.job import InferenceJob
from starpu_inference_server_tpu.serving.queue import InferenceQueue
from starpu_inference_server_tpu.utils.clock import now_s
from starpu_inference_server_tpu.utils.exceptions import (
    QueueClosedError,
    QueueFullError,
)


def make_job(i=0):
    return InferenceJob({"x": np.zeros((1, 4), np.float32)}, request_id=f"r{i}")


def test_push_pop_fifo():
    q = InferenceQueue(max_size=4)
    jobs = [make_job(i) for i in range(3)]
    for j in jobs:
        q.push(j)
    assert q.size() == 3
    assert [q.wait_and_pop().request_id for _ in range(3)] == ["r0", "r1", "r2"]


def test_push_full_fails_fast():
    q = InferenceQueue(max_size=1)
    q.push(make_job())
    t0 = now_s()
    with pytest.raises(QueueFullError):
        q.push(make_job(1))
    assert now_s() - t0 < 0.1  # fail fast, no blocking


def test_closed_for_push_rejects_but_pops_drain():
    q = InferenceQueue(max_size=4)
    q.push(make_job(0))
    q.close_for_push()
    with pytest.raises(QueueClosedError):
        q.push(make_job(1))
    assert q.wait_and_pop().request_id == "r0"


def test_shutdown_wakes_blocked_consumer():
    q = InferenceQueue(max_size=4)
    result = []

    def consumer():
        result.append(q.wait_and_pop(timeout=5.0))

    t = threading.Thread(target=consumer)
    t.start()
    time.sleep(0.05)
    q.shutdown()
    t.join(timeout=2.0)
    assert not t.is_alive()
    assert result == [None]


def test_wait_for_and_pop_deadline():
    q = InferenceQueue(max_size=4)
    deadline = now_s() + 0.05
    t0 = now_s()
    assert q.wait_for_and_pop(deadline) is None
    elapsed = now_s() - t0
    assert 0.03 < elapsed < 0.5


def test_wait_for_and_pop_returns_job_within_deadline():
    q = InferenceQueue(max_size=4)

    def producer():
        time.sleep(0.02)
        q.push(make_job(9))

    t = threading.Thread(target=producer)
    t.start()
    job = q.wait_for_and_pop(now_s() + 1.0)
    t.join()
    assert job is not None and job.request_id == "r9"


def test_size_change_callback():
    sizes = []
    q = InferenceQueue(max_size=4, on_size_change=lambda s, c: sizes.append((s, c)))
    q.push(make_job())
    q.wait_and_pop()
    assert sizes == [(1, 4), (0, 4)]


def test_total_pushed_counts():
    q = InferenceQueue(max_size=2)
    q.push(make_job(0))
    q.push(make_job(1))
    with pytest.raises(QueueFullError):
        q.push(make_job(2))
    assert q.total_pushed == 2
