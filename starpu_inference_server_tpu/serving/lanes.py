"""Execution lanes: per-device worker threads running the jitted model.

Reference counterpart: StarPU's CPU/CUDA workers executing the
InferenceCodelet (src/core/starpu_setup.cpp:594-846) plus the scheduler
that routes tasks to workers. A lane owns:

- a bounded work deque (its share of prepared batches),
- a staging slot pool handle (assembles the padded batch on host),
- an EWMA cost model per batch bucket (feeds the EWMA lane-picking
  policy, the analogue of StarPU's ``heft`` scheduler).

Multiple lanes per device (cfg.devices.lanes_per_device, the analogue of
``STARPU_NWORKER_PER_CUDA``; docs/server_guide.md:244-245) overlap host
staging of batch N+1 with device execution of batch N, because JAX
dispatch is asynchronous and ``block_until_ready`` only fences the lane
that calls it.
"""

from __future__ import annotations

import threading
from collections import deque
from typing import Callable, Dict, Optional

from ..core.engine import ModelEngine
from ..core.job import InferenceJob
from ..core.slot_pool import SlotPool, SlotReleaseGuard
from ..utils.config import RuntimeConfig, SchedulerPolicy
from ..utils.logger import get_logger

# complete(master, outputs_or_none, error_or_none, lane)
LaneCompleteFn = Callable[[InferenceJob, Optional[dict], Optional[BaseException], "ExecutionLane"], None]


class ExecutionLane:
    def __init__(
        self,
        lane_id: int,
        device_index: int,
        engine: ModelEngine,
        slot_pool: SlotPool,
        cfg: RuntimeConfig,
        complete: LaneCompleteFn,
    ):
        self.lane_id = lane_id
        self.device_index = device_index
        self._engine = engine
        self._slot_pool = slot_pool
        self._cfg = cfg
        self._complete = complete
        self._work: deque = deque()
        self._lock = threading.Lock()
        self._cond = threading.Condition(self._lock)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self._exception: Optional[BaseException] = None
        # EWMA codelet cost per bucket, ms (for the EWMA scheduler policy)
        self.ewma_cost_ms: Dict[int, float] = {}
        self._ewma_alpha = 0.2
        self.executed_batches = 0

    # -- scheduling interface ---------------------------------------------

    def submit(self, master: InferenceJob) -> None:
        with self._cond:
            self._work.append(master)
            self._cond.notify()

    def backlog(self) -> int:
        with self._lock:
            return len(self._work)

    def estimated_finish_ms(self, bucket: int) -> float:
        """Backlog-aware completion estimate (the ``heft``-style metric)."""
        cost = self.ewma_cost_ms.get(bucket)
        if cost is None:
            cost = (
                sum(self.ewma_cost_ms.values()) / len(self.ewma_cost_ms)
                if self.ewma_cost_ms
                else 1.0
            )
        return cost * (self.backlog() + 1)

    def name(self) -> str:
        return f"lane{self.lane_id}@{self._engine.device_name(self.device_index)}"

    # -- lifecycle --------------------------------------------------------

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._run_loop, name=self.name(), daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        with self._cond:
            self._cond.notify_all()

    def join(self, timeout: Optional[float] = None) -> None:
        if self._thread is not None:
            self._thread.join(timeout=timeout)
        if self._exception is not None:
            raise self._exception

    # -- the lane loop ----------------------------------------------------

    def _pop(self) -> Optional[InferenceJob]:
        with self._cond:
            while not self._work and not self._stop.is_set():
                self._cond.wait(timeout=0.05)
            if self._work:
                return self._work.popleft()
            return None

    def _run_loop(self) -> None:
        log = get_logger()
        while not self._stop.is_set() or self.backlog() > 0:
            master = self._pop()
            if master is None:
                continue
            try:
                self._execute(master)
            except BaseException as exc:  # noqa: BLE001 - converge to failed completion
                # exceptions become failed-job completions, never thread
                # death (reference: submit_job_or_handle_failure,
                # starpu_task_worker.cpp:485-510)
                log.error("lane %s execution failed: %s", self.name(), exc)
                self._complete(master, None, exc, self)

    def _all_cancelled(self, master: InferenceJob) -> bool:
        return master.cancelled and all(j.cancelled for j in master.sub_jobs)

    def _execute(self, master: InferenceJob) -> None:
        from ..utils.exceptions import CancelledError

        master.timing.stamp("lane_start_at")
        master.executed_on = self.name()
        if self._all_cancelled(master):
            self._complete(master, None, CancelledError("cancelled"), self)
            return

        bucket = self._engine.effective_bucket(
            master.bucket_size or self._cfg.bucket_for(master.batch_size())
        )
        slot = self._slot_pool.acquire()
        if slot is None:
            raise RuntimeError("slot pool closed")
        guard = SlotReleaseGuard(self._slot_pool, slot)
        try:
            master.timing.stamp("codelet_start_at")
            # stage: master first, sub-jobs at their batch offsets, all
            # copies fanned out through the native GIL-free copy pool
            # (reference: validate_batch_and_copy_inputs,
            # slot_manager_component.cpp:392-515)
            from ..native_bindings import parallel_copy

            dsts, srcs = [], []
            offset = 0
            for job in (master, *master.sub_jobs):
                n = job.batch_size()
                for name, arr in job.inputs.items():
                    dsts.append(slot.buffers[name][offset : offset + n])
                    srcs.append(arr)
                offset += n
            parallel_copy(dsts, srcs)
            inputs = self._engine.put_inputs(slot.view(bucket), self.device_index)
            master.timing.stamp("inference_start_at")
            outputs = self._engine.execute(inputs, self.device_index)
            # fence + one D2H per output tensor; the dispatcher slices on host
            outputs = self._engine.conform_outputs(self._engine.fetch(outputs))
            t_end = master.timing.stamp("codelet_end_at")
        finally:
            guard.release()

        cost_ms = (t_end - master.timing.codelet_start_at) * 1000.0
        prev = self.ewma_cost_ms.get(bucket)
        self.ewma_cost_ms[bucket] = (
            cost_ms
            if prev is None
            else prev + self._ewma_alpha * (cost_ms - prev)
        )
        self.executed_batches += 1
        self._complete(master, outputs, None, self)


class LaneScheduler:
    """Routes prepared batches to lanes
    (the policy module replacing StarPU's lws/eager/heft choice)."""

    def __init__(self, lanes, policy: SchedulerPolicy):
        self._lanes = list(lanes)
        self._policy = policy
        self._rr = 0
        self._lock = threading.Lock()

    def pick(self, master: InferenceJob) -> ExecutionLane:
        if master.fixed_lane_id is not None:
            # warmup pinning (reference: execute_on_a_specific_worker,
            # inference_task.cpp:824-842)
            return self._lanes[master.fixed_lane_id % len(self._lanes)]
        if self._policy is SchedulerPolicy.ROUND_ROBIN:
            with self._lock:
                lane = self._lanes[self._rr % len(self._lanes)]
                self._rr += 1
            return lane
        if self._policy is SchedulerPolicy.LEAST_LOADED:
            return min(self._lanes, key=lambda l: l.backlog())
        bucket = master.bucket_size or 1
        return min(self._lanes, key=lambda l: l.estimated_finish_ms(bucket))
