"""Host staging slot pool: pre-allocated, reusable batch buffers.

Reference counterpart: ``SlotPoolBase`` / ``InputSlotPool`` /
``OutputSlotPool`` (src/core/slot_pool_base.hpp:16-167,
input_slot_pool.cpp, output_slot_pool.cpp) — ``pool_size`` slots, each
holding one host buffer per model input sized ``max_batch_size x
per-sample bytes``, with blocking acquire/release and debug
double-release detection.

TPU adaptation: buffers are plain numpy arrays used to assemble the
padded batch before a single ``jax.device_put`` (the reference pins them
with cudaHostAlloc for async H2D; on TPU the transfer is managed by the
runtime and the win comes from (a) zero per-request allocation and
(b) writing sub-jobs directly at their batch offsets so concat never
materializes twice). Output staging needs no pool: jitted results arrive
as device arrays and are sliced per sub-job without a host copy until
serialization.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..utils.config import TensorSpec
from ..utils.dtypes import numpy_dtype
from ..utils.exceptions import PipelineError


class Slot:
    __slots__ = ("index", "buffers", "in_use")

    def __init__(self, index: int, specs: Sequence[TensorSpec], max_batch: int):
        from ..native_bindings import aligned_buffer

        self.index = index
        # page-aligned, pre-faulted buffers via the native allocator
        # (falls back to np.zeros when libsis_runtime.so is not built)
        self.buffers: Dict[str, np.ndarray] = {
            spec.name: aligned_buffer(
                (max_batch, *spec.dims), numpy_dtype(spec.dtype)
            )
            for spec in specs
        }
        self.in_use = False

    def write(self, name: str, offset: int, array: np.ndarray) -> None:
        """Copy one request's samples into the batch buffer at ``offset``."""
        n = array.shape[0]
        self.buffers[name][offset : offset + n] = array

    def view(self, bucket: int) -> Dict[str, np.ndarray]:
        """Padded views of the first ``bucket`` rows of every buffer."""
        return {name: buf[:bucket] for name, buf in self.buffers.items()}


class SlotPool:
    """Blocking pool of ``pool_size`` staging slots
    (reference: SlotPoolBase acquire/try_acquire/release semantics)."""

    def __init__(self, specs: Sequence[TensorSpec], max_batch: int, pool_size: int):
        self._slots: List[Slot] = [Slot(i, specs, max_batch) for i in range(pool_size)]
        self._free: List[int] = list(range(pool_size))
        self._lock = threading.Lock()
        self._available = threading.Condition(self._lock)
        self._closed = False

    @property
    def size(self) -> int:
        return len(self._slots)

    def free_count(self) -> int:
        with self._lock:
            return len(self._free)

    def acquire(self, timeout: Optional[float] = None) -> Optional[Slot]:
        """Block until a slot is free (the second backpressure point after
        the inflight cap; reference: slot_manager_component.cpp:310-323).
        Returns None on timeout or pool shutdown."""
        with self._available:
            while not self._free and not self._closed:
                if not self._available.wait(timeout=timeout):
                    return None
            if self._closed:
                return None
            idx = self._free.pop()
            slot = self._slots[idx]
            slot.in_use = True
            return slot

    def try_acquire(self) -> Optional[Slot]:
        with self._lock:
            if not self._free or self._closed:
                return None
            idx = self._free.pop()
            slot = self._slots[idx]
            slot.in_use = True
            return slot

    def release(self, slot: Slot) -> None:
        with self._available:
            if not slot.in_use:
                # double-release guard (reference: slot_pool_base.hpp:104-156)
                raise PipelineError(f"double release of slot {slot.index}")
            slot.in_use = False
            self._free.append(slot.index)
            self._available.notify()

    def close(self) -> None:
        with self._available:
            self._closed = True
            self._available.notify_all()


class SlotReleaseGuard:
    """Single-release RAII guard (reference: OutputSlotReleaseGuard,
    inference_task.hpp:20-39)."""

    def __init__(self, pool: SlotPool, slot: Slot):
        self._pool = pool
        self._slot = slot
        self._released = False
        self._lock = threading.Lock()

    def release(self) -> None:
        with self._lock:
            if self._released:
                return
            self._released = True
        self._pool.release(self._slot)

    def __enter__(self):
        return self._slot

    def __exit__(self, *exc):
        self.release()
