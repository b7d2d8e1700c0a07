"""ModelEngine: bucketed-jit execution of one model over local devices.

Reference counterpart: the StarPU codelet + model loader pair
(src/core/starpu_setup.cpp:594-846 runs TorchScript forward on a worker;
src/core/inference_runner.cpp:243-275 loads the model and clones a
replica per GPU). TPU re-design:

- the "codelet" is a single jitted wrapper around the model's apply fn;
  XLA compiles one executable per (device, batch-bucket) pair — the
  replacement for the reference's arbitrary-batch StarPU vector resize
  (starpu_vector_resize_utils.hpp), which has no XLA equivalent;
- "replica per device" is a per-device ``jax.device_put`` of the param
  tree (cheap on one host; the multi-host sharded path lives in
  parallel/);
- warmup doubles as jit-cache priming: every (lane, bucket) combination
  is executed once before serving (reference warmup pins jobs per
  worker; src/core/warmup.cpp:267-295).
"""

from __future__ import annotations

import threading
from typing import Any, Dict, List, Optional, Sequence

import jax
import numpy as np

from ..models.registry import BuiltModel
from ..utils.config import RuntimeConfig
from ..utils.exceptions import DeviceError
from ..utils.logger import get_logger


class ModelEngine:
    def __init__(
        self,
        cfg: RuntimeConfig,
        model: BuiltModel,
        devices: Optional[Sequence[jax.Device]] = None,
    ):
        self.cfg = cfg
        self.model = model
        all_devices = list(devices) if devices is not None else jax.local_devices()
        if cfg.devices.device_ids:
            try:
                all_devices = [all_devices[i] for i in cfg.devices.device_ids]
            except IndexError:
                raise DeviceError(
                    f"device_ids {cfg.devices.device_ids} out of range for "
                    f"{len(all_devices)} local devices"
                ) from None
        if not all_devices:
            raise DeviceError("no devices available")
        self.devices: List[jax.Device] = all_devices
        self.platform = self.devices[0].platform

        if self.platform == "tpu":
            from ..ops import nn

            nn.set_use_pallas(True)

        # one param replica per device (reference: clone_model_to_gpus)
        self._params_per_device: List[Any] = [
            jax.device_put(model.params, dev) for dev in self.devices
        ]

        definition = model.definition
        compute_dtype = model.compute_dtype

        def _forward(params, inputs):
            return definition.apply(params, inputs, compute_dtype)

        self._jitted = jax.jit(_forward)
        self._compile_lock = threading.Lock()
        self._compiled: set = set()  # (device_index, bucket)

    @property
    def buckets(self) -> Sequence[int]:
        return self.cfg.buckets

    def num_devices(self) -> int:
        return len(self.devices)

    def device_name(self, device_index: int) -> str:
        d = self.devices[device_index]
        return f"{d.platform}:{d.id}"

    # ------------------------------------------------------------------

    def put_inputs(
        self, inputs: Dict[str, np.ndarray], device_index: int
    ) -> Dict[str, jax.Array]:
        """Host->device transfer of a padded batch (the reference's H2D
        staging via pinned slot buffers; slot_manager_component.cpp:392-515)."""
        dev = self.devices[device_index]
        return jax.device_put(inputs, dev)

    def execute(
        self, inputs_on_device: Dict[str, jax.Array], device_index: int
    ) -> Dict[str, jax.Array]:
        """Dispatch the jitted forward; returns device arrays immediately
        (JAX async dispatch — the lane decides when to fence)."""
        params = self._params_per_device[device_index]
        return self._jitted(params, inputs_on_device)

    def run_padded(
        self, inputs: Dict[str, np.ndarray], device_index: int = 0
    ) -> Dict[str, jax.Array]:
        """put + execute in one call (inputs already padded to a bucket)."""
        return self.execute(self.put_inputs(inputs, device_index), device_index)

    @staticmethod
    def wait(outputs: Dict[str, jax.Array]) -> None:
        for arr in outputs.values():
            arr.block_until_ready()

    # ------------------------------------------------------------------

    def prime(self, device_index: int, bucket: int) -> bool:
        """Compile-cache priming for one (device, bucket): run a zero
        batch once. Returns True if a compile actually happened."""
        key = (device_index, bucket)
        with self._compile_lock:
            if key in self._compiled:
                return False
            self._compiled.add(key)
        zeros = {
            spec.name: np.zeros((bucket, *spec.dims), self._np_dtype(spec))
            for spec in self.cfg.inputs
        }
        out = self.run_padded(zeros, device_index)
        self.wait(out)
        return True

    def prime_all(self) -> int:
        """Prime every (device, bucket); returns number of compilations.
        (Warmup's TPU role; reference warmup.cpp:493-613.)"""
        log = get_logger()
        count = 0
        for di in range(len(self.devices)):
            for bucket in self.cfg.buckets:
                if self.prime(di, bucket):
                    count += 1
                    log.debug(
                        "primed %s bucket=%d", self.device_name(di), bucket
                    )
        return count

    @staticmethod
    def _np_dtype(spec) -> np.dtype:
        from ..utils.dtypes import numpy_dtype

        return numpy_dtype(spec.dtype)
