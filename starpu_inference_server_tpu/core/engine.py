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

import math
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

        from ..utils.config import QuantMode as _QM

        # W8A8: dense layers quantize activations per-token and run the
        # s8 x s8 -> s32 MXU path (ops/nn.py); works single-device and
        # under GSPMD mesh sharding alike
        from ..ops import nn as _nn

        _nn.set_w8a8(model.quant in (_QM.W8A8, _QM.W4A8))

        # Placement: mesh of size 1 -> one param replica per device
        # (reference: clone_model_to_gpus); mesh > 1 -> ONE logical
        # executor over the whole mesh with tensor-parallel params and
        # data-parallel batches (GSPMD inserts the collectives).
        self.mesh = None
        self._input_sharding = None
        mesh_cfg = cfg.devices.mesh
        if mesh_cfg.size > 1:
            from ..parallel.mesh import MeshAxes, make_device_mesh
            from ..parallel.partition import batch_sharding

            self.mesh = make_device_mesh(
                MeshAxes(data=mesh_cfg.data, model=mesh_cfg.model,
                         expert=mesh_cfg.expert, pipe=mesh_cfg.pipe),
                devices=self.devices,
            )
            self._input_sharding = batch_sharding(self.mesh)
            self._pipelined = (
                mesh_cfg.pipe > 1
                and model.definition.pipeline_apply is not None
            )
            if mesh_cfg.pipe > 1 and not self._pipelined:
                raise DeviceError(
                    f"devices.mesh.pipe={mesh_cfg.pipe} but model "
                    f"family {model.definition.family!r} has no "
                    f"pipeline_apply"
                )
            self._microbatches = mesh_cfg.microbatches
        else:
            self._pipelined = False
        self._params_per_device: List[Any] = self._place(model)
        self._reload_lock = threading.Lock()

        definition = model.definition
        compute_dtype = model.compute_dtype

        if self._pipelined:
            pipeline_apply = definition.pipeline_apply
            mesh, micro = self.mesh, self._microbatches

            def _forward(params, inputs):
                return pipeline_apply(params, inputs, mesh, micro,
                                      compute_dtype)
        else:
            def _forward(params, inputs):
                return definition.apply(params, inputs, compute_dtype)

        self._jitted = jax.jit(_forward)
        self._compile_lock = threading.Lock()
        self._compiled: set = set()  # (device_index, bucket)

    def _place(self, model: BuiltModel) -> List[Any]:
        """Pack + place ``model.params`` onto the devices / mesh and RETURN
        the placed list (the caller publishes it — reload() validates the
        spec first so in-flight execute() calls never see a mismatched
        tree). Runs at construction and on hot reload
        (RepositoryModelLoad)."""
        cfg = self.cfg
        mesh_cfg = cfg.devices.mesh
        if self.platform == "tpu" and mesh_cfg.size <= 1:
            # Pallas fused kernels are single-device programs; in mesh
            # mode GSPMD partitions the XLA dequant+dot path instead
            from ..ops import nn
            from ..ops.quant import pack_int4_tree
            from ..utils.config import QuantMode

            nn.set_use_pallas(True)
            if model.quant in (QuantMode.INT4, QuantMode.W4A8):
                # pairwise-pack int4 leaves for the Pallas kernel: HBM
                # weight footprint drops 2x vs the int8 carrier
                model.params = pack_int4_tree(model.params)

        if self.mesh is not None:
            from ..parallel.partition import partition_rules_for, shard_params

            rules = partition_rules_for(model.definition.family)
            if self._pipelined:
                # pipeline parallelism: the layer stack shards over the
                # 'pipe' axis as ONE stacked pytree; the forward is the
                # GPipe shard_map program (parallel/pipeline.py) instead
                # of plain GSPMD propagation
                from ..parallel.pipeline import prepare_pipelined_params

                shuffle = None
                if mesh_cfg.model > 1:
                    hook = model.definition.tp_layer_shuffle
                    if hook is None:
                        raise DeviceError(
                            f"devices.mesh.model={mesh_cfg.model} with "
                            f"pipe={mesh_cfg.pipe}: family "
                            f"{model.definition.family!r} has no "
                            "tp_layer_shuffle (manual TP inside pipeline "
                            "stages needs block-aligned fused layouts)"
                        )
                    shuffle = lambda layer: hook(layer, mesh_cfg.model)
                placed = [
                    prepare_pipelined_params(
                        model.params, self.mesh, rules, layer_shuffle=shuffle
                    )
                ]
            else:
                placed = [shard_params(model.params, self.mesh, rules)]
        else:
            placed = [jax.device_put(model.params, dev) for dev in self.devices]
        return placed

    def reload(self, model: BuiltModel) -> None:
        """Hot weight reload (RepositoryModelLoad): re-place a freshly
        loaded param tree without touching the jit cache — params are jit
        ARGUMENTS, so executables compiled for the old weights serve the
        new ones as long as shapes/dtypes match (enforced here).

        The reference has no counterpart (Repository RPCs are
        UNIMPLEMENTED, inference_service_metadata.cpp:312-328; models are
        immutable TorchScript loaded once, inference_runner.cpp:243-249).
        """
        import jax.tree_util as jtu

        with self._reload_lock:  # serialize concurrent RepositoryModelLoad
            old_model = self.model
            if model.quant is not old_model.quant:
                raise DeviceError(
                    f"reload quantization {model.quant} != serving "
                    f"{old_model.quant}"
                )
            old_spec = jtu.tree_map(
                lambda a: (a.shape, str(a.dtype)), self._params_per_device[0]
            )
            # build + validate the new placed tree LOCALLY before
            # publishing: in-flight execute() calls must never observe a
            # mismatched tree (a shape/dtype drift would silently force
            # ~30-60s recompiles — or shape errors — on live traffic)
            placed = self._place(model)  # packs int4 leaves when applicable
            new_spec = jtu.tree_map(
                lambda a: (a.shape, str(a.dtype)), placed[0]
            )
            if old_spec != new_spec:
                raise DeviceError(
                    "reloaded param tree structure/shapes/dtypes differ "
                    "from the serving tree"
                )
            # atomic publish: in-flight executions keep the old tree alive
            self._params_per_device = placed
            self.model = model

    @property
    def pipelined(self) -> bool:
        """True when devices.mesh.pipe > 1 routed placement through
        prepare_pipelined_params (stacked layer tree)."""
        return self._pipelined

    def placed_params(self):
        """The placed param tree (mesh mode: the single sharded copy).
        The generation path reuses this instead of re-placing."""
        return self._params_per_device[0]

    @property
    def buckets(self) -> Sequence[int]:
        return [self.effective_bucket(b) for b in self.cfg.buckets]

    def staging_specs(self):
        """Input specs with the dtype the staging buffers should hold.

        Float inputs are staged at the compute dtype (bf16): the model
        casts immediately anyway, and converting on host halves
        host->device bytes — the transfer is the serving hot path's
        bandwidth bound (the reference's analogue is its pinned-buffer
        H2D staging; here we also shrink the payload).
        """
        import dataclasses as _dc

        import jax.numpy as jnp

        specs = []
        for spec in self.cfg.inputs:
            if self.model.compute_dtype == jnp.bfloat16 and spec.dtype in (
                "FP32",
                "FP64",
            ):
                specs.append(_dc.replace(spec, dtype="BF16"))
            else:
                specs.append(spec)
        return specs

    def min_batch_granularity(self) -> int:
        """Batches must divide evenly over the data axis in mesh mode;
        the pipelined forward additionally splits the batch into
        microbatches."""
        if self.mesh is None:
            return 1
        g = dict(self.mesh.shape).get("data", 1)
        if self._pipelined:
            g = g * self._microbatches // math.gcd(g, self._microbatches)
        return g

    def effective_bucket(self, bucket: int) -> int:
        g = self.min_batch_granularity()
        return ((bucket + g - 1) // g) * g

    def num_devices(self) -> int:
        """Logical executor count: per-chip replicas, or 1 for a mesh."""
        return 1 if self.mesh is not None else len(self.devices)

    def device_name(self, device_index: int) -> str:
        if self.mesh is not None:
            shape = dict(self.mesh.shape)
            return f"mesh(data={shape.get('data')},model={shape.get('model')})"
        d = self.devices[device_index]
        return f"{d.platform}:{d.id}"

    # ------------------------------------------------------------------

    def put_inputs(
        self, inputs: Dict[str, np.ndarray], device_index: int
    ) -> Dict[str, jax.Array]:
        """Host->device transfer of a padded batch (the reference's H2D
        staging via pinned slot buffers; slot_manager_component.cpp:392-515).
        In mesh mode the batch shards over the data axis."""
        if self._input_sharding is not None:
            return {
                name: jax.device_put(arr, self._input_sharding)
                for name, arr in inputs.items()
            }
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
    def fetch(outputs: Dict[str, jax.Array]) -> Dict[str, np.ndarray]:
        """Fence device execution and bring the batch outputs to host —
        ONE device-to-host transfer per output tensor (the reference's
        codelet likewise copies outputs into host buffers before the
        callback slices per request). ``block_until_ready`` alone is not
        a reliable fence on proxied PJRT backends; the fetch is.
        """
        for arr in outputs.values():
            # enqueue every tensor's D2H copy behind the program before
            # fencing: over the tunnel the transfers then ride one round
            # trip instead of one RTT per asarray (see
            # serving/generation.py _prefetch for the measurement)
            try:
                arr.copy_to_host_async()
            except AttributeError:
                pass
        for arr in outputs.values():
            arr.block_until_ready()
        return {name: np.asarray(arr) for name, arr in outputs.items()}

    @staticmethod
    def wait(outputs: Dict[str, jax.Array]) -> None:
        ModelEngine.fetch(outputs)

    def conform_outputs(
        self, outputs: Dict[str, np.ndarray]
    ) -> Dict[str, np.ndarray]:
        """Cast host outputs to their declared wire dtype (the bf16
        staging path may otherwise leak compute dtype into outputs of
        models that pass inputs through)."""
        from ..utils.dtypes import numpy_dtype

        conformed = {}
        for name, arr in outputs.items():
            spec = next((s for s in self.cfg.outputs if s.name == name), None)
            want = numpy_dtype(spec.dtype) if spec is not None else None
            if want is not None and arr.dtype != want:
                arr = arr.astype(want)
            conformed[name] = arr
        return conformed

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
        for di in range(self.num_devices()):
            for bucket in self.buckets:
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
