"""Device-mesh construction over local or pod-slice device sets."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
PIPE_AXIS = "pipe"
EXPERT_AXIS = "expert"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshAxes:
    data: int = 1
    model: int = 1
    expert: int = 1
    pipe: int = 1

    @property
    def size(self) -> int:
        return self.data * self.pipe * self.expert * self.model


def make_device_mesh(
    axes: MeshAxes,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, pipe, expert, model) mesh.

    Axis-order rationale (scaling-book recipe): the model/tensor axis is
    the minor (fastest-varying) axis so TP collectives ride contiguous
    ICI neighbors; the expert axis (MoE psum traffic) sits next; the
    pipe axis needs only one point-to-point ppermute hop per tick so it
    tolerates slower links; the data axis spans hosts where only
    per-batch all-reduces (none at inference) or nothing crosses DCN.
    """
    devs = list(devices) if devices is not None else jax.devices()
    if axes.size > len(devs):
        raise ValueError(
            f"mesh of size {axes.size} (data={axes.data} x pipe={axes.pipe}"
            f" x expert={axes.expert} x model={axes.model}) needs more "
            f"than the {len(devs)} available devices"
        )
    grid = np.asarray(devs[: axes.size]).reshape(
        axes.data, axes.pipe, axes.expert, axes.model
    )
    return Mesh(grid, (DATA_AXIS, PIPE_AXIS, EXPERT_AXIS, MODEL_AXIS))


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``). On a single
    host this is a no-op; on a pod slice every host calls it before any
    jax API, after which ``jax.devices()`` spans the slice."""
    if coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
