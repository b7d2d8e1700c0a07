"""Multi-chip / multi-host distribution: device meshes, partition specs,
sharded execution.

No reference counterpart — the reference is explicitly single-node
(StarPU built --disable-mpi, no NCCL/Gloo/UCX; SURVEY.md section 2.9/5.8).
This layer is the TPU-pod extension mandated by BASELINE.json: weights
and KV-cache tensor-sharded over a ``jax.sharding.Mesh`` (ICI within a
slice, DCN across slices), with XLA/GSPMD inserting and overlapping the
collectives.
"""

from .mesh import MeshAxes, make_device_mesh
from .partition import partition_rules_for, shard_params, sharded_forward
from .pipeline import pipeline_forward, pipelined_decoder_logits, stack_layers

__all__ = [
    "MeshAxes",
    "make_device_mesh",
    "partition_rules_for",
    "pipeline_forward",
    "pipelined_decoder_logits",
    "shard_params",
    "sharded_forward",
    "stack_layers",
]
