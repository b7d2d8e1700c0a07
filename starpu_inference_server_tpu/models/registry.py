"""Model registry: family name -> ModelDefinition.

The TPU-native replacement for the reference's model loader
(``torch::jit::load`` + GPU replica cloning; reference:
src/core/inference_runner.cpp:243-275). Instead of deserializing a
frozen graph, a family builder constructs (init_params, apply) pure
functions; quantization is applied to the param tree and the engine jits
``apply`` once per batch bucket.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Mapping, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.quant import maybe_quantize_tree
from ..utils.config import ModelSettings, QuantMode, TensorSpec
from ..utils.dtypes import jnp_dtype
from ..utils.exceptions import ModelLoadError, UnknownModelFamilyError

# apply(params, inputs: {name: array}, dtype) -> {name: array}
ApplyFn = Callable[[Any, Dict[str, jnp.ndarray], Any], Dict[str, jnp.ndarray]]
InitFn = Callable[[np.random.Generator], Any]


@dataclasses.dataclass(frozen=True)
class ModelDefinition:
    family: str
    init_params: InitFn
    apply: ApplyFn
    input_specs: Tuple[TensorSpec, ...]
    output_specs: Tuple[TensorSpec, ...]
    # name -> PartitionSpec-style tuple tree builder for tensor parallelism;
    # consumed by parallel/partition.py. None = replicate everything.
    partition_rules: Optional[Callable[[], Any]] = None
    # decoder families support KV-cache generation (serving/generation.py)
    supports_generation: bool = False
    # pipeline-parallel forward: (params, inputs, mesh, num_microbatches,
    # dtype) -> outputs. Set by families whose layer stack can pipeline
    # over the mesh 'pipe' axis; the engine uses it when devices.mesh.pipe
    # > 1 (params come pre-stacked via pipeline.prepare_pipelined_params).
    pipeline_apply: Optional[Callable] = None
    # (layer_params, tp) -> layer_params: block-alignment permutation of
    # fused projections for MANUAL tensor parallelism (shard_map bodies
    # see raw contiguous shards; parallel/tp_layout.py). Applied once at
    # placement when devices.mesh.model > 1 composes with pipe > 1.
    tp_layer_shuffle: Optional[Callable] = None


_REGISTRY: Dict[str, Callable[[Mapping[str, Any]], ModelDefinition]] = {}


def register_family(name: str):
    def wrap(builder):
        _REGISTRY[name] = builder
        return builder

    return wrap


def available_families() -> Tuple[str, ...]:
    _ensure_loaded()
    return tuple(sorted(_REGISTRY))


def get_family(name: str, options: Optional[Mapping[str, Any]] = None) -> ModelDefinition:
    _ensure_loaded()
    try:
        builder = _REGISTRY[name]
    except KeyError:
        raise UnknownModelFamilyError(
            f"unknown model family {name!r}; available: {', '.join(sorted(_REGISTRY))}"
        ) from None
    return builder(options or {})


def _ensure_loaded() -> None:
    # Import model modules lazily so registry import stays cheap.
    from . import bert, decoder, identity, resnet, vit  # noqa: F401


@dataclasses.dataclass
class BuiltModel:
    """A servable model: definition + concrete params + compute dtype."""

    definition: ModelDefinition
    params: Any
    compute_dtype: Any
    quant: QuantMode

    def apply(self, inputs: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        return self.definition.apply(self.params, inputs, self.compute_dtype)


def build_model(settings: ModelSettings, seed: int = 0) -> BuiltModel:
    """Instantiate a model family per config: init or load params, apply
    weight-only quantization, fix the compute dtype."""
    definition = get_family(settings.family, settings.options)
    if settings.params == "random":
        rng = np.random.default_rng(seed)
        params = definition.init_params(rng)
    else:
        params = load_params(settings.params)
    bits = {QuantMode.NONE: None, QuantMode.INT8: 8, QuantMode.INT4: 4,
            QuantMode.W8A8: 8, QuantMode.W4A8: 4}[
        settings.quantization
    ]
    params = maybe_quantize_tree(params, bits)
    return BuiltModel(
        definition=definition,
        params=params,
        compute_dtype=jnp_dtype(settings.compute_dtype),
        quant=settings.quantization,
    )


def load_params(path: str) -> Any:
    """Load a param pytree.

    - directory -> Orbax checkpoint (sharded-weight reads; the TPU
      equivalent of the reference's model-artifact load at startup,
      SURVEY.md section 5.4);
    - ``.npz`` file -> flat-key archive ('a/b/c' -> nested dicts; lists
      encoded as numeric keys).
    """
    import os

    if os.path.isdir(path):
        try:
            import orbax.checkpoint as ocp

            with ocp.StandardCheckpointer() as ckptr:
                return ckptr.restore(os.path.abspath(path))
        except Exception as exc:
            raise ModelLoadError(
                f"failed to restore orbax checkpoint {path}: {exc}"
            ) from exc
    try:
        flat = np.load(path, allow_pickle=False)
    except Exception as exc:
        raise ModelLoadError(f"failed to load params from {path}: {exc}") from exc
    tree: Dict[str, Any] = {}
    for key in flat.files:
        node = tree
        parts = key.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = flat[key]
    return _listify(tree)


def _listify(node):
    """Convert {'0':..., '1':...} dicts back to lists."""
    if isinstance(node, dict):
        conv = {k: _listify(v) for k, v in node.items()}
        if conv and all(k.isdigit() for k in conv):
            return [conv[str(i)] for i in range(len(conv))]
        return conv
    return node


def save_params(path: str, params: Any) -> None:
    flat: Dict[str, np.ndarray] = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}/{k}" if prefix else str(k))
        elif isinstance(node, (list, tuple)):
            for i, v in enumerate(node):
                rec(v, f"{prefix}/{i}" if prefix else str(i))
        elif node is not None:
            flat[prefix] = np.asarray(node)

    rec(params, "")
    np.savez(path, **flat)
