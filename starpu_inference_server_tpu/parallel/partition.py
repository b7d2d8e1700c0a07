"""Partition rules: param-tree paths -> PartitionSpec for tensor
parallelism, plus sharded forward construction.

Megatron-style TP layout for transformer blocks:

- column-parallel (shard the OUTPUT feature dim over the ``model`` axis):
  attention q/k/v projections, FFN fc1 — each device computes its head /
  hidden slice, no communication needed going in;
- row-parallel (shard the INPUT feature dim): attention output
  projection, FFN fc2 — partial sums are combined by one all-reduce per
  block, which GSPMD inserts automatically from the shardings;
- embeddings shard the vocab/feature dim; LayerNorm/bias-only params
  replicate.

Everything else (conv towers, heads) replicates by default — ResNet-class
models are served data-parallel, transformer families tensor-parallel.
"""

from __future__ import annotations

import re
from typing import Any, List, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.quant import is_packed_int4_leaf, is_quantized_leaf
from .mesh import DATA_AXIS, EXPERT_AXIS, MODEL_AXIS


def _is_opaque_leaf(node) -> bool:
    return is_quantized_leaf(node) or is_packed_int4_leaf(node)

# (path regex, PartitionSpec for the weight leaf). First match wins;
# paths look like "layers/3/attn/q/w" or "blocks/0/mlp/fc1/b".
Rules = List[Tuple[str, P]]

_TRANSFORMER_RULES: Rules = [
    # column-parallel: shard output dim
    (r".*/attn/[qkv]/w$", P(None, MODEL_AXIS)),
    (r".*/attn/[qkv]/b$", P(MODEL_AXIS)),
    (r".*/(ffn|mlp)/fc1/w$", P(None, MODEL_AXIS)),
    (r".*/(ffn|mlp)/fc1/b$", P(MODEL_AXIS)),
    # row-parallel: shard input dim (all-reduce after)
    (r".*/attn/o/w$", P(MODEL_AXIS, None)),
    (r".*/(ffn|mlp)/fc2/w$", P(MODEL_AXIS, None)),
    # embeddings: shard the feature dim
    (r".*embeddings/word/w$", P(None, MODEL_AXIS)),
    (r".*embeddings/position/w$", P(None, MODEL_AXIS)),
    (r".*embeddings/token_type/w$", P(None, MODEL_AXIS)),
    # ViT patch-embed conv: shard output channels
    (r".*patch_embed/w$", P(None, None, None, MODEL_AXIS)),
    (r".*pos_embed$", P(None, None, MODEL_AXIS)),
]

_TRANSFORMER_FAMILIES = re.compile(r"^(bert|vit)")
_DECODER_FAMILIES = re.compile(r"^(llama|moe|mixtral)")

# Fused-projection decoder layout (models/decoder.py): qkv and gate_up
# are column-parallel, o and down row-parallel; the vocab-sized embed /
# lm_head shard their large dim. The fused-qkv column split does not
# align with the q|k|v block boundaries — GSPMD keeps it correct (the
# later slices reshard), at some extra ICI traffic; a block-aligned
# custom split is a future optimization.
_DECODER_RULES: Rules = [
    (r".*/attn/qkv/w$", P(None, MODEL_AXIS)),
    # MoE stacked experts [E, in, out]: expert-parallel over the 'expert'
    # mesh axis (each device holds + computes only its local experts; the
    # combine einsum's E-reduction becomes one psum), tensor-parallel
    # inside each expert over 'model' (column-/row-split like the dense
    # gate_up/down). The router replicates (it is tiny and every device
    # needs all routing weights).
    (r".*/mlp/experts/gate_up/w$", P(EXPERT_AXIS, None, MODEL_AXIS)),
    (r".*/mlp/experts/down/w$", P(EXPERT_AXIS, MODEL_AXIS, None)),
    (r".*/mlp/router/w$", P()),
    (r".*/(mlp)/gate_up/w$", P(None, MODEL_AXIS)),
    (r".*/attn/o/w$", P(MODEL_AXIS, None)),
    (r".*/(mlp)/down/w$", P(MODEL_AXIS, None)),
    (r".*embed/w$", P(None, MODEL_AXIS)),
    (r".*lm_head/w$", P(None, MODEL_AXIS)),
]


def partition_rules_for(family: str) -> Rules:
    """Rules for a model family; non-transformer families replicate."""
    if _TRANSFORMER_FAMILIES.match(family):
        return _TRANSFORMER_RULES
    if _DECODER_FAMILIES.match(family):
        return _DECODER_RULES
    return []


def _spec_for_path(path: str, rules: Rules) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            return spec
    return P()  # replicate


def _tree_with_paths(node: Any, prefix: str = ""):
    """Yield (path, leaf) with quantized dicts treated as single leaves."""
    if _is_opaque_leaf(node):
        yield prefix, node
    elif isinstance(node, dict):
        for key, value in node.items():
            yield from _tree_with_paths(value, f"{prefix}/{key}" if prefix else key)
    elif isinstance(node, (list, tuple)):
        for i, value in enumerate(node):
            yield from _tree_with_paths(value, f"{prefix}/{i}" if prefix else str(i))
    elif node is not None:
        yield prefix, node


def _map_with_paths(node: Any, fn, prefix: str = ""):
    if _is_opaque_leaf(node):
        return fn(prefix, node)
    if isinstance(node, dict):
        return {
            key: _map_with_paths(value, fn, f"{prefix}/{key}" if prefix else key)
            for key, value in node.items()
        }
    if isinstance(node, (list, tuple)):
        return type(node)(
            _map_with_paths(value, fn, f"{prefix}/{i}" if prefix else str(i))
            for i, value in enumerate(node)
        )
    if node is None:
        return None
    return fn(prefix, node)


def _quant_specs(spec: P, leaf) -> Tuple[P, P]:
    """A quantized leaf {w_q, scale} shards w_q like the dense weight; the
    scale keeps the weight spec on every axis where it has real extent and
    replicates its size-1 (reduced) axes — e.g. 2D scale [1, C] shards
    only the channel axis, 3D MoE scale [E, 1, C] shards expert + channel."""
    scale = leaf["scale"]
    if not getattr(scale, "ndim", 0):
        return spec, P()
    entries = list(spec) + [None] * max(0, scale.ndim - len(spec))
    scale_spec = P(*[
        entries[i] if scale.shape[i] != 1 else None for i in range(scale.ndim)
    ])
    return spec, scale_spec


def shard_params(params: Any, mesh: Mesh, rules: Rules) -> Any:
    """device_put every leaf with its NamedSharding; XLA/GSPMD then
    partitions the jitted computation to follow the data."""

    def place(path: str, leaf):
        spec = _spec_for_path(path, rules)
        if is_packed_int4_leaf(leaf):
            w_spec, s_spec = _quant_specs(spec, leaf)
            return {
                "w_p4": jax.device_put(leaf["w_p4"], NamedSharding(mesh, w_spec)),
                "scale": jax.device_put(leaf["scale"], NamedSharding(mesh, s_spec)),
                "bits": leaf["bits"],
            }
        if is_quantized_leaf(leaf):
            w_spec, s_spec = _quant_specs(spec, leaf)
            return {
                "w_q": jax.device_put(leaf["w_q"], NamedSharding(mesh, w_spec)),
                "scale": jax.device_put(leaf["scale"], NamedSharding(mesh, s_spec)),
                "bits": leaf["bits"],
            }
        # rank mismatch (e.g. replicate-spec) -> trim/pad the spec
        nd = getattr(leaf, "ndim", 0)
        if len(spec) != nd:
            spec = P(*(list(spec)[:nd] + [None] * max(0, nd - len(spec))))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return _map_with_paths(params, place)


def stacked_layer_spec(path: str, leaf, rules: Rules) -> P:
    """PartitionSpec for one STACKED layer leaf: ``pipe`` on the leading
    [L] axis plus the per-layer tensor-parallel spec from ``rules``
    (trimmed/padded to the leaf's rank). For quantized leaves the spec
    describes the weight array; scales derive via :func:`_quant_specs`."""
    from .mesh import PIPE_AXIS

    spec = _spec_for_path(path, rules)
    if _is_opaque_leaf(leaf):
        nd = leaf["w_p4" if "w_p4" in leaf else "w_q"].ndim
    else:
        nd = getattr(leaf, "ndim", 0)
    entries = [PIPE_AXIS] + list(spec)
    entries = entries[:nd] + [None] * max(0, nd - len(entries))
    return P(*entries)


def shard_stacked_layers(stacked: Any, mesh: Mesh, rules: Rules) -> Any:
    """Place a stacked layer tree (every leaf carries a leading [L]
    axis; see parallel.pipeline.stack_layers): the leading axis shards
    over ``pipe`` (each stage holds L/S contiguous layers in its HBM)
    and the per-layer dims shard by the tensor-parallel ``rules`` —
    matching pipeline_forward's shard_map in_specs exactly, so entering
    the pipelined program never reshards the weights. Fused projections
    must be column-shuffled first (parallel/tp_layout.py) when the
    ``model`` axis is >1, so each contiguous shard is block-aligned."""

    def place(path: str, leaf):
        spec = stacked_layer_spec(path, leaf, rules)
        if is_packed_int4_leaf(leaf) or is_quantized_leaf(leaf):
            wkey = "w_p4" if "w_p4" in leaf else "w_q"
            w_spec, s_spec = _quant_specs(spec, leaf)
            return {
                wkey: jax.device_put(leaf[wkey], NamedSharding(mesh, w_spec)),
                "scale": jax.device_put(
                    leaf["scale"], NamedSharding(mesh, s_spec)
                ),
                "bits": leaf["bits"],
            }
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    # prefix "layers" so paths look like the full-tree paths the rules
    # regexes were written against ("layers/<i>/attn/qkv/w" there,
    # "layers/attn/qkv/w" here — both match ".*/attn/qkv/w$")
    return _map_with_paths(stacked, place, prefix="layers")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Inputs shard their leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def sharded_forward(model, mesh: Mesh, rules: Rules):
    """Build (sharded_params, jitted_fn) for a BuiltModel over ``mesh``.

    The returned fn takes an input dict whose arrays have a leading batch
    dim divisible by the data-axis size; outputs come back sharded over
    the batch axis.
    """
    params = shard_params(model.params, mesh, rules)
    definition = model.definition
    dtype = model.compute_dtype

    @jax.jit
    def forward(p, inputs):
        return definition.apply(p, inputs, dtype)

    in_shard = batch_sharding(mesh)

    def run(inputs):
        placed = {
            name: jax.device_put(arr, in_shard) for name, arr in inputs.items()
        }
        return forward(params, placed)

    return params, run
