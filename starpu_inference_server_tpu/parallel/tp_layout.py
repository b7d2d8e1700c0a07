"""Block-aligned weight layouts for tensor parallelism inside
``shard_map`` programs (manual-collective TP, used by the pipeline).

Why this exists: the decoder family stores FUSED projections — qkv as
one [H, (Hq+2Hkv)*D] matrix and gate+up as one [H, 2*I] — so a decode
step issues one matmul instead of three (models/decoder.py:124-130).
Under GSPMD tensor parallelism that is fine: the compiler reshards the
mis-aligned column slices automatically (parallel/partition.py:59-64).
Under MANUAL sharding (``shard_map``, as used by the pipeline-parallel
stage program) each device sees a raw contiguous column slice, which
would mix q/k/v (resp. gate/up) blocks. The fix is a one-time column
permutation at placement: reorder the fused output columns so device
``d``'s contiguous slice is exactly ``[q_d | k_d | v_d]`` (resp.
``[gate_d | up_d]``) — the classic Megatron checkpoint-resharding trick.

Row-parallel weights (attn.o, mlp.down) need no dense/int8 shuffle —
their input rows are ordered by head / intermediate index, so the
contiguous row shard already matches the local activations. PAIRWISE-
packed INT4 weights (ops.quant.pack_int4: byte row a = original rows
2a, 2a+1) keep that property as long as each row shard is even-sized:
a contiguous packed-row shard is exactly the pack of the corresponding
original row shard. ``repack_int4_rows`` validates the divisibility and
passes the node through.

No reference counterpart (the reference is single-node with no TP;
SURVEY.md section 2.9) — this is TPU-native extension machinery.
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..ops.quant import (
    is_packed_int4_leaf,
    is_quantized_leaf,
)


def block_tp_permutation(group_sizes: Sequence[int], tp: int) -> np.ndarray:
    """Index permutation turning a ``[g0 | g1 | ...]`` concatenated axis
    into ``[g0_0 | g1_0 | ... | g0_1 | g1_1 | ...]`` so that contiguous
    1/tp slices are block-aligned. ``new[j] = old[perm[j]]``."""
    for n in group_sizes:
        if n % tp != 0:
            raise ValueError(
                f"group size {n} not divisible by tensor-parallel size {tp}"
            )
    offsets = np.cumsum([0] + list(group_sizes))
    chunks = []
    for d in range(tp):
        for g, n in enumerate(group_sizes):
            local = n // tp
            start = offsets[g] + d * local
            chunks.append(np.arange(start, start + local))
    return np.concatenate(chunks)


def _take_last_axis(arr, perm):
    return jnp.take(jnp.asarray(arr), jnp.asarray(perm), axis=arr.ndim - 1)


def permute_out_columns(wnode, perm: np.ndarray):
    """Permute a weight node's OUTPUT (last) axis. Handles dense arrays
    and quantized dicts; per-output-channel scales permute alongside, so
    the shuffle commutes with quantization."""
    if is_packed_int4_leaf(wnode):
        return {
            "w_p4": _take_last_axis(wnode["w_p4"], perm),
            "scale": _take_last_axis(wnode["scale"], perm),
            "bits": wnode["bits"],
        }
    if is_quantized_leaf(wnode):
        return {
            "w_q": _take_last_axis(wnode["w_q"], perm),
            "scale": _take_last_axis(wnode["scale"], perm),
            "bits": wnode["bits"],
        }
    return _take_last_axis(wnode, perm)


def repack_int4_rows(wnode, tp: int):
    """Validate that a PAIRWISE-packed INT4 weight row-shards cleanly:
    byte row a of ``w_p4`` holds original rows 2a and 2a+1, so a
    contiguous packed-row shard is already the pack of the original row
    shard whenever each shard has an even number of original rows. With
    that guaranteed, the node passes through unchanged (required before
    row-parallel sharding of ``w_p4`` under shard_map). Dense / int8
    nodes pass through unchanged."""
    if not is_packed_int4_leaf(wnode):
        return wnode
    k = wnode["w_p4"].shape[0] * 2
    if k % tp != 0 or (k // tp) % 2 != 0:
        raise ValueError(
            f"int4 row repack needs K ({k}) divisible by 2*tp ({2 * tp})"
        )
    return wnode


def shuffle_decoder_layer_for_tp(spec, layer, tp: int):
    """Return a copy of one decoder layer's params with fused projections
    column-shuffled (and packed int4 row-parallel weights re-packed) for
    ``tp``-way manual tensor parallelism. ``spec`` is a DecoderSpec."""
    if tp <= 1:
        return layer
    d = spec.head_dim
    qkv_perm = block_tp_permutation(
        [spec.q_heads * d, spec.kv_heads * d, spec.kv_heads * d], tp
    )
    out = {
        "attn_norm": layer["attn_norm"],
        "attn": {
            "qkv": {"w": permute_out_columns(layer["attn"]["qkv"]["w"], qkv_perm)},
            "o": {"w": repack_int4_rows(layer["attn"]["o"]["w"], tp)},
        },
        "mlp_norm": layer["mlp_norm"],
    }
    mlp = layer["mlp"]
    if "router" in mlp:
        # MoE: stacked experts [E, in, out] — the gate|up interleave
        # applies uniformly along the last axis; router replicates.
        gu_perm = block_tp_permutation([spec.intermediate] * 2, tp)
        out["mlp"] = {
            "router": mlp["router"],
            "experts": {
                "gate_up": {
                    "w": permute_out_columns(mlp["experts"]["gate_up"]["w"], gu_perm)
                },
                "down": {"w": repack_int4_rows(mlp["experts"]["down"]["w"], tp)},
            },
        }
    else:
        gu_perm = block_tp_permutation([spec.intermediate] * 2, tp)
        out["mlp"] = {
            "gate_up": {"w": permute_out_columns(mlp["gate_up"]["w"], gu_perm)},
            "down": {"w": repack_int4_rows(mlp["down"]["w"], tp)},
        }
    return out


def validate_decoder_tp(spec, tp: int) -> None:
    """Divisibility contract for manual TP over decoder layers."""
    if tp <= 1:
        return
    if spec.kv_heads % tp or spec.q_heads % tp:
        raise ValueError(
            f"tensor-parallel size {tp} must divide q_heads "
            f"({spec.q_heads}) and kv_heads ({spec.kv_heads})"
        )
    if (spec.q_heads // tp) % (spec.kv_heads // tp):
        raise ValueError(
            f"per-device GQA ratio must stay integral: q_heads/tp="
            f"{spec.q_heads // tp}, kv_heads/tp={spec.kv_heads // tp}"
        )
    if spec.intermediate % tp:
        raise ValueError(
            f"tensor-parallel size {tp} must divide intermediate "
            f"({spec.intermediate})"
        )
