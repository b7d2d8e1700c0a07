"""Shared TP/EP-aware decoder building blocks for ``shard_map`` stage
programs (manual-collective tensor/expert parallelism inside pipeline
stages).

These are the layer-body pieces that pipeline_forward's decoder body
(parallel/pipeline.py) and the pipelined decode/prefill programs
(parallel/pipeline_decode.py) have in common. They are written in LOCAL
head/intermediate/expert counts — each device sees only its contiguous
block-aligned shard (parallel/tp_layout.py) — and own the manual
collectives GSPMD would otherwise insert: one ``psum`` over ``model``
after each row-parallel projection, one ``psum`` over (``expert``,
``model``) for the MoE combine. With tensor-parallel size 1 the psums
ride size-1 axes and are no-ops, so the same code serves every mesh.

No reference counterpart (the reference is single-node with no TP/EP;
SURVEY.md section 2.9) — this is TPU-native extension machinery.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import EXPERT_AXIS, MODEL_AXIS


def local_qkv_slices(spec, tp: int):
    """(dq, dkv, qh, kvh) column widths/head counts of one device's
    block-aligned fused-qkv shard (tp_layout.shuffle_decoder_layer_for_tp
    reorders the fused columns so the contiguous 1/tp slice is exactly
    ``[q_d | k_d | v_d]``)."""
    qh = spec.q_heads // tp
    kvh = spec.kv_heads // tp
    d = spec.head_dim
    return qh * d, kvh * d, qh, kvh


def tp_project_qkv(spec, tp: int, layer, h, dtype):
    """One fused LOCAL matmul -> (q, k, v) flat column slices of the
    device's heads. Mirrors models/decoder._project_qkv for tp == 1."""
    from ..ops import nn

    fused = nn.dense(layer["attn"]["qkv"], h, dtype)
    dq, dkv, _, _ = local_qkv_slices(spec, tp)
    return (
        fused[..., :dq],
        fused[..., dq : dq + dkv],
        fused[..., dq + dkv :],
    )


def tp_attn_out(layer, attn, dtype):
    """Row-parallel output projection: local head columns hit the local
    row shard of ``o``; the psum over ``model`` completes the sum."""
    from ..ops import nn

    return jax.lax.psum(nn.dense(layer["attn"]["o"], attn, dtype), MODEL_AXIS)


def tp_dense_mlp(layer, h, dtype):
    """SwiGLU MLP with column-parallel gate_up (local ``[gate_d | up_d]``
    block) and row-parallel down; one psum over ``model``."""
    from ..ops import nn

    fused = nn.dense(layer["mlp"]["gate_up"], h, dtype)
    inter = fused.shape[-1] // 2
    act = jax.nn.silu(fused[..., :inter].astype(jnp.float32)).astype(
        dtype
    ) * fused[..., inter:]
    return jax.lax.psum(nn.dense(layer["mlp"]["down"], act, dtype), MODEL_AXIS)


def tp_moe_mlp(spec, layer, h, dtype):
    """Routed SwiGLU MoE under manual EP x TP: the router replicates
    (every device routes identically), each device computes its LOCAL
    experts' local column slice, and ONE psum over (``expert``,
    ``model``) completes both the expert combine and the row-parallel
    reduction. Dense-dispatch form (models/decoder._moe_mlp rationale)."""
    from ..ops import nn

    moe = layer["mlp"]
    lead = h.shape[:-1]
    xf = h.reshape(-1, h.shape[-1])  # [T, H]
    logits = nn.dense(moe["router"], xf, dtype).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, spec.experts_per_token)
    vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    combine = jnp.sum(
        jax.nn.one_hot(idx, spec.num_experts, dtype=jnp.float32)
        * vals[..., None],
        axis=1,
    )  # [T, E] over ALL experts
    wg = nn.resolve_weight(moe["experts"]["gate_up"]["w"], dtype)
    wd = nn.resolve_weight(moe["experts"]["down"]["w"], dtype)
    e_local = wg.shape[0]
    off = jax.lax.axis_index(EXPERT_AXIS) * e_local
    combine_l = jax.lax.dynamic_slice_in_dim(combine, off, e_local, axis=1)
    he = jnp.einsum(
        "th,ehf->etf",
        xf.astype(dtype),
        wg,
        preferred_element_type=jnp.float32,
    )
    inter = he.shape[-1] // 2
    act = (jax.nn.silu(he[..., :inter]) * he[..., inter:]).astype(dtype)
    y = jnp.einsum("eti,eih->eth", act, wd, preferred_element_type=jnp.float32)
    y = jnp.einsum("te,eth->th", combine_l, y)
    y = jax.lax.psum(y, (EXPERT_AXIS, MODEL_AXIS))
    return y.reshape(*lead, h.shape[-1]).astype(dtype)


def tp_mlp_block(spec, layer, h, dtype):
    """Dense or routed MLP, decided by the param-tree structure (static
    under jit); both end replicated over (``expert``, ``model``)."""
    if "router" in layer["mlp"]:
        return tp_moe_mlp(spec, layer, h, dtype)
    return tp_dense_mlp(layer, h, dtype)
