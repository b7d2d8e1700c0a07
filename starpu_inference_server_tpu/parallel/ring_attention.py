"""Sequence parallelism: ring-attention causal prefill over a mesh axis.

No reference counterpart (SURVEY.md section 5.7: the reference has no
sequence parallelism — this is the TPU-native long-context extension
axis). When a prompt is too long for one chip's HBM *activations* (the
[T, T] score working set and the [T, D] residual stream), the sequence
dimension itself shards over a mesh axis: each device holds T/N
contiguous tokens, and attention sees every key by rotating the K/V
shards around the ring with ``lax.ppermute`` — one point-to-point ICI
hop per step, overlapped with the current block's compute by XLA's
latency-hiding scheduler. The online-softmax recurrence (the same math
as the flash kernels in ops/) makes the rotation exact: each step folds
one K/V block into running (m, l, acc) statistics.

Communication cost: N-1 hops of the LOCAL shard (total bytes = one
all-gather of K/V) but point-to-point on neighboring ICI links and
pipelined against the per-block matmuls — the scaling-book ring-attention
recipe.

Composes with tensor parallelism: heads shard over ``model`` inside the
same shard_map (the layer body psums row-parallel projections exactly
like parallel/stage_body.py).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

_NEG = -1e30


def ring_causal_attention(
    q: jnp.ndarray,  # [B, Tl, Hq, D] LOCAL sequence shard (rope applied)
    k: jnp.ndarray,  # [B, Tl, Hkv, D]
    v: jnp.ndarray,  # [B, Tl, Hkv, D]
    axis_name: str,
    rep: int = 1,
) -> jnp.ndarray:
    """Causal attention with the sequence dimension sharded over
    ``axis_name`` (call inside shard_map). Device i's queries sit at
    global positions ``i*Tl .. (i+1)*Tl-1``; K/V blocks rotate around
    the ring so every query sees every key once, folded via the online
    softmax. Blocks entirely in the causal future contribute nothing
    (their logits mask to -inf; the hop still runs — the ring must keep
    rotating for the devices that do need the block)."""
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    b, tl, hq, d = q.shape
    inv = 1.0 / math.sqrt(d)
    perm = [(i, (i + 1) % n) for i in range(n)]

    qf = q.astype(jnp.float32)                         # [B, Tl, Hq, D]
    rows = my * tl + jnp.arange(tl, dtype=jnp.int32)   # global q positions

    def fold(carry, kv_block, src):
        m, l, acc = carry
        kb, vb = kv_block
        kb = jnp.repeat(kb, rep, axis=2).astype(jnp.float32)
        vb = jnp.repeat(vb, rep, axis=2).astype(jnp.float32)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qf, kb, preferred_element_type=jnp.float32
        ) * inv                                          # [B, H, Tl, Tl]
        cols = src * tl + jnp.arange(tl, dtype=jnp.int32)
        mask = cols[None, None, None, :] <= rows[None, None, :, None]
        logits = jnp.where(mask, logits, _NEG)
        m_new = jnp.maximum(m, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(logits - m_new[..., None])
        l_new = alpha * l + jnp.sum(p, axis=-1)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bkhd->bhqd", p, vb, preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((b, hq, tl), _NEG, jnp.float32)
    l0 = jnp.zeros((b, hq, tl), jnp.float32)
    acc0 = jnp.zeros((b, hq, tl, d), jnp.float32)

    def step(i, carry):
        stats, kb, vb = carry
        # the block currently resident arrived after ``i`` hops: it
        # originated at device my - i (mod n)
        src = (my - i) % n
        stats = fold(stats, (kb, vb), src)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return stats, kb, vb

    (m, l, acc), _, _ = jax.lax.fori_loop(0, n, step, ((m0, l0, acc0), k, v))
    out = acc / jnp.maximum(l, 1e-30)[..., None]         # [B, H, Tl, D]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)


def sequence_parallel_decoder_logits(
    spec,
    params,
    ids: jnp.ndarray,  # int32 [B, T], T divisible by the seq axis size
    mesh: Mesh,
    dtype=jnp.bfloat16,
    seq_axis: str = DATA_AXIS,
):
    """Teacher-forcing decoder forward with the SEQUENCE dimension
    sharded over ``seq_axis`` (long-context prefill/scoring): every
    non-attention op is token-local so it runs on the local shard;
    attention is :func:`ring_causal_attention`. Tensor parallelism over
    ``model`` composes inside the same program (block-aligned fused
    layouts + manual psums, as in parallel/stage_body.py). Returns
    [B, T, vocab] logits, replicated."""
    from ..models.decoder import rms_norm, rope
    from ..ops import nn
    from .stage_body import (
        local_qkv_slices,
        tp_attn_out,
        tp_mlp_block,
        tp_project_qkv,
    )
    from .tp_layout import shuffle_decoder_layer_for_tp, validate_decoder_tp

    n = mesh.shape[seq_axis]
    tp = mesh.shape[MODEL_AXIS]
    validate_decoder_tp(spec, tp)
    b, t = ids.shape
    if t % n != 0:
        raise ValueError(f"sequence {t} not divisible by seq axis {n}")
    tl = t // n
    _, _, qh, kvh = local_qkv_slices(spec, tp)
    d = spec.head_dim
    rep = qh // kvh

    layers = params["layers"]
    if tp > 1:
        layers = [shuffle_decoder_layer_for_tp(spec, l, tp) for l in layers]
    layers_pre_strip = layers
    # quantized leaves carry a static python-int "bits" field that
    # shard_map would trace; strip and reattach inside (pipeline.py's
    # _split_static_bits contract)
    from .pipeline import _split_static_bits

    layers, reattach_layers = _split_static_bits(layers)

    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    def program(params_l, layers_l, ids_l):
        my = jax.lax.axis_index(seq_axis)
        positions = my * tl + jnp.arange(tl, dtype=jnp.int32)[None, :]
        x = nn.embedding(params_l["embed"], ids_l, dtype)  # [B, Tl, D]
        for layer in reattach_layers(layers_l):
            h = rms_norm(layer["attn_norm"], x)
            qf, kf, vf = tp_project_qkv(spec, tp, layer, h, dtype)
            q = rope(qf.reshape(b, tl, qh, d), positions)
            k = rope(kf.reshape(b, tl, kvh, d), positions)
            v = vf.reshape(b, tl, kvh, d)
            attn = ring_causal_attention(q, k, v, seq_axis, rep=rep)
            attn = attn.reshape(b, tl, qh * d).astype(dtype)
            x = x + tp_attn_out(layer, attn, dtype)
            h = rms_norm(layer["mlp_norm"], x)
            x = x + tp_mlp_block(spec, layer, h, dtype)
        x = rms_norm(params_l["final_norm"], x)
        return nn.dense(params_l["lm_head"], x, dtype).astype(jnp.float32)

    rest = {k_: v_ for k_, v_ in params.items() if k_ != "layers"}
    # weights replicate over the seq axis but shard per the TP rules
    # over 'model' (the body computes in LOCAL head/intermediate
    # counts); activations shard their [T] dim. Spec structure must
    # match the bits-stripped layer tree.
    from ..ops.quant import is_packed_int4_leaf, is_quantized_leaf
    from .partition import _DECODER_RULES, _map_with_paths, _quant_specs
    from .partition import _spec_for_path

    def layer_spec(path, leaf):
        spec = _spec_for_path(path, _DECODER_RULES)
        nd = (
            leaf["w_p4" if "w_p4" in leaf else "w_q"].ndim
            if is_packed_int4_leaf(leaf) or is_quantized_leaf(leaf)
            else getattr(leaf, "ndim", 0)
        )
        spec = P(*(list(spec)[:nd] + [None] * max(0, nd - len(spec))))
        if is_packed_int4_leaf(leaf) or is_quantized_leaf(leaf):
            w_spec, s_spec = _quant_specs(spec, leaf)
            wkey = "w_p4" if "w_p4" in leaf else "w_q"
            return {wkey: w_spec, "scale": s_spec}
        return spec

    layer_specs = _map_with_paths(layers_pre_strip, layer_spec, prefix="layers")
    kwargs = dict(
        mesh=mesh,
        in_specs=(P(), layer_specs, P(None, seq_axis)),
        out_specs=P(None, seq_axis),
    )
    try:
        fn = shard_map(program, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        fn = shard_map(program, check_rep=False, **kwargs)
    return fn(rest, layers, ids)
