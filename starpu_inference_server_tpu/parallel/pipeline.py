"""Pipeline parallelism: GPipe-style forward-only microbatch pipeline
over the mesh ``pipe`` axis.

No reference counterpart (SURVEY.md section 2.9: the reference is
single-node with no PP) — this is the TPU-native extension axis for
models whose layer stack exceeds one chip's HBM.

TPU-first design (shard_map + collectives, no host scheduling):

- the L identical transformer layers are STACKED: every param leaf gains
  a leading [L] axis, sharded over ``pipe`` so each of the S stages
  holds L/S contiguous layers in its HBM;
- inside one ``shard_map`` program each stage runs ``lax.scan`` over its
  local layer slice (one compiled layer body, MXU-friendly);
- microbatches flow through a ``lax.fori_loop`` of M + S - 1 ticks with
  a single ``lax.ppermute`` rotation per tick (the classic skewed
  schedule: stage s works on microbatch t - s at tick t); fill/drain
  ticks compute garbage that is masked out of the output buffer;
- the last stage's outputs are psum-masked back to every device so the
  caller sees a replicated result (out_specs stay simple).

Bubble fraction is (S-1)/(M+S-1): pick num_microbatches >= 4*stages for
>80% utilization.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .mesh import PIPE_AXIS


def stack_layers(layers):
    """[{...}, {...}] per-layer param dicts -> one pytree whose leaves
    carry a leading [L] axis (the scan/stage-shard axis).

    Quantization-aware: quantized leaves ({'w_q'/'w_p4', 'scale',
    'bits'}) stack their array fields and keep ``bits`` as a static
    python int (layers must be homogeneous in bit-width)."""
    from ..ops.quant import is_packed_int4_leaf, is_quantized_leaf

    def rec(nodes):
        first = nodes[0]
        if is_quantized_leaf(first) or is_packed_int4_leaf(first):
            wkey = "w_p4" if "w_p4" in first else "w_q"
            bits = first["bits"]
            if any(n["bits"] != bits for n in nodes):
                raise ValueError("cannot stack layers with mixed quant bits")
            return {
                wkey: jnp.stack([n[wkey] for n in nodes]),
                "scale": jnp.stack([n["scale"] for n in nodes]),
                "bits": bits,
            }
        if isinstance(first, dict):
            return {k: rec([n[k] for n in nodes]) for k in first}
        if isinstance(first, (list, tuple)):
            return type(first)(
                rec([n[i] for n in nodes]) for i in range(len(first))
            )
        return jnp.stack(nodes)

    return rec(list(layers))


def _split_static_bits(tree):
    """Split a stacked layer tree into (arrays-only tree, rebuild fn).

    ``shard_map``/``lax.scan`` require every pytree leaf to be an array
    with the stage/scan axis; the quantized leaves' static ``bits`` int
    would break both. The rebuild fn re-attaches ``bits`` to a per-layer
    slice inside the scan body (a closure — stays static under jit)."""
    from ..ops.quant import is_packed_int4_leaf, is_quantized_leaf

    def strip(node):
        if isinstance(node, dict):
            if is_quantized_leaf(node) or is_packed_int4_leaf(node):
                return {k: v for k, v in node.items() if k != "bits"}
            return {k: strip(v) for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            return type(node)(strip(v) for v in node)
        return node

    def rebuild(node, tmpl):
        if isinstance(tmpl, dict):
            if is_quantized_leaf(tmpl) or is_packed_int4_leaf(tmpl):
                out = dict(node)
                out["bits"] = tmpl["bits"]
                return out
            return {k: rebuild(node[k], tmpl[k]) for k in tmpl}
        if isinstance(tmpl, (list, tuple)):
            return type(tmpl)(rebuild(n, t) for n, t in zip(node, tmpl))
        return node

    return strip(tree), lambda dyn: rebuild(dyn, tree)


def pipeline_forward(
    mesh: Mesh,
    layer_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    num_microbatches: int,
):
    """Run ``x`` through the stacked layers, pipelined over ``pipe``.

    ``layer_fn(layer_params, x) -> x`` applies ONE layer (closure over
    masks/positions is fine — they must not depend on the layer index).
    ``stacked_params`` leaves are [L, ...] with L divisible by the pipe
    axis size; ``x`` is [B, ...] with B divisible by num_microbatches.
    Returns [B, ...] replicated across the mesh.
    """
    stages = mesh.shape[PIPE_AXIS]
    batch = x.shape[0]
    if batch % num_microbatches != 0:
        raise ValueError(
            f"batch {batch} not divisible by num_microbatches "
            f"{num_microbatches}"
        )
    stacked_params, reattach = _split_static_bits(stacked_params)
    n_layers = jax.tree.leaves(stacked_params)[0].shape[0]
    if n_layers % stages != 0:
        raise ValueError(
            f"{n_layers} layers not divisible by {stages} pipeline stages"
        )
    mb = batch // num_microbatches
    x_mb = x.reshape(num_microbatches, mb, *x.shape[1:])

    def stage_program(params_local, x_all):
        # params_local leaves: [L/S, ...]; x_all replicated [M, mb, ...]
        stage = jax.lax.axis_index(PIPE_AXIS)
        m = num_microbatches
        total = m + stages - 1
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def run_stage(x_in):
            def body(carry, layer_params):
                return layer_fn(reattach(layer_params), carry), None

            out, _ = jax.lax.scan(body, x_in, params_local)
            return out

        def tick(t, carry):
            buf, outputs = carry
            # stage 0 ingests microbatch t (clamped during drain)
            mb_idx = jnp.clip(t, 0, m - 1)
            x_in = jnp.where(stage == 0, x_all[mb_idx], buf)
            y = run_stage(x_in)
            # last stage emits microbatch t-(S-1) (masked during fill)
            out_idx = jnp.clip(t - (stages - 1), 0, m - 1)
            emit = (stage == stages - 1) & (t >= stages - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(emit, y, outputs[out_idx]),
                out_idx,
                axis=0,
            )
            # rotate activations to the next stage (one hop on ICI)
            buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return buf, outputs

        buf0 = jnp.zeros_like(x_all[0])
        out0 = jnp.zeros_like(x_all)
        _, outputs = jax.lax.fori_loop(0, total, tick, (buf0, out0))
        # outputs are populated only on the last stage: psum the masked
        # buffer so every device returns the same replicated result
        outputs = jnp.where(stage == stages - 1, outputs, 0)
        return jax.lax.psum(outputs, PIPE_AXIS)

    # the masked-psum output pattern is not replication-inferable; the
    # check kwarg was renamed check_rep -> check_vma in jax 0.8
    try:
        program = shard_map(
            stage_program,
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), P()),
            out_specs=P(),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        program = shard_map(
            stage_program,
            mesh=mesh,
            in_specs=(P(PIPE_AXIS), P()),
            out_specs=P(),
            check_rep=False,
        )
    out = program(stacked_params, x_mb)
    return out.reshape(batch, *out.shape[2:])


def pipelined_decoder_logits(
    spec,
    params,
    ids: jnp.ndarray,
    mesh: Mesh,
    num_microbatches: int = 4,
    dtype=jnp.float32,
):
    """Teacher-forcing decoder forward with the layer stack pipelined
    over the ``pipe`` mesh axis (embed/final-norm/lm_head replicate).

    The per-layer body reuses models/decoder.py's blocks, so dense and
    MoE layers both pipeline. Layer params must be homogeneous (all
    dense or all MoE) to stack.
    """
    import math

    from ..models.decoder import (
        _mlp_block,
        _project_qkv,
        rms_norm,
        rope,
    )
    from ..ops import nn

    b, t = ids.shape
    positions = jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, axis=0)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]

    def layer_fn(layer, x):
        bt = x.shape[0]
        pos = positions[:bt]
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = _project_qkv(spec, layer, h, dtype)
        q = qf.reshape(bt, t, spec.q_heads, spec.head_dim)
        k = kf.reshape(bt, t, spec.kv_heads, spec.head_dim)
        v = vf.reshape(bt, t, spec.kv_heads, spec.head_dim)
        q = rope(q, pos)
        k = rope(k, pos)
        rep = spec.q_heads // spec.kv_heads
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(spec.head_dim)
        logits = jnp.where(causal, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).reshape(bt, t, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        return x + _mlp_block(spec, layer, h, dtype)

    from ..models.decoder import rms_norm as _rms  # final norm reuse

    x = nn.embedding(params["embed"], ids, dtype)
    layers = params["layers"]
    # serving passes layers pre-stacked (+sharded) by
    # prepare_pipelined_params; library callers may pass the plain list
    stacked = layers if isinstance(layers, dict) else stack_layers(layers)
    x = pipeline_forward(mesh, layer_fn, stacked, x, num_microbatches)
    x = _rms(params["final_norm"], x)
    return nn.dense(params["lm_head"], x, dtype).astype(jnp.float32)


def prepare_pipelined_params(params, mesh: Mesh, rules):
    """Placement for pipelined serving: the layer stack becomes ONE
    stacked pytree whose leading [L] axis shards over ``pipe`` (each
    stage holds L/S contiguous layers in its HBM) while the per-layer
    dims keep their tensor-parallel specs; embed / final_norm / lm_head
    shard by the ordinary rules. The ModelEngine calls this once at
    startup (the pipelined analogue of parallel.partition.shard_params)."""
    from .partition import shard_params, shard_stacked_layers

    rest = {k: v for k, v in params.items() if k != "layers"}
    placed = shard_params(rest, mesh, rules)
    placed["layers"] = shard_stacked_layers(
        stack_layers(params["layers"]), mesh, rules
    )
    return placed
