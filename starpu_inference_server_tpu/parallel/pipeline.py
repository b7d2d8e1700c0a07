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

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .mesh import MODEL_AXIS, PIPE_AXIS


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


def _stacked_in_specs(stacked, rules):
    """shard_map in_specs for a stacked layer tree under TP rules: the
    structure matches the bits-stripped tree (quantized leaves expand to
    per-field specs), so it zips exactly with what stage_program sees."""
    from .partition import _map_with_paths, _quant_specs, stacked_layer_spec
    from ..ops.quant import is_packed_int4_leaf, is_quantized_leaf

    def spec_of(path, leaf):
        spec = stacked_layer_spec(path, leaf, rules)
        if is_packed_int4_leaf(leaf) or is_quantized_leaf(leaf):
            w_spec, s_spec = _quant_specs(spec, leaf)
            wkey = "w_p4" if "w_p4" in leaf else "w_q"
            return {wkey: w_spec, "scale": s_spec}
        return spec

    return _map_with_paths(stacked, spec_of, prefix="layers")


def pipeline_forward(
    mesh: Mesh,
    layer_fn: Callable,
    stacked_params,
    x: jnp.ndarray,
    num_microbatches: int,
    rules=None,
):
    """Run ``x`` through the stacked layers, pipelined over ``pipe``.

    ``layer_fn(layer_params, x) -> x`` applies ONE layer (closure over
    masks/positions is fine — they must not depend on the layer index).
    ``stacked_params`` leaves are [L, ...] with L divisible by the pipe
    axis size; ``x`` is [B, ...] with B divisible by num_microbatches.
    Returns [B, ...] replicated across the mesh.

    With ``rules`` (partition.Rules), per-layer weight dims additionally
    shard over the ``model``/``expert`` mesh axes INSIDE each pipeline
    stage; ``layer_fn`` is then responsible for the matching manual
    collectives (psum after row-parallel projections) and for assuming
    block-aligned fused layouts (parallel/tp_layout.py). Without rules,
    per-layer dims replicate and ``layer_fn`` sees full-size weights.
    """
    stages = mesh.shape[PIPE_AXIS]
    batch = x.shape[0]
    if batch % num_microbatches != 0:
        raise ValueError(
            f"batch {batch} not divisible by num_microbatches "
            f"{num_microbatches}"
        )
    param_specs = (
        _stacked_in_specs(stacked_params, rules) if rules is not None else None
    )
    stacked_params, reattach = _split_static_bits(stacked_params)
    if param_specs is None:
        param_specs = jax.tree.map(lambda _: P(PIPE_AXIS), stacked_params)
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
            in_specs=(param_specs, P()),
            out_specs=P(),
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        program = shard_map(
            stage_program,
            mesh=mesh,
            in_specs=(param_specs, P()),
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
    over the ``pipe`` mesh axis (embed/final-norm/lm_head shard by the
    ordinary GSPMD rules outside the shard_map program).

    Tensor parallelism composes INSIDE each pipeline stage: per-layer
    weight dims shard over the ``model`` axis (Megatron column/row
    split) and MoE experts over the ``expert`` axis, with the manual
    collectives the shard_map body owes for them — one psum over
    ``model`` after each row-parallel projection, and one psum over
    (``expert``, ``model``) for the MoE combine. The layer body is
    written in LOCAL head/intermediate/expert counts, so the same code
    serves tp = 1 (the psums over size-1 axes are no-ops). Fused qkv /
    gate_up projections must be block-shuffled at placement
    (parallel/tp_layout.py) so each device's contiguous column slice is
    exactly its ``[q_d | k_d | v_d]`` (resp. ``[gate_d | up_d]``).

    Dense and MoE layers both pipeline; layer params must be homogeneous
    (all dense or all MoE) to stack.
    """
    import math

    from ..models.decoder import rms_norm, rope
    from ..ops import nn
    from .partition import _DECODER_RULES
    from .stage_body import (
        local_qkv_slices,
        tp_attn_out,
        tp_mlp_block,
        tp_project_qkv,
    )
    from .tp_layout import shuffle_decoder_layer_for_tp, validate_decoder_tp

    tp = mesh.shape[MODEL_AXIS]
    validate_decoder_tp(spec, tp)
    _, _, qh, kvh = local_qkv_slices(spec, tp)
    d = spec.head_dim

    b, t = ids.shape
    positions = jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, axis=0)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]

    def layer_fn(layer, x):
        bt = x.shape[0]
        pos = positions[:bt]
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = tp_project_qkv(spec, tp, layer, h, dtype)
        q = qf.reshape(bt, t, qh, d)
        k = kf.reshape(bt, t, kvh, d)
        v = vf.reshape(bt, t, kvh, d)
        q = rope(q, pos)
        k = rope(k, pos)
        rep = qh // kvh
        k = jnp.repeat(k, rep, axis=2)
        v = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(d)
        logits = jnp.where(causal, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32
        ).reshape(bt, t, qh * d).astype(dtype)
        x = x + tp_attn_out(layer, attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        return x + tp_mlp_block(spec, layer, h, dtype)

    from ..models.decoder import rms_norm as _rms  # final norm reuse

    x = nn.embedding(params["embed"], ids, dtype)
    layers = params["layers"]
    # serving passes layers pre-stacked (+shuffled +sharded) by
    # prepare_pipelined_params; library callers may pass the plain list
    if isinstance(layers, dict):
        stacked = layers
    else:
        if tp > 1:
            layers = [
                shuffle_decoder_layer_for_tp(spec, l, tp) for l in layers
            ]
        stacked = stack_layers(layers)
    x = pipeline_forward(
        mesh, layer_fn, stacked, x, num_microbatches, rules=_DECODER_RULES
    )
    x = _rms(params["final_norm"], x)
    return nn.dense(params["lm_head"], x, dtype).astype(jnp.float32)


def prepare_pipelined_params(params, mesh: Mesh, rules, layer_shuffle=None):
    """Placement for pipelined serving: the layer stack becomes ONE
    stacked pytree whose leading [L] axis shards over ``pipe`` (each
    stage holds L/S contiguous layers in its HBM) while the per-layer
    dims keep their tensor-parallel specs; embed / final_norm / lm_head
    shard by the ordinary rules. ``layer_shuffle`` (layer -> layer)
    applies the family's block-alignment permutation for manual TP
    (ModelDefinition.tp_layer_shuffle) before stacking. The ModelEngine
    calls this once at startup (the pipelined analogue of
    parallel.partition.shard_params)."""
    from .partition import shard_params, shard_stacked_layers

    rest = {k: v for k, v in params.items() if k != "layers"}
    placed = shard_params(rest, mesh, rules)
    layers = params["layers"]
    if layer_shuffle is not None:
        layers = [layer_shuffle(layer) for layer in layers]
    placed["layers"] = shard_stacked_layers(
        stack_layers(layers), mesh, rules
    )
    return placed
