"""Pipelined continuous-batching DECODE over the mesh ``pipe`` axis.

No reference counterpart (SURVEY.md section 2.9: the reference is
single-node with no pipeline parallelism and no decoders at all) — this
extends parallel/pipeline.py's forward-only GPipe pipeline to the
generation engine's prefill/decode loop, so a decoder whose layer stack
exceeds one chip's HBM can still serve continuous-batching generation:
each pipeline stage holds L/P contiguous layers AND those layers' slice
of the INT8 KV cache (the cache's leading [L] axis shards over ``pipe``
alongside the stacked weights).

Two programs, both single ``shard_map``s with one ``lax.ppermute`` hop
per tick (TPU-first: no host scheduling, static shapes throughout):

- :func:`pipelined_prefill` — TeraPipe-style SEQUENCE pipelining: the
  padded prompt splits into C chunks that flow through the stages
  (chunk m at stage s on tick m+s). In-chunk attention runs at compute
  precision under a causal mask; attention to earlier chunks reads the
  INT8 cache rows those chunks already wrote at this stage — chunk m-1
  passes stage s exactly one tick before chunk m, so writes always
  precede reads. Numerics match models/decoder.prefill_chunk applied
  sequentially (same math, same round-trips).
- :func:`pipelined_decode_step` — SLOT-microbatch pipelining: the S
  cache slots split into M microgroups that flow through the stages,
  each advancing one token. Per-slot independence makes this exact: it
  computes precisely what models/decoder.decode_step computes, stage by
  stage.

Fill/drain ticks compute garbage; activations are masked out of the
output buffer and cache writes are neutralized — decode parks invalid
writes at position t_max-1 (safe by decode_step's own argument: that row
is rewritten by the slot's write-before-attend step before it can ever
be attended), prefill read-modify-writes its chunk rows with a
``jnp.where`` keep of the existing values. Bubble fraction per program
is (P-1)/(M+P-1); decode ticks are small (G slots x 1 token through L/P
layers), so prefer num_slots >= 4*stages where HBM allows.

Tensor/expert parallelism composes INSIDE each stage (same contract as
the pipelined forward, parallel/pipeline.py): per-layer weight dims
shard over the ``model``/``expert`` mesh axes, the KV cache's head axis
shards over ``model`` alongside the column-parallel kv projections, and
the stage body owes the manual collectives (parallel/stage_body.py) —
one psum over ``model`` per row-parallel projection, one over
(``expert``, ``model``) for the MoE combine. Fused qkv / gate_up must
be block-shuffled at placement (parallel/tp_layout.py). Only the
``data`` axis is excluded: slots flow through the stages whole, so
slot-data-sharding belongs to GSPMD mesh mode (no pipe) instead.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from .mesh import DATA_AXIS, MODEL_AXIS, PIPE_AXIS
from .pipeline import _split_static_bits, _stacked_in_specs
from .stage_body import (
    local_qkv_slices,
    tp_attn_out,
    tp_mlp_block,
    tp_project_qkv,
)


def _shard_map(fn, mesh, in_specs, out_specs):
    """check kwarg renamed check_rep -> check_vma in jax 0.8."""
    try:
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )
    except TypeError:  # pragma: no cover - older jax
        return shard_map(
            fn, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_rep=False,
        )


def validate_pipe_mesh(mesh: Mesh) -> int:
    """The pipelined decode path's mesh contract: ``model``/``expert``
    compose inside the stages, but the ``data`` axis must be 1 — slots
    flow through the stages whole (microgroups ARE the decode path's
    slot partitioning), so slot-data-sharding belongs to GSPMD mesh mode
    (no pipe) instead. Returns the stage count."""
    stages = mesh.shape[PIPE_AXIS]
    data = mesh.shape.get(DATA_AXIS, 1)
    if data > 1:
        raise ValueError(
            f"pipelined decoding does not compose with the 'data' mesh "
            f"axis (got data={data}): slots microgroup over 'pipe' "
            "instead — use GSPMD mesh mode (data/model/expert without "
            "pipe) for slot-sharded decoding"
        )
    return stages


def _cache_specs(mesh: Mesh):
    """shard_map PartitionSpecs for the KV cache arrays: the [L] layer
    axis shards over ``pipe`` alongside the stacked weights, and the
    head axis shards over ``model`` alongside the column-parallel kv
    projections (each device quantizes/attends only its local heads)."""
    kv = P(PIPE_AXIS, None, None, MODEL_AXIS, None)   # [L, S, T, Hkv, D]
    scale = P(PIPE_AXIS, None, None, MODEL_AXIS)      # [L, S, T, Hkv]
    return kv, scale


def _layer_scan(spec, stacked_local, reattach, body):
    """Scan ``body(li, layer_params, carry) -> carry`` over this stage's
    local layer slice. ``li`` is the LOCAL layer index (traced scalar),
    used to address the stage's cache shard."""

    def step(carry, layer_arrays):
        x, caches, li = carry
        layer = reattach(layer_arrays)
        x, caches = body(li, layer, x, caches)
        return (x, caches, li + 1), None

    def run(x, caches):
        (x, caches, _), _ = jax.lax.scan(
            step, (x, caches, jnp.int32(0)), stacked_local
        )
        return x, caches

    return run


# ---------------------------------------------------------------------------
# decode: advance every active slot one token, slots microgrouped
# ---------------------------------------------------------------------------

def pipelined_decode_step(
    spec,
    params,
    cache,
    ids: jnp.ndarray,      # int32 [S]
    active: jnp.ndarray,   # bool [S]
    mesh: Mesh,
    dtype=jnp.bfloat16,
    num_microgroups: int = 0,
):
    """Pipe-sharded equivalent of models/decoder.decode_step.

    ``params`` carries STACKED layers (parallel.pipeline.stack_layers /
    prepare_pipelined_params) whose leading [L] axis — like the cache's —
    shards over ``pipe``; per-layer dims and the cache's head axis
    additionally shard over ``model``/``expert`` (TP/EP inside each
    stage, with block-shuffled fused layouts — tp_layout.py). Returns
    ``(cache', logits [S, vocab])``.
    """
    from ..models.decoder import (
        _dequantize_kv,
        _quantize_kv,
        _use_fused_decode_attention,
        rms_norm,
        rope,
    )
    from ..ops import nn
    from .partition import _DECODER_RULES
    from .tp_layout import validate_decoder_tp

    stages = validate_pipe_mesh(mesh)
    tp = mesh.shape[MODEL_AXIS]
    validate_decoder_tp(spec, tp)
    s = ids.shape[0]
    m = num_microgroups or min(stages, s)
    if s % m != 0:
        raise ValueError(
            f"num_slots ({s}) not divisible by decode microgroups ({m})"
        )
    g = s // m
    t_max = cache.max_len
    lengths = cache.lengths
    inv = 1.0 / math.sqrt(spec.head_dim)
    _, _, qh, kvh = local_qkv_slices(spec, tp)  # LOCAL head counts
    rep = qh // kvh
    # shard_map bodies are per-device programs, so the fused Pallas
    # decode kernel composes (same gate as single-chip decode_step)
    fused = _use_fused_decode_attention(spec, t_max)

    x = nn.embedding(params["embed"], ids[:, None], dtype)  # [S, 1, D]
    x_mb = x.reshape(m, g, 1, x.shape[-1])

    param_specs = _stacked_in_specs(params["layers"], _DECODER_RULES)
    stacked, reattach = _split_static_bits(params["layers"])
    kv_spec, scale_spec = _cache_specs(mesh)
    key_pos = jnp.arange(t_max, dtype=jnp.int32)[None, :]  # [1, T]

    def stage_program(layers_local, ck, cv, cks, cvs, x_all):
        stage = jax.lax.axis_index(PIPE_AXIS)
        total = m + stages - 1
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def make_body(rows, write_pos, pos):
            mask = (key_pos <= pos[:, None])[:, None, None, :]  # [G,1,1,T]

            def body(li, layer, xg, caches):
                ck, cv, cks, cvs = caches
                h = rms_norm(layer["attn_norm"], xg)
                qf, kf, vf = tp_project_qkv(spec, tp, layer, h, dtype)
                q = qf.reshape(g, 1, qh, spec.head_dim)
                k = kf.reshape(g, 1, kvh, spec.head_dim)
                v = vf.reshape(g, 1, kvh, spec.head_dim)
                q = rope(q, pos[:, None])
                k = rope(k, pos[:, None])
                kq, kscale = _quantize_kv(k[:, 0])  # [G, H_l, D], [G, H_l]
                vq, vscale = _quantize_kv(v[:, 0])
                ck = ck.at[li, rows, write_pos].set(kq)
                cv = cv.at[li, rows, write_pos].set(vq)
                cks = cks.at[li, rows, write_pos].set(kscale)
                cvs = cvs.at[li, rows, write_pos].set(vscale)
                off = rows[0]
                hd = spec.head_dim
                k_rows = jax.lax.dynamic_slice(
                    ck, (li, off, 0, 0, 0), (1, g, t_max, kvh, hd)
                )[0]
                v_rows = jax.lax.dynamic_slice(
                    cv, (li, off, 0, 0, 0), (1, g, t_max, kvh, hd)
                )[0]
                ks_rows = jax.lax.dynamic_slice(
                    cks, (li, off, 0, 0), (1, g, t_max, kvh)
                )[0]
                vs_rows = jax.lax.dynamic_slice(
                    cvs, (li, off, 0, 0), (1, g, t_max, kvh)
                )[0]
                if fused:
                    from ..ops.decode_attention import decode_attention

                    attn = decode_attention(
                        q[:, 0], k_rows, v_rows, ks_rows, vs_rows, pos,
                        rep=rep,
                    ).reshape(g, 1, qh * spec.head_dim).astype(dtype)
                else:
                    k_all = jnp.repeat(
                        _dequantize_kv(k_rows, ks_rows, dtype), rep, axis=2
                    )
                    v_all = jnp.repeat(
                        _dequantize_kv(v_rows, vs_rows, dtype), rep, axis=2
                    )
                    logits = jnp.einsum(
                        "sqhd,skhd->shqk", q, k_all,
                        preferred_element_type=jnp.float32,
                    ) * inv
                    logits = jnp.where(mask, logits, -1e9)
                    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
                    attn = jnp.einsum(
                        "shqk,skhd->sqhd", probs, v_all,
                        preferred_element_type=jnp.float32,
                    ).reshape(g, 1, qh * spec.head_dim).astype(dtype)
                xg = xg + tp_attn_out(layer, attn, dtype)
                h = rms_norm(layer["mlp_norm"], xg)
                xg = xg + tp_mlp_block(spec, layer, h, dtype)
                return xg, (ck, cv, cks, cvs)

            return body

        def tick(t, carry):
            buf, outputs, caches = carry
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            valid = (t >= stage) & (t - stage < m)
            off = mb_idx * g
            rows = off + jnp.arange(g)
            pos = jnp.take(lengths, rows)
            act = jnp.take(active, rows) & valid
            # invalid/inactive writes park at t_max-1 (decode_step's rule)
            write_pos = jnp.where(act, pos, t_max - 1)
            x_in = jnp.where(stage == 0, x_all[mb_idx], buf)
            run = _layer_scan(
                spec, layers_local, reattach, make_body(rows, write_pos, pos)
            )
            y, caches = run(x_in, caches)
            out_idx = jnp.clip(t - (stages - 1), 0, m - 1)
            emit = (stage == stages - 1) & (t >= stages - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(emit, y[:, 0, :], outputs[out_idx]),
                out_idx,
                axis=0,
            )
            buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return buf, outputs, caches

        buf0 = jnp.zeros_like(x_all[0])
        out0 = jnp.zeros((m, g, x_all.shape[-1]), x_all.dtype)
        _, outputs, caches = jax.lax.fori_loop(
            0, total, tick, (buf0, out0, (ck, cv, cks, cvs))
        )
        outputs = jnp.where(stage == stages - 1, outputs, 0)
        return (jax.lax.psum(outputs, PIPE_AXIS),) + caches

    program = _shard_map(
        stage_program,
        mesh,
        in_specs=(param_specs, kv_spec, kv_spec, scale_spec, scale_spec, P()),
        out_specs=(P(), kv_spec, kv_spec, scale_spec, scale_spec),
    )
    out, ck, cv, cks, cvs = program(
        stacked, cache.k, cache.v, cache.k_scale, cache.v_scale, x_mb
    )
    x = out.reshape(s, -1)
    from ..models.decoder import rms_norm as _rms
    from ..ops import nn as _nn

    x = _rms(params["final_norm"], x)
    logits = _nn.dense(params["lm_head"], x, dtype).astype(jnp.float32)
    new_lengths = jnp.where(active, lengths + 1, lengths)
    return cache._replace(
        k=ck, v=cv, k_scale=cks, v_scale=cvs, lengths=new_lengths
    ), logits


# ---------------------------------------------------------------------------
# verify: advance every active slot W tokens (speculative decoding),
# slots microgrouped over the pipe axis
# ---------------------------------------------------------------------------

def pipelined_verify_step(
    spec,
    params,
    cache,
    ids: jnp.ndarray,      # int32 [S, W]: row w sits at lengths+w
    active: jnp.ndarray,   # bool [S]
    mesh: Mesh,
    dtype=jnp.bfloat16,
    num_microgroups: int = 0,
):
    """Pipe-sharded equivalent of models/decoder.verify_step: the target
    model scores W draft tokens per slot in one pass, slot-microgroups
    flowing through the stages exactly like pipelined_decode_step. KV
    for all W positions is written; ``lengths`` is NOT advanced (the
    caller commits the accepted prefix). Composes TP/EP inside stages.
    Returns ``(cache', logits [S, W, vocab])``."""
    from ..models.decoder import (
        _dequantize_kv,
        _quantize_kv,
        _use_fused_decode_attention,
        rms_norm,
        rope,
    )
    from ..ops import nn
    from .partition import _DECODER_RULES
    from .tp_layout import validate_decoder_tp

    stages = validate_pipe_mesh(mesh)
    tp = mesh.shape[MODEL_AXIS]
    validate_decoder_tp(spec, tp)
    s, w = ids.shape
    m = num_microgroups or min(stages, s)
    if s % m != 0:
        raise ValueError(
            f"num_slots ({s}) not divisible by verify microgroups ({m})"
        )
    g = s // m
    t_max = cache.max_len
    lengths = cache.lengths
    inv = 1.0 / math.sqrt(spec.head_dim)
    _, _, qh, kvh = local_qkv_slices(spec, tp)  # LOCAL head counts
    rep = qh // kvh

    fused = _use_fused_decode_attention(spec, t_max)

    x = nn.embedding(params["embed"], ids, dtype)       # [S, W, D]
    x_mb = x.reshape(m, g, w, x.shape[-1])

    param_specs = _stacked_in_specs(params["layers"], _DECODER_RULES)
    stacked, reattach = _split_static_bits(params["layers"])
    kv_spec, scale_spec = _cache_specs(mesh)
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    win = jnp.arange(w, dtype=jnp.int32)

    def stage_program(layers_local, ck, cv, cks, cvs, x_all):
        stage = jax.lax.axis_index(PIPE_AXIS)
        total = m + stages - 1
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def make_body(rows, write_pos, pos):
            # query row (slot, w) attends cache positions <= pos[slot, w]
            mask = (
                key_pos[None, None, None, :] <= pos[:, None, :, None]
            )  # [G, 1, W, T]

            def body(li, layer, xg, caches):
                ck, cv, cks, cvs = caches
                h = rms_norm(layer["attn_norm"], xg)
                qf, kf, vf = tp_project_qkv(spec, tp, layer, h, dtype)
                q = qf.reshape(g, w, qh, spec.head_dim)
                k = kf.reshape(g, w, kvh, spec.head_dim)
                v = vf.reshape(g, w, kvh, spec.head_dim)
                q = rope(q, pos)
                k = rope(k, pos)
                kq, kscale = _quantize_kv(k)   # [G, W, H_l, D], [G, W, H_l]
                vq, vscale = _quantize_kv(v)
                rr = rows[:, None]
                ck = ck.at[li, rr, write_pos].set(kq)
                cv = cv.at[li, rr, write_pos].set(vq)
                cks = cks.at[li, rr, write_pos].set(kscale)
                cvs = cvs.at[li, rr, write_pos].set(vscale)
                off = rows[0]
                hd = spec.head_dim
                k_rows = jax.lax.dynamic_slice(
                    ck, (li, off, 0, 0, 0), (1, g, t_max, kvh, hd)
                )[0]
                v_rows = jax.lax.dynamic_slice(
                    cv, (li, off, 0, 0, 0), (1, g, t_max, kvh, hd)
                )[0]
                ks_rows = jax.lax.dynamic_slice(
                    cks, (li, off, 0, 0), (1, g, t_max, kvh)
                )[0]
                vs_rows = jax.lax.dynamic_slice(
                    cvs, (li, off, 0, 0), (1, g, t_max, kvh)
                )[0]
                if fused:
                    from ..ops.decode_attention import (
                        window_decode_attention,
                    )

                    attn = window_decode_attention(
                        q, k_rows, v_rows, ks_rows, vs_rows, pos[:, 0],
                        rep=rep,
                    ).reshape(g, w, qh * spec.head_dim).astype(dtype)
                else:
                    k_all = jnp.repeat(
                        _dequantize_kv(k_rows, ks_rows, dtype), rep, axis=2
                    )
                    v_all = jnp.repeat(
                        _dequantize_kv(v_rows, vs_rows, dtype), rep, axis=2
                    )
                    logits = jnp.einsum(
                        "swhd,skhd->shwk", q, k_all,
                        preferred_element_type=jnp.float32,
                    ) * inv
                    logits = jnp.where(mask, logits, -1e9)
                    probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
                    attn = jnp.einsum(
                        "shwk,skhd->swhd", probs, v_all,
                        preferred_element_type=jnp.float32,
                    ).reshape(g, w, qh * spec.head_dim).astype(dtype)
                xg = xg + tp_attn_out(layer, attn, dtype)
                h = rms_norm(layer["mlp_norm"], xg)
                xg = xg + tp_mlp_block(spec, layer, h, dtype)
                return xg, (ck, cv, cks, cvs)

            return body

        def tick(t, carry):
            buf, outputs, caches = carry
            mb_idx = jnp.clip(t - stage, 0, m - 1)
            valid = (t >= stage) & (t - stage < m)
            off = mb_idx * g
            rows = off + jnp.arange(g)
            pos = jnp.take(lengths, rows)[:, None] + win[None, :]  # [G, W]
            act = (jnp.take(active, rows) & valid)[:, None]
            write_pos = jnp.where(act, pos, t_max - 1)
            x_in = jnp.where(stage == 0, x_all[mb_idx], buf)
            run = _layer_scan(
                spec, layers_local, reattach, make_body(rows, write_pos, pos)
            )
            y, caches = run(x_in, caches)
            out_idx = jnp.clip(t - (stages - 1), 0, m - 1)
            emit = (stage == stages - 1) & (t >= stages - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(emit, y, outputs[out_idx]),
                out_idx,
                axis=0,
            )
            buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return buf, outputs, caches

        buf0 = jnp.zeros_like(x_all[0])
        out0 = jnp.zeros_like(x_all)
        _, outputs, caches = jax.lax.fori_loop(
            0, total, tick, (buf0, out0, (ck, cv, cks, cvs))
        )
        outputs = jnp.where(stage == stages - 1, outputs, 0)
        return (jax.lax.psum(outputs, PIPE_AXIS),) + caches

    program = _shard_map(
        stage_program,
        mesh,
        in_specs=(param_specs, kv_spec, kv_spec, scale_spec, scale_spec, P()),
        out_specs=(P(), kv_spec, kv_spec, scale_spec, scale_spec),
    )
    out, ck, cv, cks, cvs = program(
        stacked, cache.k, cache.v, cache.k_scale, cache.v_scale, x_mb
    )
    x = out.reshape(s * w, -1)
    from ..models.decoder import rms_norm as _rms
    from ..ops import nn as _nn

    x = _rms(params["final_norm"], x)
    logits = _nn.dense(params["lm_head"], x, dtype).astype(jnp.float32)
    return cache._replace(
        k=ck, v=cv, k_scale=cks, v_scale=cvs
    ), logits.reshape(s, w, spec.vocab)


# ---------------------------------------------------------------------------
# prefill: write one prompt into one slot, sequence-chunk pipelined
# ---------------------------------------------------------------------------

def pipelined_prefill(
    spec,
    params,
    cache,
    ids: jnp.ndarray,      # int32 [P] padded prompt
    length: jnp.ndarray,   # int32 scalar: true prompt length
    slot: jnp.ndarray,     # int32 scalar: target slot
    mesh: Mesh,
    dtype=jnp.bfloat16,
    num_chunks: int = 0,
):
    """Pipe-sharded prefill: TeraPipe sequence chunking over the stages.

    Numerics match models/decoder.prefill_chunk run chunk-by-chunk (past
    keys round-trip the INT8 cache, in-chunk keys stay at compute
    precision). TP/EP compose inside the stages exactly as in
    :func:`pipelined_decode_step`. Returns ``(cache', last_logits
    [vocab])``.
    """
    from ..models.decoder import (
        _dequantize_kv,
        _quantize_kv,
        _use_fused_prefill_attention,
        rms_norm,
        rope,
    )
    from ..ops import nn
    from .partition import _DECODER_RULES
    from .tp_layout import validate_decoder_tp

    stages = validate_pipe_mesh(mesh)
    tp = mesh.shape[MODEL_AXIS]
    validate_decoder_tp(spec, tp)
    p = ids.shape[0]
    n_chunks = num_chunks or stages
    if p % n_chunks != 0:
        raise ValueError(
            f"prefill bucket ({p}) not divisible by pipeline chunks "
            f"({n_chunks})"
        )
    c = p // n_chunks
    t_max = cache.max_len
    inv = 1.0 / math.sqrt(spec.head_dim)
    _, _, qh, kvh = local_qkv_slices(spec, tp)  # LOCAL head counts
    rep = qh // kvh
    hkv, hd = kvh, spec.head_dim
    # per-stage chunked-prefill attention routes through the fused
    # Pallas kernel where it wins (cache row >= 512, see the gate)
    fused = _use_fused_prefill_attention(spec, t_max, min_seq=512)

    x = nn.embedding(params["embed"], ids[None, :], dtype)  # [1, P, D]
    x_chunks = x.reshape(n_chunks, 1, c, x.shape[-1])

    param_specs = _stacked_in_specs(params["layers"], _DECODER_RULES)
    stacked, reattach = _split_static_bits(params["layers"])
    kv_spec, scale_spec = _cache_specs(mesh)
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    cur_mask = jnp.tril(jnp.ones((c, c), bool))[None, None]  # [1,1,C,C]

    def stage_program(layers_local, ck, cv, cks, cvs, x_all):
        stage = jax.lax.axis_index(PIPE_AXIS)
        total = n_chunks + stages - 1
        perm = [(i, (i + 1) % stages) for i in range(stages)]

        def make_body(start, valid):
            positions = start + jnp.arange(c, dtype=jnp.int32)
            past_mask = (key_pos[None, :] < start)[None, None]  # [1,1,1→C,T]

            def body(li, layer, xc, caches):
                ck, cv, cks, cvs = caches
                h = rms_norm(layer["attn_norm"], xc)
                qf, kf, vf = tp_project_qkv(spec, tp, layer, h, dtype)
                q = qf.reshape(1, c, qh, hd)
                k = kf.reshape(1, c, hkv, hd)
                v = vf.reshape(1, c, hkv, hd)
                q = rope(q, positions[None])
                k = rope(k, positions[None])
                kq, kscale = _quantize_kv(k[0])   # [C, H, D], [C, H]
                vq, vscale = _quantize_kv(v[0])

                # read-modify-write the chunk rows: fill/drain ticks keep
                # the existing values (no parking spot needed)
                def rmw(buf, new, ndim_tail):
                    idx = (li, slot, start) + (jnp.int32(0),) * ndim_tail
                    sizes = (1, 1, c) + new.shape[1:]
                    cur = jax.lax.dynamic_slice(buf, idx, sizes)
                    sel = jnp.where(valid, new[None, None], cur)
                    return jax.lax.dynamic_update_slice(buf, sel, idx)

                ck = rmw(ck, kq, 2)
                cv = rmw(cv, vq, 2)
                cks = rmw(cks, kscale, 1)
                cvs = rmw(cvs, vscale, 1)

                # past attention over the INT8 cache row (pos < start)
                raw_k = jax.lax.dynamic_slice(
                    ck, (li, slot, 0, 0, 0), (1, 1, t_max, hkv, hd)
                )[0, 0]
                raw_v = jax.lax.dynamic_slice(
                    cv, (li, slot, 0, 0, 0), (1, 1, t_max, hkv, hd)
                )[0, 0]
                raw_ks = jax.lax.dynamic_slice(
                    cks, (li, slot, 0, 0), (1, 1, t_max, hkv)
                )[0, 0]
                raw_vs = jax.lax.dynamic_slice(
                    cvs, (li, slot, 0, 0), (1, 1, t_max, hkv)
                )[0, 0]
                if fused:
                    from ..ops.prefill_attention import (
                        chunk_prefill_attention,
                    )

                    attn = chunk_prefill_attention(
                        q[0], raw_k, raw_v, raw_ks, raw_vs, k[0], v[0],
                        start, rep=rep, out_dtype=dtype,
                    ).reshape(1, c, qh * hd)
                else:
                    row_k = jnp.repeat(
                        _dequantize_kv(raw_k, raw_ks, dtype), rep, axis=1
                    )[None]
                    row_v = jnp.repeat(
                        _dequantize_kv(raw_v, raw_vs, dtype), rep, axis=1
                    )[None]
                    s_past = jnp.einsum(
                        "bqhd,bkhd->bhqk", q, row_k,
                        preferred_element_type=jnp.float32,
                    ) * inv
                    s_past = jnp.where(past_mask, s_past, -1e9)
                    kc = jnp.repeat(k, rep, axis=2)
                    vc = jnp.repeat(v, rep, axis=2)
                    s_cur = jnp.einsum(
                        "bqhd,bkhd->bhqk", q, kc,
                        preferred_element_type=jnp.float32,
                    ) * inv
                    s_cur = jnp.where(cur_mask, s_cur, -1e9)
                    probs = jax.nn.softmax(
                        jnp.concatenate([s_past, s_cur], axis=-1), axis=-1
                    ).astype(dtype)
                    p_past, p_cur = probs[..., :t_max], probs[..., t_max:]
                    attn = jnp.einsum(
                        "bhqk,bkhd->bqhd", p_past, row_v,
                        preferred_element_type=jnp.float32,
                    )
                    attn = attn + jnp.einsum(
                        "bhqk,bkhd->bqhd", p_cur, vc,
                        preferred_element_type=jnp.float32,
                    )
                    attn = attn.reshape(1, c, qh * hd).astype(dtype)
                xc = xc + tp_attn_out(layer, attn, dtype)
                h = rms_norm(layer["mlp_norm"], xc)
                xc = xc + tp_mlp_block(spec, layer, h, dtype)
                return xc, (ck, cv, cks, cvs)

            return body

        def tick(t, carry):
            buf, outputs, caches = carry
            mb_idx = jnp.clip(t - stage, 0, n_chunks - 1)
            valid = (t >= stage) & (t - stage < n_chunks)
            start = mb_idx * c
            x_in = jnp.where(stage == 0, x_all[mb_idx], buf)
            run = _layer_scan(
                spec, layers_local, reattach, make_body(start, valid)
            )
            y, caches = run(x_in, caches)
            out_idx = jnp.clip(t - (stages - 1), 0, n_chunks - 1)
            emit = (stage == stages - 1) & (t >= stages - 1)
            outputs = jax.lax.dynamic_update_index_in_dim(
                outputs,
                jnp.where(emit, y, outputs[out_idx]),
                out_idx,
                axis=0,
            )
            buf = jax.lax.ppermute(y, PIPE_AXIS, perm)
            return buf, outputs, caches

        buf0 = jnp.zeros_like(x_all[0])
        out0 = jnp.zeros_like(x_all)
        _, outputs, caches = jax.lax.fori_loop(
            0, total, tick, (buf0, out0, (ck, cv, cks, cvs))
        )
        outputs = jnp.where(stage == stages - 1, outputs, 0)
        return (jax.lax.psum(outputs, PIPE_AXIS),) + caches

    program = _shard_map(
        stage_program,
        mesh,
        in_specs=(param_specs, kv_spec, kv_spec, scale_spec, scale_spec, P()),
        out_specs=(P(), kv_spec, kv_spec, scale_spec, scale_spec),
    )
    out, ck, cv, cks, cvs = program(
        stacked, cache.k, cache.v, cache.k_scale, cache.v_scale, x_chunks
    )
    x_full = out.reshape(p, -1)  # [P, D]
    from ..models.decoder import rms_norm as _rms

    last = x_full[length - 1]
    last = _rms(params["final_norm"], last[None, :])
    logits = nn.dense(params["lm_head"], last, dtype)[0]
    cache = cache._replace(
        k=ck, v=cv, k_scale=cks, v_scale=cvs,
        lengths=cache.lengths.at[slot].set(length),
    )
    return cache, logits.astype(jnp.float32)
