"""Fused causal prefill attention (Pallas, flash-style).

The jnp prefill paths (models/decoder.prefill / prefill_chunk /
forward_logits) materialize the full ``[Hq, T, T]`` score tensor and a
GQA-``jnp.repeat``-ed K/V in HBM every layer. These kernels keep the
whole softmax(QK^T)V pipeline in VMEM:

- :func:`causal_attention` — plain causal self-attention over a [B, T]
  block (full prefill and the teacher-forcing forward). Q tiles x KV
  chunks with the online-softmax recurrence; KV chunks entirely above a
  Q tile's diagonal are skipped (compute AND fetch — their block index
  clamps to the last needed chunk, so the pipeline never re-DMAs).
- :func:`chunk_prefill_attention` — the chunked-prefill two-part
  attention: one prompt chunk's queries attend the slot's INT8 cache
  rows at positions < ``start`` (dequantized chunk-by-chunk in VMEM)
  plus the in-chunk keys causally at compute precision, all under ONE
  flash softmax. Matches models/decoder.prefill_chunk numerics. HBM
  traffic for the dominant cache read is the INT8 bytes (4x under the
  jnp dequant-then-repeat path).

Layout: all operands enter the kernels KV-HEAD-MAJOR — q as
``[Hkv, T*rep, D]`` (each KV head's rows serve its ``rep`` query heads
via one batched dot; GQA repeats never materialize) and k/v as
``[Hkv, T, D]`` (pre-transposed outside by XLA: the copies are tiny
next to the score tensors they replace, and they keep every Pallas
block tiled on its last-two ``(seq, D)`` dims with zero in-kernel
relayouts). Reference: the upstream server has no decoders at all
(SURVEY.md section 5.7) — TPU-native extension machinery for the
continuous-batching capability axis.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False
_NEG = -1e30
_VMEM_LIMIT = 100 * 1024 * 1024


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _flash_update(logits, vt, m_scr, l_scr, acc_scr):
    """One online-softmax step. logits [Hkv, R, C]; vt [Hkv, C, D]."""
    m_prev = m_scr[:]
    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(logits - m_new[..., None])
    l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1)
    m_scr[:] = m_new
    pv = jax.lax.dot_general(
        p, vt,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                   # [Hkv, R, D]
    acc_scr[:] = acc_scr[:] * alpha[..., None] + pv


def _q_heads_to_kv_major(q, hkv, rep):
    """[B, T, Hq, D] -> [B, Hkv, T*rep, D] (rows ordered by (t, rep):
    row r of head h is query (t=r//rep, qh=h*rep+r%rep))."""
    b, t, hq, d = q.shape
    return (
        q.reshape(b, t, hkv, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, hkv, t * rep, d)
    )


def _kv_major_to_q_heads(o, t, rep):
    """Inverse of :func:`_q_heads_to_kv_major`."""
    b, hkv, tr, d = o.shape
    return (
        o.reshape(b, hkv, t, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(b, t, hkv * rep, d)
    )


# ---------------------------------------------------------------------------
# causal self-attention: full prefill / teacher-forcing forward
# ---------------------------------------------------------------------------

def _causal_kernel(
    q_ref,    # [1, Hkv, TQ*rep, D]
    k_ref,    # [1, Hkv, C, D]
    v_ref,    # [1, Hkv, C, D]
    o_ref,    # [1, Hkv, TQ*rep, D]
    m_scr,    # f32 [Hkv, TQ*rep]
    l_scr,    # f32 [Hkv, TQ*rep]
    acc_scr,  # f32 [Hkv, TQ*rep, D]
    *,
    tq: int,
    chunk: int,
    n_chunks: int,
    rep: int,
):
    qi = pl.program_id(1)
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    d = q_ref.shape[-1]
    r = tq * rep

    # block-level causal skip: this KV chunk's first position must not
    # exceed the Q tile's last row
    @pl.when(c * chunk <= (qi + 1) * tq - 1)
    def _():
        q = q_ref[0].astype(jnp.float32)                     # [Hkv, R, D]
        kt = k_ref[0].astype(jnp.float32)                    # [Hkv, C, D]
        vt = v_ref[0].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, kt,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(d)                                     # [Hkv, R, C]
        rows = qi * tq + jax.lax.broadcasted_iota(
            jnp.int32, (1, r, chunk), 1
        ) // rep
        cols = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, r, chunk), 2
        )
        logits = jnp.where(cols <= rows, logits, _NEG)
        _flash_update(logits, vt, m_scr, l_scr, acc_scr)

    @pl.when(c == n_chunks - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("rep", "tq", "chunk", "out_dtype")
)
def causal_attention(
    q: jnp.ndarray,  # [B, T, Hq, D]
    k: jnp.ndarray,  # [B, T, Hkv, D]
    v: jnp.ndarray,  # [B, T, Hkv, D]
    rep: int,
    tq: int = 256,
    chunk: int = 512,
    out_dtype=None,
):
    """softmax(q k^T / sqrt(d) + causal) v without materializing the
    [Hq, T, T] scores or the GQA repeats. Rows attend keys at positions
    <= their own (padding rows produce garbage that callers never use —
    the same contract as the jnp path)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    assert hq == hkv * rep, (q.shape, k.shape, rep)
    out_dtype = out_dtype or q.dtype
    tq = min(tq, t)
    chunk = min(chunk, t)
    assert t % tq == 0 and t % chunk == 0, (t, tq, chunk)
    n_q, n_chunks = t // tq, t // chunk

    qv = _q_heads_to_kv_major(q, hkv, rep)     # [B, Hkv, T*rep, D]
    kv = k.transpose(0, 2, 1, 3)               # [B, Hkv, T, D]
    vv = v.transpose(0, 2, 1, 3)
    r = tq * rep

    def kv_idx(bi, qi, c):
        # chunks above the Q tile's diagonal clamp to the tile's last
        # needed chunk: the index stops changing, so the pipeline stops
        # fetching (the body skips compute for them anyway)
        return jnp.minimum(c, ((qi + 1) * tq - 1) // chunk)

    out = pl.pallas_call(
        functools.partial(
            _causal_kernel, tq=tq, chunk=chunk, n_chunks=n_chunks, rep=rep
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, n_q, n_chunks),
            in_specs=[
                pl.BlockSpec(
                    (1, hkv, r, d), lambda bi, qi, c: (bi, 0, qi, 0)
                ),
                pl.BlockSpec(
                    (1, hkv, chunk, d),
                    lambda bi, qi, c: (bi, 0, kv_idx(bi, qi, c), 0),
                ),
                pl.BlockSpec(
                    (1, hkv, chunk, d),
                    lambda bi, qi, c: (bi, 0, kv_idx(bi, qi, c), 0),
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, r, d), lambda bi, qi, c: (bi, 0, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hkv, r), jnp.float32),
                pltpu.VMEM((hkv, r), jnp.float32),
                pltpu.VMEM((hkv, r, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t * rep, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hq * t * t * d,  # ~half skipped by causal clamp
            bytes_accessed=2 * b * t * hkv * d * 2 + 2 * b * t * hq * d * 2,
            transcendentals=b * hq * t * t // 2,
        ),
        interpret=_INTERPRET,
    )(qv, kv, vv)
    return _kv_major_to_q_heads(out, t, rep)


# ---------------------------------------------------------------------------
# bidirectional self-attention: encoder (BERT/ViT) layers
# ---------------------------------------------------------------------------

def _bidir_kernel(
    q_ref,    # [1, Hkv, TQ*rep, D]
    k_ref,    # [1, Hkv, C, D]
    v_ref,    # [1, Hkv, C, D]
    m_ref,    # f32 [1, 1, C] additive key bias (0 attend / -1e9 masked)
    o_ref,    # [1, Hkv, TQ*rep, D]
    m_scr, l_scr, acc_scr,
    *,
    n_chunks: int,
):
    c = pl.program_id(2)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    d = q_ref.shape[-1]
    q = q_ref[0].astype(jnp.float32)
    kt = k_ref[0].astype(jnp.float32)
    vt = v_ref[0].astype(jnp.float32)
    logits = jax.lax.dot_general(
        q, kt,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / math.sqrt(d)
    logits = logits + m_ref[0, 0][None, None, :]
    _flash_update(logits, vt, m_scr, l_scr, acc_scr)

    @pl.when(c == n_chunks - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("rep", "tq", "chunk", "out_dtype")
)
def bidirectional_attention(
    q: jnp.ndarray,        # [B, T, Hq, D]
    k: jnp.ndarray,        # [B, T, Hkv, D]
    v: jnp.ndarray,        # [B, T, Hkv, D]
    key_bias: jnp.ndarray,  # f32 [B, T]: 0 attend / -1e9 masked key
    rep: int = 1,
    tq: int = 256,
    chunk: int = 512,
    out_dtype=None,
):
    """softmax(q k^T / sqrt(d) + key_bias) v for ENCODER layers without
    materializing the [Hq, T, T] scores. Measured on one v5e (bert-base
    heads/dims): isolated 1.35x over XLA at s=512 and 2.0x at s=2048;
    FULL-MODEL bert-base w8a8 at B=16 s=512: 597 -> 1,058 seq/s
    (1.77x). At s=128 the score tile fits VMEM and XLA's fused path
    wins end-to-end, so the nn gate requires s >= 512. Same flash
    recurrence as :func:`causal_attention`, every chunk visited (no
    causal skip)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    assert hq == hkv * rep, (q.shape, k.shape, rep)
    out_dtype = out_dtype or q.dtype
    tq = min(tq, t)
    chunk = min(chunk, t)
    assert t % tq == 0 and t % chunk == 0, (t, tq, chunk)
    n_q, n_chunks = t // tq, t // chunk

    qv = _q_heads_to_kv_major(q, hkv, rep)
    kv = k.transpose(0, 2, 1, 3)
    vv = v.transpose(0, 2, 1, 3)
    r = tq * rep

    out = pl.pallas_call(
        functools.partial(_bidir_kernel, n_chunks=n_chunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b, n_q, n_chunks),
            in_specs=[
                pl.BlockSpec(
                    (1, hkv, r, d), lambda bi, qi, c: (bi, 0, qi, 0)
                ),
                pl.BlockSpec(
                    (1, hkv, chunk, d), lambda bi, qi, c: (bi, 0, c, 0)
                ),
                pl.BlockSpec(
                    (1, hkv, chunk, d), lambda bi, qi, c: (bi, 0, c, 0)
                ),
                # [B, 1, T] so the (sublane, lane) block dims tile:
                # second-minor 1 equals the array dim, last = chunk
                pl.BlockSpec((1, 1, chunk), lambda bi, qi, c: (bi, 0, c)),
            ],
            out_specs=pl.BlockSpec(
                (1, hkv, r, d), lambda bi, qi, c: (bi, 0, qi, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((hkv, r), jnp.float32),
                pltpu.VMEM((hkv, r), jnp.float32),
                pltpu.VMEM((hkv, r, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, hkv, t * rep, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * hq * t * t * d,
            bytes_accessed=2 * b * t * hkv * d * 2 + 2 * b * t * hq * d * 2,
            transcendentals=b * hq * t * t,
        ),
        interpret=_INTERPRET,
    )(qv, kv, vv, key_bias.astype(jnp.float32)[:, None, :])
    return _kv_major_to_q_heads(out, t, rep)


# ---------------------------------------------------------------------------
# chunked prefill: INT8 cache past + in-chunk causal
# ---------------------------------------------------------------------------

def _chunk_kernel(
    start_ref,  # scalar-prefetch: int32 [1]
    q_ref,      # [Hkv, CQ*rep, D]
    kc_ref,     # int8 [Hkv, CH, D]   (cache chunk)
    vc_ref,     # int8 [Hkv, CH, D]
    ks_ref,     # f32 [Hkv, CH]
    vs_ref,     # f32 [Hkv, CH]
    kn_ref,     # [Hkv, CQ, D]        (in-chunk keys, compute precision)
    vn_ref,     # [Hkv, CQ, D]
    o_ref,      # [Hkv, CQ*rep, D]
    m_scr,      # f32 [Hkv, CQ*rep]
    l_scr,      # f32 [Hkv, CQ*rep]
    acc_scr,    # f32 [Hkv, CQ*rep, D]
    *,
    cq: int,
    chunk: int,
    n_past: int,
    rep: int,
):
    c = pl.program_id(0)
    start = start_ref[0]
    d = q_ref.shape[-1]
    r = cq * rep
    inv = 1.0 / math.sqrt(d)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, _NEG)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    @pl.when((c < n_past) & (c * chunk < start))
    def _():
        q = q_ref[:].astype(jnp.float32)                     # [Hkv, R, D]
        kt = kc_ref[:].astype(jnp.float32) * ks_ref[:][..., None]
        vt = vc_ref[:].astype(jnp.float32) * vs_ref[:][..., None]
        logits = jax.lax.dot_general(
            q, kt,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv                                              # [Hkv, R, CH]
        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, r, chunk), 2
        )
        logits = jnp.where(pos < start, logits, _NEG)
        _flash_update(logits, vt, m_scr, l_scr, acc_scr)

    @pl.when(c == n_past)
    def _():
        q = q_ref[:].astype(jnp.float32)
        kt = kn_ref[:].astype(jnp.float32)                   # [Hkv, CQ, D]
        vt = vn_ref[:].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, kt,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * inv                                              # [Hkv, R, CQ]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, r, cq), 1) // rep
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, r, cq), 2)
        logits = jnp.where(cols <= rows, logits, _NEG)
        _flash_update(logits, vt, m_scr, l_scr, acc_scr)
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rep", "chunk", "out_dtype"))
def chunk_prefill_attention(
    q: jnp.ndarray,        # [C, Hq, D] chunk queries (rope applied)
    k_row: jnp.ndarray,    # int8 [T, Hkv, D] the slot's cache row
    v_row: jnp.ndarray,    # int8 [T, Hkv, D]
    k_scale: jnp.ndarray,  # f32 [T, Hkv]
    v_scale: jnp.ndarray,  # f32 [T, Hkv]
    k_cur: jnp.ndarray,    # [C, Hkv, D] in-chunk keys (rope applied)
    v_cur: jnp.ndarray,    # [C, Hkv, D]
    start: jnp.ndarray,    # int32 scalar: chunk's absolute offset
    rep: int,
    chunk: int = 512,
    out_dtype=None,
):
    """Two-part prefill attention: cache positions < ``start`` (INT8,
    dequantized in VMEM) then the in-chunk keys causally, all in ONE
    softmax via the flash recurrence — equals prefill_chunk's
    concat-softmax exactly. Cache chunks at/after ``start`` skip their
    compute at runtime (``start`` is scalar-prefetched)."""
    cq, hq, d = q.shape
    t = k_row.shape[0]
    hkv = k_row.shape[1]
    assert hq == hkv * rep, (q.shape, k_row.shape, rep)
    out_dtype = out_dtype or q.dtype
    chunk = min(chunk, t)
    assert t % chunk == 0, (t, chunk)
    n_past = t // chunk
    r = cq * rep

    qv = _q_heads_to_kv_major(q[None], hkv, rep)[0]  # [Hkv, C*rep, D]
    kr = k_row.transpose(1, 0, 2)                    # int8 [Hkv, T, D]
    vr = v_row.transpose(1, 0, 2)
    ksr = k_scale.transpose(1, 0)                    # f32 [Hkv, T]
    vsr = v_scale.transpose(1, 0)
    knv = k_cur.transpose(1, 0, 2)                   # [Hkv, CQ, D]
    vnv = v_cur.transpose(1, 0, 2)
    start_arr = jnp.reshape(start.astype(jnp.int32), (1,))
    # the final iteration (c == n_past) reads the in-chunk keys; its
    # cache index clamps to the previous chunk (no extra fetch)
    clamp = lambda c: jnp.minimum(c, n_past - 1)
    out = pl.pallas_call(
        functools.partial(
            _chunk_kernel, cq=cq, chunk=chunk, n_past=n_past, rep=rep
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_past + 1,),
            in_specs=[
                pl.BlockSpec((hkv, r, d), lambda c, *_: (0, 0, 0)),
                pl.BlockSpec((hkv, chunk, d), lambda c, *_: (0, clamp(c), 0)),
                pl.BlockSpec((hkv, chunk, d), lambda c, *_: (0, clamp(c), 0)),
                pl.BlockSpec((hkv, chunk), lambda c, *_: (0, clamp(c))),
                pl.BlockSpec((hkv, chunk), lambda c, *_: (0, clamp(c))),
                pl.BlockSpec((hkv, cq, d), lambda c, *_: (0, 0, 0)),
                pl.BlockSpec((hkv, cq, d), lambda c, *_: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((hkv, r, d), lambda c, *_: (0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((hkv, r), jnp.float32),
                pltpu.VMEM((hkv, r), jnp.float32),
                pltpu.VMEM((hkv, r, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((hkv, r, d), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * hq * cq * (t + cq) * d,
            bytes_accessed=2 * t * hkv * d + 4 * cq * hq * d * 2,
            transcendentals=hq * cq * (t + cq),
        ),
        interpret=_INTERPRET,
    )(start_arr, qv, kr, vr, ksr, vsr, knv, vnv)
    return _kv_major_to_q_heads(out[None], cq, rep)[0]
