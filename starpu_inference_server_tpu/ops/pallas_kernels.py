"""Pallas TPU kernels: fused dequant-matmul for INT8/INT4 weights.

No reference counterpart — the reference's hot op is LibTorch's cuDNN
forward (starpu_setup.cpp:784-846); here the quantized matmul path is a
hand-written MXU kernel per the BASELINE.json requirement ("all
dequant+matmul paths as Pallas kernels").

Key idea: per-output-channel symmetric scales commute with the
contraction —  (x @ (w_q * s)) == (x @ w_q) * s  — so the kernel never
materializes a dequantized weight in HBM: int8 (or packed-int4) tiles
are DMA'd to VMEM, cast to bf16 in registers, fed to the MXU with f32
accumulation, and the column scales are applied to the f32 accumulator.
HBM traffic for weights drops 2x (int8) / 4x (int4) vs bf16.

Grid: (M/TM, N/TN, K/TK) with a VMEM f32 accumulator scratch; K is the
innermost (sequential) axis so the accumulator lives across the K steps
of one (i, j) tile (standard Pallas matmul pipeline pattern).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Flipped to True by tests on CPU (interpret mode runs anywhere).
_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _divisor_tile(dim: int, preferred: int, limit: int) -> int:
    """Largest multiple-of-128 divisor of ``dim`` that is <= limit,
    biased toward ``preferred``. Returns 0 when none exists.

    Padding weights inside a jitted serving step materializes a copy of
    the whole weight in HBM every call; when the weight dims are already
    128-aligned (every transformer dim here), choosing divisor tiles
    makes the pad a no-op instead.
    """
    if dim % 128 != 0:
        return 0
    best = 0
    for mult in range(1, dim // 128 + 1):
        tile = 128 * mult
        if tile > limit:
            break
        if dim % tile == 0:
            best = tile
        if tile >= preferred and best >= preferred:
            break
    return best


# per-tile VMEM budget for the weight operand (double-buffered by the
# pipeline, so keep well under the ~16 MB/core VMEM)
_W_TILE_BUDGET = 4 * 1024 * 1024
# int4 tiles expand ~3x in scoped VMEM during the int32 nibble unpack
# (lo/hi intermediates), so their packed-byte budget is smaller
_W_TILE_BUDGET_INT4 = 2 * 1024 * 1024


def _matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # int8 tile -> bf16 in VMEM, MXU dot with f32 accumulation
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        w_ref[:].astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        # apply per-output-channel scales to the f32 accumulator
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _int4_matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    """Pairwise int4 layout (ops.quant.pack_int4): byte row a of the
    [K/2, N] packed array holds w[2a] (low nibble) and w[2a+1] (high).
    That is exactly ``pltpu.bitcast(packed, int4)``'s row order, so the
    unpack is Mosaic's NATIVE int4 -> bf16 conversion — no int32 shift
    dance in the VPU (the previous planar unpack peaked at ~415 GB/s
    packed; the native conversion clears the int8 kernel's wall-clock)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(w_ref[:], jnp.int4)  # [2*tk2, tn] int4
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:].astype(jnp.bfloat16),
        w4.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _int4_w4a8_kernel(x_ref, sx_ref, w_ref, s_ref, o_ref, acc_ref, *, n_k: int):
    """W4A8: int8 activations (per-row scales) x pairwise-packed int4
    weights on the s8 x s8 -> s32 MXU path (2x the bf16 rate on
    v5e-class chips — the large-M prefill/encoder regime; at decode M
    the kernel is HBM-bound either way)."""
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    w4 = pltpu.bitcast(w_ref[:], jnp.int4).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot_general(
        x_ref[:],
        w4,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        o_ref[:] = (
            acc_ref[:]
            * sx_ref[:].astype(jnp.float32)
            * s_ref[:].astype(jnp.float32)
        ).astype(o_ref.dtype)


def _pad2(x, m_to, n_to):
    m, n = x.shape
    if m == m_to and n == n_to:
        return x
    return jnp.pad(x, ((0, m_to - m), (0, n_to - n)))


@functools.partial(jax.jit, static_argnames=("out_dtype", "tile_m", "tile_n", "tile_k"))
def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=jnp.float32,
    tile_m: int = 256,
    tile_n: int = 512,
    tile_k: int = 1024,
):
    """y[M,N] = (x[M,K] @ w_q[K,N]) * scale[1,N], fused dequant.

    Default tiles tuned on v5e at decode-style M (16): 512x1024 tiles
    reach ~590 GB/s of int8 weight traffic (~72% of HBM peak), 1.6x
    faster than XLA's fused dequant+dot at the same shapes."""
    m, k = x.shape
    k2, n = w_q.shape
    assert k == k2, (x.shape, w_q.shape)
    scale = scale.reshape(1, n)

    tm = min(tile_m, _round_up(m, 8))
    # prefer divisor tiles: aligned weights then need NO padding (a pad
    # of the weight inside a jitted step copies the whole matrix in HBM
    # every call)
    tn = _divisor_tile(n, tile_n, 8192)
    tk = _divisor_tile(k, tile_k, tile_k) if tn else 0
    if tn and tk and tk * tn > _W_TILE_BUDGET:
        tk = _divisor_tile(k, _W_TILE_BUDGET // tn, _W_TILE_BUDGET // tn) or tk
    if not tn or not tk:
        tn = min(tile_n, _round_up(n, 128))
        tk = min(tile_k, _round_up(k, 128))
    mp, np_, kp = _round_up(m, tm), _round_up(n, tn), _round_up(k, tk)

    xp = _pad2(x, mp, kp)
    wp = _pad2(w_q, kp, np_)
    sp = _pad2(scale, 1, np_)
    n_k = kp // tk

    out = pl.pallas_call(
        functools.partial(_matmul_kernel, n_k=n_k),
        grid=(mp // tm, np_ // tn, n_k),
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, wp, sp)
    return out[:m, :n]


def _int4_tiles(m, khalf, n, tile_m, tile_n, tile_k):
    """Shared tile selection for the int4 kernels: prefer divisor tiles
    (no in-jit weight pad copies) under the int4 VMEM budget."""
    tm = min(tile_m, _round_up(m, 8))
    tn = _divisor_tile(n, tile_n, 8192)
    tk2 = _divisor_tile(khalf, tile_k // 2, tile_k // 2) if tn else 0
    if tn and tk2 and tk2 * tn > _W_TILE_BUDGET_INT4:
        tk2 = _divisor_tile(
            khalf, _W_TILE_BUDGET_INT4 // tn, _W_TILE_BUDGET_INT4 // tn
        )  # 0 -> generic pad path below
    if not tn or not tk2:
        tn = min(tile_n, _round_up(n, 128))
        tk2 = min(tile_k // 2, _round_up(khalf, 128))
    return tm, tn, tk2


@functools.partial(jax.jit, static_argnames=("out_dtype", "tile_m", "tile_n", "tile_k"))
def int4_matmul(
    x: jnp.ndarray,
    w_packed: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=jnp.float32,
    tile_m: int = 256,
    tile_n: int = 1024,
    tile_k: int = 2048,
):
    """y = (x[M,K] @ unpack(w_packed[K//2,N])) * scale[1,N].

    ``w_packed`` uses the PAIRWISE int4 layout (ops.quant.pack_int4):
    byte row a holds w[2a] (low nibble) and w[2a+1] (high) — the order
    ``pltpu.bitcast`` produces, so the kernel unpacks with Mosaic's
    native int4 conversion. HBM sees a 4x smaller weight footprint than
    bf16 (2x vs the int8 carrier).
    """
    m, k = x.shape
    khalf, n = w_packed.shape
    assert k == khalf * 2, (x.shape, w_packed.shape)
    scale = scale.reshape(1, n)

    tm, tn, tk2 = _int4_tiles(m, khalf, n, tile_m, tile_n, tile_k)
    mp, np_ = _round_up(m, tm), _round_up(n, tn)
    kp2 = _round_up(khalf, tk2)

    xp = _pad2(x, mp, kp2 * 2)
    wp = _pad2(w_packed, kp2, np_)
    sp = _pad2(scale, 1, np_)
    n_k = kp2 // tk2

    out = pl.pallas_call(
        functools.partial(_int4_matmul_kernel, n_k=n_k),
        grid=(mp // tm, np_ // tn, n_k),
        in_specs=[
            pl.BlockSpec(
                (tm, tk2 * 2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tk2, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp2 * 2,
            bytes_accessed=mp * kp2 * 4 + kp2 * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, wp, sp)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("out_dtype", "tile_m", "tile_n", "tile_k"))
def int4_matmul_w4a8(
    x_q: jnp.ndarray,
    x_scale: jnp.ndarray,
    w_packed: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=jnp.float32,
    tile_m: int = 256,
    tile_n: int = 1024,
    tile_k: int = 2048,
):
    """W4A8: y = (x_q[M,K] @ unpack(w_packed[K//2,N])) * x_scale[M,1]
    * scale[1,N] with the s8 x s8 -> s32 MXU contraction. ``x_q`` comes
    from ops.quant.quantize_activations (per-row symmetric int8)."""
    m, k = x_q.shape
    khalf, n = w_packed.shape
    assert k == khalf * 2, (x_q.shape, w_packed.shape)
    scale = scale.reshape(1, n)
    x_scale = x_scale.reshape(m, 1)

    tm, tn, tk2 = _int4_tiles(m, khalf, n, tile_m, tile_n, tile_k)
    mp, np_ = _round_up(m, tm), _round_up(n, tn)
    kp2 = _round_up(khalf, tk2)

    xp = _pad2(x_q, mp, kp2 * 2)
    sxp = _pad2(x_scale, mp, 1)
    wp = _pad2(w_packed, kp2, np_)
    sp = _pad2(scale, 1, np_)
    n_k = kp2 // tk2

    out = pl.pallas_call(
        functools.partial(_int4_w4a8_kernel, n_k=n_k),
        grid=(mp // tm, np_ // tn, n_k),
        in_specs=[
            pl.BlockSpec(
                (tm, tk2 * 2), lambda i, j, kk: (i, kk), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((tm, 1), lambda i, j, kk: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk2, tn), lambda i, j, kk: (kk, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, kk: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tm, tn), lambda i, j, kk: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((mp, np_), out_dtype),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp2 * 2,
            bytes_accessed=mp * kp2 * 2 + kp2 * np_ + mp * np_ * 4,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(xp, sxp, wp, sp)
    return out[:m, :n]
