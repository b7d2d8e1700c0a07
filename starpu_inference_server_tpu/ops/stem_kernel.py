"""Fused ResNet stem: space-to-depth conv + BN + ReLU + 3x3/2 maxpool
in ONE Pallas kernel.

The stem is ~20% of ResNet-18 wall at the optimal batch but only ~6% of
its FLOPs: the dominant cost is the HBM round trip of the conv1
activation ([B,112,112,64] written by the conv, re-read by the pool) on
top of the MXU-hostile 3-channel 7x7. This kernel consumes the padded
space-to-depth input ([118,118,12] per image, VMEM-resident: 334 KB
bf16) and emits the POOLED [56,56,64] output directly — the
intermediate y never touches HBM.

Per image (grid (B,)): 4 row-groups of 14 pool rows; each group builds
an im2col patch block [29*112, 192] from 16 static shifted slices (K
depth 192 on the MXU vs the direct conv's 147-with-C=3), one dot with
the folded 4x4x12x64 kernel (models/resnet._stem_space_to_depth fold),
BN+ReLU applied to the f32 accumulator, then the 3x3/2 max pool via 9
strided slices. Pool padding exploits ReLU: post-ReLU values are >= 0,
so zero-padding is exact for max; conv rows outside the true image
(computed from the zero-padded margin) are zeroed before pooling.

Stem weights run in bf16 regardless of the serving quant mode — the
standard INT8 deployment recipe keeps the first conv at higher
precision (3-channel input, per-tensor activation scales are at their
worst there), and its FLOP share is negligible.

No reference counterpart (CUDA/torch serves TorchScript as-is;
SURVEY.md section 2.7) — TPU-first fusion for the BASELINE headline.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _stem_kernel(zt_ref, w_ref, scale_ref, shift_ref, o_ref):
    """zt [1,118,112,48] bf16 (column taps pre-expanded: channel block
    (t,(a,b,c))); w [4,48,64] bf16 (row tap s major); scale/shift
    [1,64] f32; o [1,56,56,64] bf16. Lane-misaligned in-kernel concats
    do not lower in Mosaic, so the K dim is split into 4 row-tap dots
    of K=48 instead of one K=192 im2col dot."""
    zt = zt_ref[0]                                    # [118, 112, 48]
    scale = scale_ref[0]
    shift = shift_ref[0]
    for gi in range(4):
        p0 = 28 * gi - 1                              # first y row
        y = None
        for s in range(4):
            r0 = p0 + s + 1                           # zt row offset
            tap = jax.lax.slice(
                zt, (r0, 0, 0), (r0 + 29, 112, 48)
            ).reshape(29 * 112, 48)
            part = jax.lax.dot_general(
                tap, w_ref[s],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )                                          # [3248, 64] f32
            y = part if y is None else y + part
        y = jnp.maximum(y * scale[None, :] + shift[None, :], 0.0)
        y = y.reshape(29, 112, 64)
        if gi == 0:
            # y row -1 was computed from the zero-padded margin; the
            # true pool pads there — zero it (exact under >=0 max).
            # Mask multiply, not .at[].set: scatter does not lower in
            # Mosaic.
            rows = jax.lax.broadcasted_iota(jnp.int32, y.shape, 0)
            y = jnp.where(rows == 0, 0.0, y)
        # col pool pad (1 left, 1 right) + one bottom row pad, zero =
        # identity under the >=0 max; stride-2 windows are extracted by
        # pairing reshapes (Mosaic does not lower strided slices)
        y = jnp.pad(y, ((0, 1), (1, 1), (0, 0)))       # [30, 114, 64]
        pairs = y[0:28].reshape(14, 2, 114, 64)
        rmax = jnp.maximum(pairs[:, 0], pairs[:, 1])   # rows 2r, 2r+1
        rmax = jnp.maximum(
            rmax, y[2:30].reshape(14, 2, 114, 64)[:, 0]  # row 2r+2
        )                                              # [14, 114, 64]
        cpairs = rmax[:, 0:112].reshape(14, 56, 2, 64)
        pooled = jnp.maximum(cpairs[:, :, 0], cpairs[:, :, 1])
        pooled = jnp.maximum(
            pooled, rmax[:, 2:114].reshape(14, 56, 2, 64)[:, :, 0]
        )                                              # [14, 56, 64]
        o_ref[0, 14 * gi:14 * gi + 14] = pooled.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype",))
def fused_stem(zp, w, scale, shift, out_dtype=jnp.bfloat16):
    """zp [B,118,118,12] (padded s2d input), w [192,64] folded stem
    kernel ((s,t,a,b,c) major-to-minor), scale/shift [64] BN affine.
    Returns pooled [B,56,56,64]."""
    b = zp.shape[0]
    assert zp.shape[1:] == (118, 118, 12), zp.shape
    # pre-expand the 4 column taps (XLA: one fused gather/concat); the
    # kernel then only needs row-shifted static slices
    zt = jnp.concatenate(
        [zp[:, :, t + 1:t + 113, :] for t in range(4)], axis=-1
    )                                                 # [B,118,112,48]
    ws = w.reshape(4, 48, 64)                         # s-major row taps
    return pl.pallas_call(
        _stem_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, 118, 112, 48), lambda bi: (bi, 0, 0, 0)),
                pl.BlockSpec((4, 48, 64), lambda bi: (0, 0, 0)),
                pl.BlockSpec((1, 64), lambda bi: (0, 0)),
                pl.BlockSpec((1, 64), lambda bi: (0, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 56, 56, 64), lambda bi: (bi, 0, 0, 0)
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, 56, 56, 64), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * 112 * 112 * 192 * 64,
            bytes_accessed=b * (118 * 112 * 48 + 56 * 56 * 64) * 2,
            transcendentals=0,
        ),
        interpret=_INTERPRET,
    )(
        zt.astype(jnp.bfloat16), ws.astype(jnp.bfloat16),
        scale.astype(jnp.float32).reshape(1, 64),
        shift.astype(jnp.float32).reshape(1, 64),
    )
