"""Functional NN layers, quantization-aware, TPU-shaped.

Design rules (see /opt/skills/guides/pallas_guide.md):
- matmuls/convs always pass ``preferred_element_type=float32`` so the MXU
  accumulates in f32 regardless of bf16/int8 operands;
- image tensors are NHWC internally (TPU-native conv layout); the wire
  protocol keeps the reference's NCHW sample dims and the model adapters
  transpose once at the edge;
- weights may be dense arrays or quantized dicts produced by
  ``ops.quant.maybe_quantize_tree``; every consumer handles both, so a
  model definition is written once and served at FP32/BF16/INT8/INT4.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .quant import (
    dequantize,
    is_packed_int4_leaf,
    is_quantized_leaf,
    unpack_int4,
)

# Toggled by the engine when running on real TPU; tests exercise both.
_USE_PALLAS = False

# W8A8 compute: dense layers with INT8 weights also quantize their
# activations per-token and run the s8 x s8 -> s32 MXU path (2x the
# bf16 rate on v5e-class chips). Toggled by the engine from the model's
# quantization mode (QuantMode.W8A8); like the reference's process-wide
# LibTorch settings (server_main_bootstrap.hpp:106-150), this is one
# model per process.
_W8A8 = False


def set_use_pallas(enabled: bool) -> None:
    global _USE_PALLAS
    _USE_PALLAS = bool(enabled)


def use_pallas() -> bool:
    return _USE_PALLAS


def set_w8a8(enabled: bool) -> None:
    global _W8A8
    _W8A8 = bool(enabled)


def w8a8() -> bool:
    return _W8A8


def resolve_weight(w, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Materialize a (possibly quantized/packed) weight at compute dtype."""
    if is_packed_int4_leaf(w):
        return dequantize(unpack_int4(w["w_p4"]), w["scale"], dtype=dtype)
    if is_quantized_leaf(w):
        return dequantize(w["w_q"], w["scale"], dtype=dtype)
    return w.astype(dtype)


def dense(p, x: jnp.ndarray, dtype=jnp.bfloat16,
          act_quant: bool = True) -> jnp.ndarray:
    """y = x @ w + b. ``p`` = {'w': [in,out] (dense or quantized), 'b'?}.

    On TPU with a quantized weight the fused dequant-matmul Pallas kernel
    is used for 2D activations; otherwise XLA gets a dequant+dot it can
    fuse itself.

    ``act_quant=False`` opts this call out of W8A8 dynamic activation
    quantization even when the mode is on (the weight still dequantizes
    int8/int4): measured on one v5e, per-token quant+dequant fused
    around the head-split/merge TRANSPOSES of attention projections
    collapses throughput at large batch (bert-base w8a8 B=128 read
    3,050 seq/s vs 6,267 bf16; the regression lives entirely in the
    q/k/v/o denses — 12.1 vs 6.2 us/seq/layer — while FFN w8a8 is
    FASTER than bf16). Attention projections therefore run weight-only;
    FFN keeps the s8 x s8 path.
    """
    w = p["w"]
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    # Pallas fused dequant-matmul pays off in the memory-bound regime
    # (few rows, big weights — decode steps); at large M XLA's fused
    # dequant+dot is already at the MXU roofline.
    use_w8a8 = _W8A8 and act_quant
    if is_packed_int4_leaf(w) and _USE_PALLAS and use_w8a8:
        # W4A8: per-token int8 activations x packed-int4 weights on the
        # s8 x s8 MXU path (QuantMode.W4A8 — BASELINE config 5 at
        # encoder/prefill M, where the MXU rate doubles; at decode M the
        # kernel is weight-bandwidth-bound either way)
        from .pallas_kernels import int4_matmul_w4a8
        from .quant import quantize_activations

        x2 = x.reshape(rows, x.shape[-1])
        x_q, sx = quantize_activations(x2)
        y = int4_matmul_w4a8(x_q, sx, w["w_p4"], w["scale"])
        y = y.reshape(*x.shape[:-1], -1)
    elif is_packed_int4_leaf(w) and _USE_PALLAS:
        from .pallas_kernels import int4_matmul

        x2 = x.reshape(rows, x.shape[-1])
        y = int4_matmul(x2.astype(dtype), w["w_p4"], w["scale"])
        y = y.reshape(*x.shape[:-1], -1)
    elif is_packed_int4_leaf(w) and use_w8a8:
        # W4A8 without Pallas (CPU tests / mesh programs): unpack to the
        # int8 carrier and run the same s8 x s8 contraction in XLA
        from .quant import quantize_activations

        x2 = x.reshape(rows, x.shape[-1])
        x_q, sx = quantize_activations(x2)
        y = jax.lax.dot_general(
            x_q,
            unpack_int4(w["w_p4"]),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * sx * w["scale"].reshape(1, -1)
        y = y.reshape(*x.shape[:-1], -1)
    elif is_quantized_leaf(w) and _USE_PALLAS and rows <= 64:
        # int8 carrier; also correct for unpacked int4 values in [-7,7]
        # ("bits" may be a device scalar under jit — never branch on it)
        from .pallas_kernels import int8_matmul

        x2 = x.reshape(rows, x.shape[-1])
        y = int8_matmul(x2.astype(dtype), w["w_q"], w["scale"])
        y = y.reshape(*x.shape[:-1], -1)
    elif is_quantized_leaf(w) and use_w8a8:
        # W8A8: per-token dynamic activation quant feeds the s8 x s8 ->
        # s32 MXU; the int32 result rescales by (row scale x channel
        # scale). Also correct for int4-valued carriers in [-7,7].
        from .quant import quantize_activations

        x2 = x.reshape(rows, x.shape[-1])
        x_q, sx = quantize_activations(x2)
        y = jax.lax.dot_general(
            x_q,
            w["w_q"],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * sx * w["scale"].reshape(1, -1)
        y = y.reshape(*x.shape[:-1], -1)
    else:
        wm = resolve_weight(w, dtype)
        y = jax.lax.dot_general(
            x.astype(dtype),
            wm,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def conv2d(
    p,
    x: jnp.ndarray,
    stride: int = 1,
    padding="SAME",
    groups: int = 1,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """NHWC conv. ``p`` = {'w': [kh,kw,in/groups,out], 'b'?}.

    Under W8A8 with an INT8 weight, activations quantize dynamically
    with ONE per-tensor scale (per-position scales cannot factor out of
    the spatial window sum, unlike dense's per-row scales) and the conv
    runs s8 x s8 -> s32 on the int8 MXU path; the result rescales by
    (tensor scale x per-output-channel weight scale). The classic
    ResNet INT8 recipe (per-tensor activations, per-channel weights).
    """
    if isinstance(padding, int):
        padding = [(padding, padding), (padding, padding)]
    wnode = p["w"]
    if is_quantized_leaf(wnode) and _W8A8:
        xf = x.astype(jnp.float32)
        absmax = jnp.max(jnp.abs(xf))
        sx = jnp.where(absmax > 0, absmax / 127.0, 1.0)
        x_q = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q,
            wnode["w_q"],
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
        # weight scale is per output channel [1,1,1,O] -> broadcasts
        y = y.astype(jnp.float32) * sx * wnode["scale"].reshape(1, 1, 1, -1)
    else:
        w = resolve_weight(wnode, dtype)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            w,
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.float32,
        )
    if "b" in p and p["b"] is not None:
        y = y + p["b"].astype(jnp.float32)
    return y.astype(dtype)


def batch_norm_inference(p, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """Inference-mode batchnorm over the channel (last) axis.

    gamma/beta/mean/var are constants under jit, so XLA folds
    ``gamma*rsqrt(var+eps)`` and fuses the affine into the preceding conv.
    """
    scale = p["gamma"].astype(jnp.float32) * jax.lax.rsqrt(
        p["var"].astype(jnp.float32) + eps
    )
    shift = p["beta"].astype(jnp.float32) - p["mean"].astype(jnp.float32) * scale
    return (x.astype(jnp.float32) * scale + shift).astype(x.dtype)


def layer_norm(p, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    normed = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (normed * p["gamma"].astype(jnp.float32) + p["beta"].astype(jnp.float32)).astype(
        x.dtype
    )


def gelu(x: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.gelu(x, approximate=True)


def embedding(p, ids: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """Token embedding lookup. ``p`` = {'w': [vocab, dim]} (kept dense —
    gathers don't benefit from weight-only quant on the MXU)."""
    w = resolve_weight(p["w"], dtype)
    return jnp.take(w, ids, axis=0)


def _attention(q, k, v, mask, num_heads: int, dtype) -> jnp.ndarray:
    b, s, d = q.shape
    head_dim = d // num_heads

    # fused flash path for encoder layers, gated to LONG sequences: the
    # XLA fallback materializes [B, H, S, S] scores — at s>=512 the
    # isolated kernel measures 1.35x (s=512) to 2.0x (s=2048) ahead; at
    # s=128 the scores fit VMEM and XLA's fusion wins end-to-end
    # (full-model measurement in the bidirectional_attention docstring)
    if (
        _USE_PALLAS
        and head_dim % 64 == 0
        and s % 128 == 0
        and s >= 512
        and (mask is None or mask.ndim == 2)
    ):
        from . import prefill_attention as _pa

        qh = q.reshape(b, s, num_heads, head_dim)
        kh = k.reshape(b, s, num_heads, head_dim)
        vh = v.reshape(b, s, num_heads, head_dim)
        key_bias = (
            jnp.zeros((b, s), jnp.float32)
            if mask is None
            else jnp.where(mask.astype(bool), 0.0, -1e9).astype(jnp.float32)
        )
        out = _pa.bidirectional_attention(
            qh.astype(dtype), kh.astype(dtype), vh.astype(dtype), key_bias,
            rep=1, out_dtype=dtype,
        )
        return out.reshape(b, s, d)

    def split(t):
        return t.reshape(b, s, num_heads, head_dim).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    if mask is not None and mask.ndim == 2:
        # mask: [b, s] (1 = attend) or [b, 1, q, k]
        mask = mask[:, None, None, :]

    def core(qh, kh, vh, mask4):
        logits = jnp.einsum(
            "bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(head_dim))
        if mask4 is not None:
            logits = jnp.where(
                mask4.astype(bool), logits, jnp.float32(-1e9)
            )
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        return jnp.einsum(
            "bhqk,bhkd->bhqd", probs, vh,
            preferred_element_type=jnp.float32,
        )

    # Fusion-threshold batch chunking: past ~64*12*128*128 score
    # elements XLA stops keeping the [B,H,S,S] scores/probs on-chip and
    # their HBM round trip goes superlinear (measured on one v5e at
    # s=128: B=64 sdpa 0.055 ms, B=128 0.368 ms whole vs 0.159 ms as a
    # scan over two 64-row chunks — 2.3x). Chunking the batch keeps
    # every chunk inside the fused regime; a lax.scan emits ONE compiled
    # chunk body regardless of chunk count.
    score_elems = b * num_heads * s * s
    limit = 64 * 12 * 128 * 128
    if score_elems > limit:
        max_chunk = max(1, limit // (num_heads * s * s))
        chunk = 1
        for c in range(1, b + 1):
            if b % c == 0 and c <= max_chunk:
                chunk = c
        if chunk < b:
            nb = b // chunk

            def resh(t):
                return t.reshape((nb, chunk) + t.shape[1:])

            def body(_, args):
                qc, kc, vc, mc = args
                return None, core(qc, kc, vc, mc)

            mask_c = (
                resh(mask) if mask is not None
                else jnp.zeros((nb, chunk, 1, 1, 1), jnp.int32) + 1
            )
            _, out = jax.lax.scan(
                body, None, (resh(qh), resh(kh), resh(vh), mask_c)
            )
            out = out.reshape((b,) + out.shape[2:])
        else:
            out = core(qh, kh, vh, mask)
    else:
        out = core(qh, kh, vh, mask)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d).astype(dtype)


def multi_head_attention(
    p,
    x: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    num_heads: int,
    dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """Standard post-LN transformer MHA block body (projections +
    scaled-dot-product attention + output projection).

    ``p`` = {'q','k','v','o'} each a dense-layer param dict.

    Projections run with ``act_quant=False``: under W8A8 the per-token
    quant/dequant fused around the head-split/merge transposes measured
    2x slower at B=128 than weight-only dequant (see ``dense``); the
    FFN — where the mode actually pays — keeps full W8A8.
    """
    q = dense(p["q"], x, dtype, act_quant=False)
    k = dense(p["k"], x, dtype, act_quant=False)
    v = dense(p["v"], x, dtype, act_quant=False)
    out = _attention(q, k, v, mask, num_heads, dtype)
    return dense(p["o"], out, dtype, act_quant=False)


def max_pool(x: jnp.ndarray, window: int, stride: int, padding="SAME") -> jnp.ndarray:
    if isinstance(padding, (list, tuple)):
        # spatial pads -> full NHWC pads
        padding = ((0, 0), tuple(padding[0]), tuple(padding[1]), (0, 0))
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        padding,
    )


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """[B,H,W,C] -> [B,C]."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)
