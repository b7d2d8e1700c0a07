"""Fused INT8-KV decode attention (Pallas, flash-style).

The jnp decode path dequantizes the whole KV cache and materializes
``jnp.repeat``-ed K/V for GQA every step — rep× extra HBM traffic on the
step's dominant cost (reading the cache). This kernel:

- reads the int8 cache chunk-by-chunk into VMEM and dequantizes there;
- never materializes GQA repeats: q is viewed as [H_kv, rep, D] and each
  KV head's chunk serves its ``rep`` query heads via batched dots;
- uses the online-softmax (flash) recurrence over T chunks, f32
  accumulators in VMEM scratch;
- masks positions > length per slot (lengths are scalar-prefetched so
  the mask indices are ready before the body runs).

Per (slot, chunk) grid step, HBM traffic is exactly the int8 K/V chunk +
scales — the memory-bound optimum for decode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False


def set_interpret(value: bool) -> None:
    global _INTERPRET
    _INTERPRET = bool(value)


def _kernel(
    len_ref,      # scalar-prefetch: int32 [S]
    q_ref,        # [1, Hq, D]
    k_ref,        # int8 [1, C, Hkv, D]
    v_ref,        # int8 [1, C, Hkv, D]
    ks_ref,       # f32 [1, C, Hkv]
    vs_ref,       # f32 [1, C, Hkv]
    o_ref,        # [1, Hq, D]
    m_scr,        # f32 [Hkv, rep]
    l_scr,        # f32 [Hkv, rep]
    acc_scr,      # f32 [Hkv, rep, D]
    *,
    chunk: int,
    n_chunks: int,
    rep: int,
):
    s = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # chunks entirely past the slot's length are skipped: their fetch
    # index clamps to the last live chunk (no DMA re-issue) and the
    # compute is predicated off — decode cost tracks the ACTUAL sequence
    # length, not max_len
    @pl.when(c * chunk <= len_ref[s])
    def _():
        hq, d = q_ref.shape[1], q_ref.shape[2]
        hkv = hq // rep
        q = q_ref[0].reshape(hkv, rep, d).astype(jnp.float32)

        k = k_ref[0].astype(jnp.float32) * ks_ref[0][..., None]  # [C, Hkv, D]
        v = v_ref[0].astype(jnp.float32) * vs_ref[0][..., None]

        # logits[kv, rep, t] = q[kv, rep, :] . k[t, kv, :]
        kt = jnp.transpose(k, (1, 0, 2))  # [Hkv, C, D]
        logits = jax.lax.dot_general(
            q, kt,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(d)                                         # [Hkv, rep, C]

        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, chunk), 2
        )
        valid = pos <= len_ref[s]
        logits = jnp.where(valid, logits, -1e30)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[..., None])                   # [Hkv, rep, C]
        l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1)
        m_scr[:] = m_new

        vt = jnp.transpose(v, (1, 0, 2))  # [Hkv, C, D]
        pv = jax.lax.dot_general(
            p, vt,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                        # [Hkv, rep, D]
        acc_scr[:] = acc_scr[:] * alpha[..., None] + pv

    @pl.when(c == n_chunks - 1)
    def _():
        hq, d = q_ref.shape[1], q_ref.shape[2]
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[0] = out.reshape(hq, d).astype(o_ref.dtype)


def _grouped_kernel(
    len_ref,      # scalar-prefetch: int32 [S]
    q_ref,        # [G, Hq, D]
    k_ref,        # int8 [G, C, Hkv, D]
    v_ref,        # int8 [G, C, Hkv, D]
    ks_ref,       # f32 [G, C, Hkv]
    vs_ref,       # f32 [G, C, Hkv]
    o_ref,        # [G, Hq, D]
    m_scr,        # f32 [G, Hkv, rep]
    l_scr,        # f32 [G, Hkv, rep]
    acc_scr,      # f32 [G, Hkv, rep, D]
    *,
    chunk: int,
    n_chunks: int,
    rep: int,
    group: int,
    layered: bool = False,
):
    """Slot-GROUPED decode attention body: one grid step advances
    ``group`` slots through one KV chunk. The per-slot grid
    (``_kernel``) pays ~1.4 us of sequencer/DMA-issue overhead per
    (slot, chunk) step — at 64 slots x 8 chunks x 16 layers that is
    ~11 ms/decode-step of pure grid overhead, 6x the weight-read
    roofline (measured round 4; the matmul spine alone runs 1.7
    ms/step). Grouping cuts grid steps by ``group``x while keeping the
    same chunked online-softmax recurrence and per-slot length masks."""
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    # Mosaic allows only SCALAR loads from SMEM: read the group's
    # lengths as ``group`` scalars (static unroll)
    lens = [len_ref[i * group + g] for g in range(group)]
    max_len = functools.reduce(jnp.maximum, lens)

    # the whole group skips chunks past its LONGEST slot; per-slot
    # masking below keeps shorter slots exact
    @pl.when(c * chunk <= max_len)
    def _():
        hq, d = q_ref.shape[1], q_ref.shape[2]
        hkv = hq // rep
        # Mosaic matmuls take at most ONE batch dim: merge (G, Hkv)
        q = q_ref[:].reshape(group * hkv, rep, d).astype(jnp.float32)

        k_raw = k_ref[0] if layered else k_ref[:]
        v_raw = v_ref[0] if layered else v_ref[:]
        ks_raw = ks_ref[0] if layered else ks_ref[:]
        vs_raw = vs_ref[0] if layered else vs_ref[:]
        k = k_raw.astype(jnp.float32) * ks_raw[..., None]        # [G,C,Hkv,D]
        v = v_raw.astype(jnp.float32) * vs_raw[..., None]
        kt = jnp.transpose(k, (0, 2, 1, 3)).reshape(
            group * hkv, chunk, d
        )
        vt = jnp.transpose(v, (0, 2, 1, 3)).reshape(
            group * hkv, chunk, d
        )

        # logits[(g kv), rep, t] = q[(g kv), rep, :] . k[(g kv), t, :]
        logits = jax.lax.dot_general(
            q, kt,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(d)                                      # [G*Hkv,rep,C]

        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (group * hkv, 1, chunk), 2
        )
        # per-slot length along the merged (g, kv) rows via a static
        # select chain (gather/repeat reshapes don't lower in Mosaic)
        row_g = jax.lax.broadcasted_iota(
            jnp.int32, (group * hkv, 1, chunk), 0
        ) // hkv
        lens_row = jnp.full((group * hkv, 1, chunk), lens[0], jnp.int32)
        for g in range(1, group):
            lens_row = jnp.where(row_g == g, lens[g], lens_row)
        logits = jnp.where(pos <= lens_row, logits, -1e30)

        m_prev = m_scr[:]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits - m_new[..., None])                # [G*Hkv,rep,C]
        l_scr[:] = alpha * l_scr[:] + jnp.sum(p, axis=-1)
        m_scr[:] = m_new

        pv = jax.lax.dot_general(
            p, vt,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                     # [G*Hkv,rep,D]
        acc_scr[:] = acc_scr[:] * alpha[..., None] + pv

    @pl.when(c == n_chunks - 1)
    def _():
        hq, d = q_ref.shape[1], q_ref.shape[2]
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[:] = out.reshape(group, hq, d).astype(o_ref.dtype)


def _pick_group(s: int, limit: int = 8) -> int:
    """Largest divisor of ``s`` that is <= limit."""
    g = 1
    for c in range(1, min(s, limit) + 1):
        if s % c == 0:
            g = c
    return g


@functools.partial(jax.jit,
                   static_argnames=("rep", "chunk", "out_dtype", "layer"))
def decode_attention(
    q: jnp.ndarray,        # [S, Hq, D] (bf16/f32)
    k_cache: jnp.ndarray,  # int8 [S, T, Hkv, D] — or [L, S, T, Hkv, D]
    v_cache: jnp.ndarray,  # int8 (same)
    k_scale: jnp.ndarray,  # f32 [S, T, Hkv] — or [L, S, T, Hkv]
    v_scale: jnp.ndarray,  # f32 (same)
    lengths: jnp.ndarray,  # int32 [S] — attend to positions <= lengths[s]
    rep: int,
    chunk: int = 128,
    out_dtype=None,
    layer: int = -1,
):
    """``layer >= 0``: the caller passes the WHOLE layered cache
    [L, S, T, Hkv, D] and the BlockSpec indexes the layer — feeding a
    python-level ``cache.k[li]`` slice instead materializes a ~34 MB
    contiguous temp per k/v/scale per layer (measured ~0.5 ms/layer on
    one v5e, 3x the kernel's own runtime at short contexts).

    A 3-D ``k_cache`` selects the FLAT layout ([S, T, Hkv*D] int8 +
    [S, Hkv, T] f32 scales — see the flat-layout section comment)."""
    if k_cache.ndim == 3 and layer < 0:
        return _flat_decode_attention(
            q, k_cache, v_cache, k_scale, v_scale, lengths,
            rep=rep, chunk=chunk, out_dtype=out_dtype,
        )
    if layer >= 0:
        assert k_cache.ndim == 5, k_cache.shape
    s, hq, d = q.shape
    t = k_cache.shape[-3]
    hkv = k_cache.shape[-2]
    assert hq == hkv * rep, (q.shape, k_cache.shape, rep)
    out_dtype = out_dtype or q.dtype
    chunk = min(chunk, t)
    assert t % chunk == 0, (t, chunk)
    n_chunks = t // chunk

    group = _pick_group(s)
    if group > 1:
        def g_idx(i, c, lens):
            m = lens[i * group]
            for g in range(1, group):
                m = jnp.maximum(m, lens[i * group + g])
            return jnp.minimum(c, m // chunk)

        if layer >= 0:
            # layered cache: a leading size-1 block dim pinned at
            # ``layer`` — the DMA reads straight out of the big array
            kv_spec = pl.BlockSpec(
                (1, group, chunk, hkv, d),
                lambda i, c, lens: (layer, i, g_idx(i, c, lens), 0, 0),
            )
            sc_spec = pl.BlockSpec(
                (1, group, chunk, hkv),
                lambda i, c, lens: (layer, i, g_idx(i, c, lens), 0),
            )
        else:
            kv_spec = pl.BlockSpec(
                (group, chunk, hkv, d),
                lambda i, c, lens: (i, g_idx(i, c, lens), 0, 0),
            )
            sc_spec = pl.BlockSpec(
                (group, chunk, hkv),
                lambda i, c, lens: (i, g_idx(i, c, lens), 0),
            )

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(s // group, n_chunks),
            in_specs=[
                pl.BlockSpec((group, hq, d), lambda i, c, *_: (i, 0, 0)),
                kv_spec, kv_spec, sc_spec, sc_spec,
            ],
            out_specs=pl.BlockSpec((group, hq, d), lambda i, c, *_: (i, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((group * hkv, rep), jnp.float32),
                pltpu.VMEM((group * hkv, rep), jnp.float32),
                pltpu.VMEM((group * hkv, rep, d), jnp.float32),
            ],
        )
        return pl.pallas_call(
            functools.partial(
                _grouped_kernel, chunk=chunk, n_chunks=n_chunks, rep=rep,
                group=group, layered=layer >= 0,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((s, hq, d), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * s * hq * t * d,
                bytes_accessed=2 * s * t * hkv * d + s * hq * d * 4,
                transcendentals=s * hq * t,
            ),
            interpret=_INTERPRET,
        )(lengths.astype(jnp.int32), q, k_cache, v_cache, k_scale, v_scale)
    if layer >= 0:
        # ungrouped layered path: fall back to the sliced call (only hit
        # when S has no divisor > 1, i.e. S == 1 serving)
        return decode_attention(
            q, k_cache[layer], v_cache[layer], k_scale[layer],
            v_scale[layer], lengths, rep=rep, chunk=chunk,
            out_dtype=out_dtype,
        )

    def kv_idx(i, c, lens):
        # clamp to the slot's last live chunk: the index stops changing
        # past it, so the pipeline stops fetching dead cache rows
        return jnp.minimum(c, lens[i] // chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, c, *_: (i, 0, 0)),
            pl.BlockSpec(
                (1, chunk, hkv, d), lambda i, c, lens: (i, kv_idx(i, c, lens), 0, 0)
            ),
            pl.BlockSpec(
                (1, chunk, hkv, d), lambda i, c, lens: (i, kv_idx(i, c, lens), 0, 0)
            ),
            pl.BlockSpec(
                (1, chunk, hkv), lambda i, c, lens: (i, kv_idx(i, c, lens), 0)
            ),
            pl.BlockSpec(
                (1, chunk, hkv), lambda i, c, lens: (i, kv_idx(i, c, lens), 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, c, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, rep), jnp.float32),
            pltpu.VMEM((hkv, rep), jnp.float32),
            pltpu.VMEM((hkv, rep, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, chunk=chunk, n_chunks=n_chunks, rep=rep),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * t * d,
            bytes_accessed=2 * s * t * hkv * d + s * hq * d * 4,
            transcendentals=s * hq * t,
        ),
        interpret=_INTERPRET,
    )(lengths.astype(jnp.int32), q, k_cache, v_cache, k_scale, v_scale)


# ---------------------------------------------------------------------------
# FLAT cache layout: K/V stored [.., T, Hkv*D] int8, scales [.., Hkv, T]
# f32 — every minor dim is lane-aligned (Hkv*D and T are multiples of
# 128), so XLA's compact parameter layout IS the standard layout and
# standalone decode-block programs stop paying the whole-cache
# entry/exit layout conversion (the round-5 dispatch bubble: s8[..,H,64]
# pads D=64 to 128 lanes in the standard layout, so XLA stores the
# params compact and converts ~4.6 GB per block at dense-128;
# scripts/layout_pin_probe.py). Unlike ``pin_cache_layouts`` this needs
# no cooperation from the backend's layout plumbing.
#
# Same online-softmax recurrence as the standard-layout kernels; scales
# are applied to the LOGITS (k_f32 = k_int8 * ks is uniform per
# (position, head), so q . k_f32 == (q . k_int8) * ks and likewise
# (p * vs) . v_int8 == p . v_f32) — this skips the dequant broadcast
# over D and keeps the scale blocks transpose-free.
# ---------------------------------------------------------------------------


def _flat_kernel(
    len_ref,      # scalar-prefetch: int32 [S]
    q_ref,        # [G, Hq, D]
    k_ref,        # int8 [G, C, Hkv*D]
    v_ref,        # int8 [G, C, Hkv*D]
    ks_ref,       # f32 [G, Hkv, C]
    vs_ref,       # f32 [G, Hkv, C]
    o_ref,        # [G, Hq, D]
    m_scr,        # f32 [G*Hkv, rep]
    l_scr,        # f32 [G*Hkv, rep]
    acc_scr,      # f32 [G*Hkv, rep, D]
    *,
    chunk: int,
    n_chunks: int,
    rep: int,
    group: int,
):
    """Slot-grouped decode attention over the FLAT cache layout
    (``group`` may be 1 — this body replaces both grid shapes).

    The flat block keeps the packed [C, Hkv*D] lane layout END TO END:
    per-KV-head STATIC lane slices feed the dots (Mosaic does not lower
    a lane-split reshape like [C, 512] -> [C, 8, 64]), so the big block
    is never reshaped or transposed — only sliced. Scratch carries a
    leading ``hkv`` dim indexed statically per head."""
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    lens = [len_ref[i * group + g] for g in range(group)]
    max_len = functools.reduce(jnp.maximum, lens)

    @pl.when(c * chunk <= max_len)
    def _():
        hq, d = q_ref.shape[1], q_ref.shape[2]
        hkv = hq // rep
        inv = 1.0 / math.sqrt(d)

        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (group, 1, chunk), 2
        )
        row_g = jax.lax.broadcasted_iota(
            jnp.int32, (group, 1, chunk), 0
        )
        lens_row = jnp.full((group, 1, chunk), lens[0], jnp.int32)
        for g in range(1, group):
            lens_row = jnp.where(row_g == g, lens[g], lens_row)
        dead = pos > lens_row                                 # [G, 1, C]

        for h in range(hkv):
            q_h = q_ref[:, h * rep:(h + 1) * rep, :].astype(jnp.float32)
            k_h = k_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
            v_h = v_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
            ks_h = ks_ref[:, h, :][:, None, :]                # [G, 1, C]
            vs_h = vs_ref[:, h, :][:, None, :]

            logits = jax.lax.dot_general(
                q_h, k_h,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (ks_h * inv)                                  # [G, rep, C]
            logits = jnp.where(dead, -1e30, logits)

            m_prev = m_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new[..., None])            # [G, rep, C]
            l_scr[h] = alpha * l_scr[h] + jnp.sum(p, axis=-1)
            m_scr[h] = m_new

            pv = jax.lax.dot_general(
                p * vs_h, v_h,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )                                                 # [G, rep, D]
            acc_scr[h] = acc_scr[h] * alpha[..., None] + pv

    @pl.when(c == n_chunks - 1)
    def _():
        hq, d = q_ref.shape[1], q_ref.shape[2]
        hkv = hq // rep
        for h in range(hkv):
            out = acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)[..., None]
            o_ref[:, h * rep:(h + 1) * rep, :] = out.astype(o_ref.dtype)


def _flat_window_kernel(
    len_ref,      # scalar-prefetch: int32 [S]
    q_ref,        # [G, Hkv, R, D]   (R = W*rep)
    k_ref,        # int8 [G, C, Hkv*D]
    v_ref,        # int8 [G, C, Hkv*D]
    ks_ref,       # f32 [G, Hkv, C]
    vs_ref,       # f32 [G, Hkv, C]
    o_ref,        # [G, Hkv, R, D]
    m_scr,        # f32 [G*Hkv, R]
    l_scr,        # f32 [G*Hkv, R]
    acc_scr,      # f32 [G*Hkv, R, D]
    *,
    chunk: int,
    n_chunks: int,
    rep: int,
    group: int,
):
    """Slot-grouped window (verify) attention over the FLAT layout
    (per-KV-head static lane slices, like :func:`_flat_kernel`)."""
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    lens = [len_ref[i * group + g] for g in range(group)]
    max_len = functools.reduce(jnp.maximum, lens)
    hkv, r, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    w = r // rep

    @pl.when(c * chunk <= max_len + w - 1)
    def _():
        inv = 1.0 / math.sqrt(d)
        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (group, r, chunk), 2
        )
        w_of_row = jax.lax.broadcasted_iota(
            jnp.int32, (group, r, chunk), 1
        ) // rep
        row_g = jax.lax.broadcasted_iota(
            jnp.int32, (group, r, chunk), 0
        )
        lens_row = jnp.full((group, r, chunk), lens[0], jnp.int32)
        for g in range(1, group):
            lens_row = jnp.where(row_g == g, lens[g], lens_row)
        dead = pos > lens_row + w_of_row                      # [G, R, C]

        for h in range(hkv):
            q_h = q_ref[:, h, :, :].astype(jnp.float32)       # [G, R, D]
            k_h = k_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
            v_h = v_ref[:, :, h * d:(h + 1) * d].astype(jnp.float32)
            ks_h = ks_ref[:, h, :][:, None, :]                # [G, 1, C]
            vs_h = vs_ref[:, h, :][:, None, :]

            logits = jax.lax.dot_general(
                q_h, k_h,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ) * (ks_h * inv)                                  # [G, R, C]
            logits = jnp.where(dead, -1e30, logits)

            m_prev = m_scr[h]
            m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
            alpha = jnp.exp(m_prev - m_new)
            p = jnp.exp(logits - m_new[..., None])
            l_scr[h] = alpha * l_scr[h] + jnp.sum(p, axis=-1)
            m_scr[h] = m_new
            pv = jax.lax.dot_general(
                p * vs_h, v_h,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            acc_scr[h] = acc_scr[h] * alpha[..., None] + pv

    @pl.when(c == n_chunks - 1)
    def _():
        for h in range(hkv):
            out = acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)[..., None]
            o_ref[:, h, :, :] = out.astype(o_ref.dtype)


def _flat_decode_attention(
    q, k_cache, v_cache, k_scale, v_scale, lengths, rep, chunk, out_dtype
):
    """FLAT-layout dense decode attention: cache [S, T, Hkv*D] int8 +
    scales [S, Hkv, T] f32 (see the section comment above)."""
    s, hq, d = q.shape
    t = k_cache.shape[1]
    hkv = hq // rep
    assert k_cache.shape[-1] == hkv * d, (q.shape, k_cache.shape, rep)
    assert k_scale.shape == (s, hkv, t), (k_scale.shape, (s, hkv, t))
    out_dtype = out_dtype or q.dtype
    chunk = min(chunk, t)
    assert t % chunk == 0, (t, chunk)
    n_chunks = t // chunk
    group = _pick_group(s)

    def g_idx(i, c, lens):
        m = lens[i * group]
        for g in range(1, group):
            m = jnp.maximum(m, lens[i * group + g])
        return jnp.minimum(c, m // chunk)

    kv_spec = pl.BlockSpec(
        (group, chunk, hkv * d),
        lambda i, c, lens: (i, g_idx(i, c, lens), 0),
    )
    sc_spec = pl.BlockSpec(
        (group, hkv, chunk),
        lambda i, c, lens: (i, 0, g_idx(i, c, lens)),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s // group, n_chunks),
        in_specs=[
            pl.BlockSpec((group, hq, d), lambda i, c, *_: (i, 0, 0)),
            kv_spec, kv_spec, sc_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((group, hq, d), lambda i, c, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, group, rep), jnp.float32),
            pltpu.VMEM((hkv, group, rep), jnp.float32),
            pltpu.VMEM((hkv, group, rep, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _flat_kernel, chunk=chunk, n_chunks=n_chunks, rep=rep,
            group=group,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * t * d,
            bytes_accessed=2 * s * t * hkv * d + s * hq * d * 4,
            transcendentals=s * hq * t,
        ),
        interpret=_INTERPRET,
    )(lengths.astype(jnp.int32), q, k_cache, v_cache, k_scale, v_scale)


def _flat_window_decode_attention(
    q, k_cache, v_cache, k_scale, v_scale, lengths, rep, chunk, out_dtype
):
    """FLAT-layout window (verify) attention (q [S, W, Hq, D])."""
    s, w, hq, d = q.shape
    t = k_cache.shape[1]
    hkv = hq // rep
    assert k_cache.shape[-1] == hkv * d, (q.shape, k_cache.shape, rep)
    out_dtype = out_dtype or q.dtype
    # grouped f32 dequant temps: cap the chunk like the standard grouped
    # window kernel to stay inside VMEM
    chunk = min(chunk, t, 128)
    assert t % chunk == 0, (t, chunk)
    n_chunks = t // chunk
    r = w * rep
    group = _pick_group(s)

    qv = (
        q.reshape(s, w, hkv, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, hkv, r, d)
    )

    def g_idx(i, c, lens):
        m = lens[i * group]
        for g in range(1, group):
            m = jnp.maximum(m, lens[i * group + g])
        return jnp.minimum(c, (m + w - 1) // chunk)

    kv_spec = pl.BlockSpec(
        (group, chunk, hkv * d),
        lambda i, c, lens: (i, g_idx(i, c, lens), 0),
    )
    sc_spec = pl.BlockSpec(
        (group, hkv, chunk),
        lambda i, c, lens: (i, 0, g_idx(i, c, lens)),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s // group, n_chunks),
        in_specs=[
            pl.BlockSpec((group, hkv, r, d), lambda i, c, *_: (i, 0, 0, 0)),
            kv_spec, kv_spec, sc_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((group, hkv, r, d),
                               lambda i, c, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, group, r), jnp.float32),
            pltpu.VMEM((hkv, group, r), jnp.float32),
            pltpu.VMEM((hkv, group, r, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flat_window_kernel, chunk=chunk, n_chunks=n_chunks, rep=rep,
            group=group,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hkv, r, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * w * t * d,
            bytes_accessed=2 * s * t * hkv * d + s * w * hq * d * 4,
            transcendentals=s * hq * w * t,
        ),
        interpret=_INTERPRET,
    )(lengths.astype(jnp.int32), qv, k_cache, v_cache, k_scale, v_scale)
    return (
        out.reshape(s, hkv, w, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, w, hq, d)
    )


def _flat_paged_kernel(len_ref, tbl_ref, *rest, chunk, n_chunks, rep):
    del tbl_ref
    _flat_kernel(len_ref, *rest, chunk=chunk, n_chunks=n_chunks, rep=rep,
                 group=1)


def _flat_paged_window_kernel(len_ref, tbl_ref, *rest, chunk, n_chunks, rep):
    del tbl_ref
    _flat_window_kernel(len_ref, *rest, chunk=chunk, n_chunks=n_chunks,
                        rep=rep, group=1)


def _flat_paged_decode_attention(
    q, k_pool, v_pool, k_scale, v_scale, table, lengths, rep, out_dtype
):
    """FLAT-layout paged decode attention: pools [N, page, Hkv*D] int8 +
    scales [N, Hkv, page] f32, table-indirect per-slot fetches."""
    s, hq, d = q.shape
    page = k_pool.shape[1]
    hkv = hq // rep
    assert k_pool.shape[-1] == hkv * d, (q.shape, k_pool.shape, rep)
    out_dtype = out_dtype or q.dtype
    n_chunks = table.shape[1]

    def kv_idx(i, c, lens, tbl):
        return tbl[i, jnp.minimum(c, lens[i] // page)]

    kv_spec = pl.BlockSpec(
        (1, page, hkv * d),
        lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0),
    )
    sc_spec = pl.BlockSpec(
        (1, hkv, page),
        lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, c, *_: (i, 0, 0)),
            kv_spec, kv_spec, sc_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, c, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, 1, rep), jnp.float32),
            pltpu.VMEM((hkv, 1, rep), jnp.float32),
            pltpu.VMEM((hkv, 1, rep, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _flat_paged_kernel, chunk=page, n_chunks=n_chunks, rep=rep
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * n_chunks * page * d,
            bytes_accessed=2 * s * n_chunks * page * hkv * d + s * hq * d * 4,
            transcendentals=s * hq * n_chunks * page,
        ),
        interpret=_INTERPRET,
    )(
        lengths.astype(jnp.int32), table.astype(jnp.int32),
        q, k_pool, v_pool, k_scale, v_scale,
    )


def _flat_paged_window_decode_attention(
    q, k_pool, v_pool, k_scale, v_scale, table, lengths, rep, out_dtype
):
    """FLAT-layout paged window (verify) attention."""
    s, w, hq, d = q.shape
    page = k_pool.shape[1]
    hkv = hq // rep
    assert k_pool.shape[-1] == hkv * d, (q.shape, k_pool.shape, rep)
    out_dtype = out_dtype or q.dtype
    n_chunks = table.shape[1]
    r = w * rep

    qv = (
        q.reshape(s, w, hkv, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, hkv, r, d)
    )

    def kv_idx(i, c, lens, tbl):
        return tbl[i, jnp.minimum(c, (lens[i] + w - 1) // page)]

    kv_spec = pl.BlockSpec(
        (1, page, hkv * d),
        lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0),
    )
    sc_spec = pl.BlockSpec(
        (1, hkv, page),
        lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0),
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hkv, r, d), lambda i, c, *_: (i, 0, 0, 0)),
            kv_spec, kv_spec, sc_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((1, hkv, r, d), lambda i, c, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, 1, r), jnp.float32),
            pltpu.VMEM((hkv, 1, r), jnp.float32),
            pltpu.VMEM((hkv, 1, r, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _flat_paged_window_kernel, chunk=page, n_chunks=n_chunks, rep=rep
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hkv, r, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * w * n_chunks * page * d,
            bytes_accessed=2 * s * n_chunks * page * hkv * d
            + s * w * hq * d * 4,
            transcendentals=s * hq * w * n_chunks * page,
        ),
        interpret=_INTERPRET,
    )(
        lengths.astype(jnp.int32), table.astype(jnp.int32),
        qv, k_pool, v_pool, k_scale, v_scale,
    )
    return (
        out.reshape(s, hkv, w, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, w, hq, d)
    )


# ---------------------------------------------------------------------------
# paged decode: the KV pool is [N_pages, page, Hkv, D] and a
# scalar-prefetched page table [S, max_pages] redirects each grid step's
# fetch — the same online-softmax body as the dense kernel, with the
# BlockSpec index maps reading THROUGH the table (models/paged_decoder.py).
# HBM traffic is exactly the slot's live pages; dead/unallocated logical
# chunks clamp to the last live page (no extra DMA).
# ---------------------------------------------------------------------------


def _paged_kernel(len_ref, tbl_ref, *rest, chunk, n_chunks, rep):
    # the table is consumed by the index maps only; the body masks by
    # LOGICAL position exactly like the dense kernel
    del tbl_ref
    _kernel(len_ref, *rest, chunk=chunk, n_chunks=n_chunks, rep=rep)


def _paged_window_kernel(len_ref, tbl_ref, *rest, chunk, n_chunks, rep):
    del tbl_ref
    _window_kernel(len_ref, *rest, chunk=chunk, n_chunks=n_chunks, rep=rep)


@functools.partial(jax.jit, static_argnames=("rep", "out_dtype", "layer"))
def paged_decode_attention(
    q: jnp.ndarray,        # [S, Hq, D] (bf16/f32)
    k_pool: jnp.ndarray,   # int8 [N, page, Hkv, D] — or [L, N, page, Hkv, D]
    v_pool: jnp.ndarray,   # int8 (same)
    k_scale: jnp.ndarray,  # f32 [N, page, Hkv] — or [L, N, page, Hkv]
    v_scale: jnp.ndarray,  # f32 (same)
    table: jnp.ndarray,    # int32 [S, max_pages]
    lengths: jnp.ndarray,  # int32 [S] — attend to positions <= lengths[s]
    rep: int,
    out_dtype=None,
    layer: int = -1,
):
    """``layer >= 0``: the whole layered pool is passed and a squeezed
    (None) leading block dim pins the layer — avoids materializing a
    per-layer contiguous slice temp (the dense decode_attention fix).

    A 3-D ``k_pool`` selects the FLAT layout ([N, page, Hkv*D] int8 +
    [N, Hkv, page] f32 scales — see the flat-layout section comment)."""
    if k_pool.ndim == 3 and layer < 0:
        return _flat_paged_decode_attention(
            q, k_pool, v_pool, k_scale, v_scale, table, lengths,
            rep=rep, out_dtype=out_dtype,
        )
    if layer >= 0:
        assert k_pool.ndim == 5, k_pool.shape
    s, hq, d = q.shape
    page = k_pool.shape[-3]
    hkv = k_pool.shape[-2]
    assert hq == hkv * rep, (q.shape, k_pool.shape, rep)
    out_dtype = out_dtype or q.dtype
    n_chunks = table.shape[1]

    def kv_idx(i, c, lens, tbl):
        # logical chunk clamps to the slot's last live chunk, then the
        # table maps it to a pool page (same page -> no DMA re-issue)
        return tbl[i, jnp.minimum(c, lens[i] // page)]

    if layer >= 0:
        kv_spec = pl.BlockSpec(
            (None, 1, page, hkv, d),
            lambda i, c, lens, tbl: (layer, kv_idx(i, c, lens, tbl), 0, 0, 0),
        )
        sc_spec = pl.BlockSpec(
            (None, 1, page, hkv),
            lambda i, c, lens, tbl: (layer, kv_idx(i, c, lens, tbl), 0, 0),
        )
    else:
        kv_spec = pl.BlockSpec(
            (1, page, hkv, d),
            lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0, 0),
        )
        sc_spec = pl.BlockSpec(
            (1, page, hkv),
            lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hq, d), lambda i, c, *_: (i, 0, 0)),
            kv_spec, kv_spec, sc_spec, sc_spec,
        ],
        out_specs=pl.BlockSpec((1, hq, d), lambda i, c, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, rep), jnp.float32),
            pltpu.VMEM((hkv, rep), jnp.float32),
            pltpu.VMEM((hkv, rep, d), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(
            _paged_kernel, chunk=page, n_chunks=n_chunks, rep=rep
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hq, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * n_chunks * page * d,
            bytes_accessed=2 * s * n_chunks * page * hkv * d + s * hq * d * 4,
            transcendentals=s * hq * n_chunks * page,
        ),
        interpret=_INTERPRET,
    )(
        lengths.astype(jnp.int32), table.astype(jnp.int32),
        q, k_pool, v_pool, k_scale, v_scale,
    )


@functools.partial(jax.jit, static_argnames=("rep", "out_dtype"))
def paged_window_decode_attention(
    q: jnp.ndarray,        # [S, W, Hq, D]: row w sits at lengths[s] + w
    k_pool: jnp.ndarray,   # int8 [N, page, Hkv, D] (window rows pre-written)
    v_pool: jnp.ndarray,   # int8 [N, page, Hkv, D]
    k_scale: jnp.ndarray,  # f32 [N, page, Hkv]
    v_scale: jnp.ndarray,  # f32 [N, page, Hkv]
    table: jnp.ndarray,    # int32 [S, max_pages]
    lengths: jnp.ndarray,  # int32 [S]
    rep: int,
    out_dtype=None,
):
    """Paged fused verify attention (speculative decoding over the paged
    cache): the window kernel body with table-indirect fetches.

    A 3-D ``k_pool`` selects the FLAT layout (see the flat-layout
    section comment)."""
    if k_pool.ndim == 3:
        return _flat_paged_window_decode_attention(
            q, k_pool, v_pool, k_scale, v_scale, table, lengths,
            rep=rep, out_dtype=out_dtype,
        )
    s, w, hq, d = q.shape
    page = k_pool.shape[1]
    hkv = k_pool.shape[2]
    assert hq == hkv * rep, (q.shape, k_pool.shape, rep)
    out_dtype = out_dtype or q.dtype
    n_chunks = table.shape[1]
    r = w * rep

    qv = (
        q.reshape(s, w, hkv, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, hkv, r, d)
    )

    def kv_idx(i, c, lens, tbl):
        return tbl[i, jnp.minimum(c, (lens[i] + w - 1) // page)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hkv, r, d), lambda i, c, *_: (i, 0, 0, 0)),
            pl.BlockSpec(
                (1, page, hkv, d),
                lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, page, hkv, d),
                lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0, 0),
            ),
            pl.BlockSpec(
                (1, page, hkv),
                lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0),
            ),
            pl.BlockSpec(
                (1, page, hkv),
                lambda i, c, lens, tbl: (kv_idx(i, c, lens, tbl), 0, 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, hkv, r, d), lambda i, c, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, r), jnp.float32),
            pltpu.VMEM((hkv, r), jnp.float32),
            pltpu.VMEM((hkv, r, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _paged_window_kernel, chunk=page, n_chunks=n_chunks, rep=rep
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hkv, r, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * w * n_chunks * page * d,
            bytes_accessed=2 * s * n_chunks * page * hkv * d + s * w * hq * d * 4,
            transcendentals=s * hq * w * n_chunks * page,
        ),
        interpret=_INTERPRET,
    )(
        lengths.astype(jnp.int32), table.astype(jnp.int32),
        qv, k_pool, v_pool, k_scale, v_scale,
    )
    return (
        out.reshape(s, hkv, w, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, w, hq, d)
    )


# ---------------------------------------------------------------------------
# windowed decode: W queries per slot (speculative-decoding verify)
# ---------------------------------------------------------------------------

def _window_kernel(
    len_ref,      # scalar-prefetch: int32 [S]
    q_ref,        # [1, Hkv, W*rep, D]
    k_ref,        # int8 [1, C, Hkv, D]
    v_ref,        # int8 [1, C, Hkv, D]
    ks_ref,       # f32 [1, C, Hkv]
    vs_ref,       # f32 [1, C, Hkv]
    o_ref,        # [1, Hkv, W*rep, D]
    m_scr,        # f32 [Hkv, W*rep]
    l_scr,        # f32 [Hkv, W*rep]
    acc_scr,      # f32 [Hkv, W*rep, D]
    *,
    chunk: int,
    n_chunks: int,
    rep: int,
):
    s = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    r, d = q_ref.shape[2], q_ref.shape[3]
    w = r // rep

    # skip chunks entirely past the window's last position (lengths+W-1):
    # the fetch index clamps alongside, so dead cache rows never DMA
    @pl.when(c * chunk <= len_ref[s] + w - 1)
    def _():
        q = q_ref[0].astype(jnp.float32)                        # [Hkv, R, D]
        k = k_ref[0].astype(jnp.float32) * ks_ref[0][..., None]  # [C, Hkv, D]
        v = v_ref[0].astype(jnp.float32) * vs_ref[0][..., None]
        kt = jnp.transpose(k, (1, 0, 2))                        # [Hkv, C, D]
        vt = jnp.transpose(v, (1, 0, 2))
        logits = jax.lax.dot_general(
            q, kt,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(d)                                        # [Hkv, R, C]

        # row r's query sits at position lengths[s] + r//rep and attends
        # cache positions <= that (verify_step's mask)
        w_of_row = (
            jax.lax.broadcasted_iota(jnp.int32, (1, r, chunk), 1) // rep
        )
        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (1, r, chunk), 2
        )
        logits = jnp.where(pos <= len_ref[s] + w_of_row, logits, -1e30)

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
        )                                                       # [Hkv, R, D]
        acc_scr[:] = acc_scr[:] * alpha[..., None] + pv

    @pl.when(c == n_chunks - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[0] = out.astype(o_ref.dtype)


def _grouped_window_kernel(
    len_ref,      # scalar-prefetch: int32 [S]
    q_ref,        # [G, Hkv, R, D]   (R = W*rep)
    k_ref,        # int8 [G, C, Hkv, D]
    v_ref,        # int8 [G, C, Hkv, D]
    ks_ref,       # f32 [G, C, Hkv]
    vs_ref,       # f32 [G, C, Hkv]
    o_ref,        # [G, Hkv, R, D]
    m_scr,        # f32 [G*Hkv, R]
    l_scr,        # f32 [G*Hkv, R]
    acc_scr,      # f32 [G*Hkv, R, D]
    *,
    chunk: int,
    n_chunks: int,
    rep: int,
    group: int,
):
    """Slot-GROUPED window (verify) attention: one grid step advances
    ``group`` slots' W-row query windows through one KV chunk. The
    per-slot window kernel paid the same ~1.4 us/(slot, chunk) grid
    overhead the r4 decode restructure removed from the plain path
    (VERDICT r4 weak 4) — grouping carries that fix to the
    speculative/prompt-lookup verify programs. Same online-softmax
    recurrence; per-slot, per-window-row masks via static select
    chains (Mosaic: scalar SMEM loads only, one batch dim per matmul)."""
    i = pl.program_id(0)
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -1e30)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    lens = [len_ref[i * group + g] for g in range(group)]
    max_len = functools.reduce(jnp.maximum, lens)
    hkv, r, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    w = r // rep

    # the group skips chunks past its LONGEST slot's window end
    @pl.when(c * chunk <= max_len + w - 1)
    def _():
        q = q_ref[:].reshape(group * hkv, r, d).astype(jnp.float32)
        k = k_ref[:].astype(jnp.float32) * ks_ref[:][..., None]  # [G,C,Hkv,D]
        v = v_ref[:].astype(jnp.float32) * vs_ref[:][..., None]
        kt = jnp.transpose(k, (0, 2, 1, 3)).reshape(group * hkv, chunk, d)
        vt = jnp.transpose(v, (0, 2, 1, 3)).reshape(group * hkv, chunk, d)

        logits = jax.lax.dot_general(
            q, kt,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) / math.sqrt(d)                                   # [G*Hkv, R, C]

        # row (g, kv, r): query w = r//rep sits at lens[g] + w and
        # attends cache positions <= lens[g] + w
        pos = c * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (group * hkv, r, chunk), 2
        )
        w_of_row = jax.lax.broadcasted_iota(
            jnp.int32, (group * hkv, r, chunk), 1
        ) // rep
        row_g = jax.lax.broadcasted_iota(
            jnp.int32, (group * hkv, r, chunk), 0
        ) // hkv
        lens_row = jnp.full((group * hkv, r, chunk), lens[0], jnp.int32)
        for g in range(1, group):
            lens_row = jnp.where(row_g == g, lens[g], lens_row)
        logits = jnp.where(pos <= lens_row + w_of_row, logits, -1e30)

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
        )
        acc_scr[:] = acc_scr[:] * alpha[..., None] + pv

    @pl.when(c == n_chunks - 1)
    def _():
        out = acc_scr[:] / jnp.maximum(l_scr[:], 1e-30)[..., None]
        o_ref[:] = out.reshape(group, hkv, r, d).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rep", "chunk", "out_dtype"))
def window_decode_attention(
    q: jnp.ndarray,        # [S, W, Hq, D]: row w sits at lengths[s] + w
    k_cache: jnp.ndarray,  # int8 [S, T, Hkv, D] (window rows pre-written)
    v_cache: jnp.ndarray,  # int8 [S, T, Hkv, D]
    k_scale: jnp.ndarray,  # f32 [S, T, Hkv]
    v_scale: jnp.ndarray,  # f32 [S, T, Hkv]
    lengths: jnp.ndarray,  # int32 [S]
    rep: int,
    chunk: int = 256,
    out_dtype=None,
):
    """Fused attention for speculative-decoding verification
    (models/decoder.verify_step): W query rows per slot, row w masked to
    cache positions <= lengths[s]+w. Like :func:`decode_attention`, the
    int8 cache is read once per chunk at int8 width and GQA repeats
    never materialize (q enters KV-head-major, [Hkv, W*rep, D]).

    A 3-D ``k_cache`` selects the FLAT layout (see the flat-layout
    section comment)."""
    if k_cache.ndim == 3:
        return _flat_window_decode_attention(
            q, k_cache, v_cache, k_scale, v_scale, lengths,
            rep=rep, chunk=chunk, out_dtype=out_dtype,
        )
    s, w, hq, d = q.shape
    t = k_cache.shape[1]
    hkv = k_cache.shape[2]
    assert hq == hkv * rep, (q.shape, k_cache.shape, rep)
    out_dtype = out_dtype or q.dtype
    chunk = min(chunk, t)
    assert t % chunk == 0, (t, chunk)
    n_chunks = t // chunk
    r = w * rep

    # [S, W, Hq, D] -> [S, Hkv, W*rep, D], rows ordered (w, rep)
    qv = (
        q.reshape(s, w, hkv, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, hkv, r, d)
    )

    group = _pick_group(s)
    if group > 1:
        # a group's f32 dequant temps are group x the per-slot kernel's:
        # cap the chunk at 128 (like the grouped decode kernel) to stay
        # inside VMEM
        gchunk = min(chunk, 128)
        gn_chunks = t // gchunk

        def g_idx(i, c, lens):
            m = lens[i * group]
            for g in range(1, group):
                m = jnp.maximum(m, lens[i * group + g])
            return jnp.minimum(c, (m + w - 1) // gchunk)

        kv_spec = pl.BlockSpec(
            (group, gchunk, hkv, d),
            lambda i, c, lens: (i, g_idx(i, c, lens), 0, 0),
        )
        sc_spec = pl.BlockSpec(
            (group, gchunk, hkv),
            lambda i, c, lens: (i, g_idx(i, c, lens), 0),
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(s // group, gn_chunks),
            in_specs=[
                pl.BlockSpec((group, hkv, r, d),
                             lambda i, c, *_: (i, 0, 0, 0)),
                kv_spec, kv_spec, sc_spec, sc_spec,
            ],
            out_specs=pl.BlockSpec((group, hkv, r, d),
                                   lambda i, c, *_: (i, 0, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((group * hkv, r), jnp.float32),
                pltpu.VMEM((group * hkv, r), jnp.float32),
                pltpu.VMEM((group * hkv, r, d), jnp.float32),
            ],
        )
        out = pl.pallas_call(
            functools.partial(
                _grouped_window_kernel, chunk=gchunk, n_chunks=gn_chunks,
                rep=rep, group=group,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((s, hkv, r, d), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=4 * s * hq * w * t * d,
                bytes_accessed=2 * s * t * hkv * d + s * w * hq * d * 4,
                transcendentals=s * hq * w * t,
            ),
            interpret=_INTERPRET,
        )(lengths.astype(jnp.int32), qv, k_cache, v_cache,
          k_scale, v_scale)
        return (
            out.reshape(s, hkv, w, rep, d)
            .transpose(0, 2, 1, 3, 4)
            .reshape(s, w, hq, d)
        )

    def kv_idx(i, c, lens):
        # clamp to the window's last live chunk (positions reach
        # lengths + W - 1); past it the index repeats -> no more DMA
        return jnp.minimum(c, (lens[i] + w - 1) // chunk)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s, n_chunks),
        in_specs=[
            pl.BlockSpec((1, hkv, r, d), lambda i, c, *_: (i, 0, 0, 0)),
            pl.BlockSpec(
                (1, chunk, hkv, d), lambda i, c, lens: (i, kv_idx(i, c, lens), 0, 0)
            ),
            pl.BlockSpec(
                (1, chunk, hkv, d), lambda i, c, lens: (i, kv_idx(i, c, lens), 0, 0)
            ),
            pl.BlockSpec(
                (1, chunk, hkv), lambda i, c, lens: (i, kv_idx(i, c, lens), 0)
            ),
            pl.BlockSpec(
                (1, chunk, hkv), lambda i, c, lens: (i, kv_idx(i, c, lens), 0)
            ),
        ],
        out_specs=pl.BlockSpec((1, hkv, r, d), lambda i, c, *_: (i, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, r), jnp.float32),
            pltpu.VMEM((hkv, r), jnp.float32),
            pltpu.VMEM((hkv, r, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _window_kernel, chunk=chunk, n_chunks=n_chunks, rep=rep
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((s, hkv, r, d), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * hq * w * t * d,
            bytes_accessed=2 * s * t * hkv * d + s * w * hq * d * 4,
            transcendentals=s * hq * w * t,
        ),
        interpret=_INTERPRET,
    )(lengths.astype(jnp.int32), qv, k_cache, v_cache, k_scale, v_scale)
    return (
        out.reshape(s, hkv, w, rep, d)
        .transpose(0, 2, 1, 3, 4)
        .reshape(s, w, hq, d)
    )
