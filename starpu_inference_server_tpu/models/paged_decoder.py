"""Paged (block) KV cache for decoder serving.

No reference counterpart (the reference serves encoder models only and
has no KV cache — SURVEY.md section 5.7); this implements the VERDICT
round-1 item 3 requirement: the dense cache preallocates
``num_slots x max_len`` rows (models/decoder.py ``init_cache``), so HBM
fills with dead rows long before the chip is bandwidth-bound and slot
count cannot scale with demand. Here the cache is a global POOL of
fixed-size pages plus a per-slot page table:

- ``k``/``v`` pools are ``[L, N_pages, page, H_kv, D]`` int8 (+ f32
  scales per (page-row, head)) — HBM is sized by the POOL, independent
  of slot count;
- ``table`` int32 ``[S, max_pages]`` maps a slot's logical chunk index
  to a pool page; the engine's host-side allocator hands out pages
  sized to each request's ``prompt + max_new + headroom`` instead of
  ``max_len``;
- pool page 0 is reserved as the GARBAGE page: unallocated table
  entries point at it, and inactive slots park their (discarded)
  decode writes there — the paged analogue of the dense path's
  park-at-``t_max-1`` trick;
- TPU-first: page size equals the fused decode kernel's chunk, so the
  Pallas kernels read straight through the table via scalar-prefetched
  index maps (ops/decode_attention.py ``paged_decode_attention``) — no
  gather materialization, HBM traffic exactly the live pages.

The non-Pallas fallback gathers the slot's pages into a logical
``[S, T, H, D]`` view (CPU tests, interpret mode).

Numerics are identical to the dense path: the same INT8 round trip,
the same masks, the same write-before-attend ordering.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .decoder import (
    DecoderSpec,
    _dequantize_kv,
    _flat_rows,
    _mlp_block,
    _project_qkv,
    _quantize_kv,
    _std_kv_view,
    _std_scale_view,
    _with_layer,
    rms_norm,
    rope,
)
from ..ops import nn

import math


class PagedKVCache(NamedTuple):
    """INT8 paged KV cache: PER-LAYER page pools + per-slot page table.

    ``k``/``v`` are length-L tuples of per-layer pools int8
    [N, page, H_kv, D] (scales f32 [N, page, H_kv]) — the same
    per-layer-leaves layout as the dense ``KVCache`` and for the same
    reason: ``cache.k[li]`` is a tuple index onto the layer's own
    buffer, so no contiguous pool slice materializes per layer and the
    per-layer scatters alias in place (VERDICT r5; the dense refactor
    measured +20-159% raw decode)."""

    k: object             # tuple of int8 [N, page, H_kv, D]
    v: object
    k_scale: object       # tuple of f32 [N, page, H_kv]
    v_scale: object
    table: jnp.ndarray    # int32 [S, max_pages] pool page per logical chunk
    lengths: jnp.ndarray  # int32 [S]

    @property
    def flat(self) -> bool:
        """FLAT layout: pools int8 [N, page, H_kv*D] with scales f32
        [N, H_kv, page] — the paged version of the dense flat layout
        (models/decoder.KVCache: lane-aligned minor dims make XLA's
        compact parameter layout the standard layout, killing the
        per-program whole-pool layout conversion)."""
        return self.k[0].ndim == 3

    @property
    def num_slots(self) -> int:
        return self.table.shape[0]

    @property
    def page_size(self) -> int:
        return self.k[0].shape[1]

    @property
    def num_pages(self) -> int:
        return self.k[0].shape[0]

    @property
    def max_len(self) -> int:
        return self.table.shape[1] * self.page_size


def init_paged_cache(
    spec: DecoderSpec,
    num_slots: int,
    max_len: int,
    num_pages: int,
    page_size: int = 128,
    flat: bool = False,
) -> PagedKVCache:
    """``num_pages`` INCLUDES the reserved garbage page 0 (the allocator
    hands out 1..num_pages-1). ``flat`` selects the lane-aligned FLAT
    pool layout (see :class:`PagedKVCache`)."""
    if max_len % page_size != 0:
        raise ValueError(f"max_len ({max_len}) % page_size ({page_size}) != 0")
    if num_pages < 2:
        raise ValueError("num_pages must be >= 2 (page 0 is reserved)")
    max_pages = max_len // page_size
    if flat:
        shape = (num_pages, page_size, spec.kv_heads * spec.head_dim)
        sshape = (num_pages, spec.kv_heads, page_size)
    else:
        shape = (num_pages, page_size, spec.kv_heads, spec.head_dim)
        sshape = shape[:-1]
    return PagedKVCache(
        k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(spec.layers)),
        v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(spec.layers)),
        k_scale=tuple(jnp.zeros(sshape, jnp.float32)
                      for _ in range(spec.layers)),
        v_scale=tuple(jnp.zeros(sshape, jnp.float32)
                      for _ in range(spec.layers)),
        table=jnp.zeros((num_slots, max_pages), jnp.int32),
        lengths=jnp.zeros((num_slots,), jnp.int32),
    )


def set_table_row(cache: PagedKVCache, slot, row) -> PagedKVCache:
    """Install a slot's page mapping (row int32 [max_pages], unallocated
    tail = 0). Dispatched by the engine at admission, BEFORE the prefill
    that reads it (ordering via the cache dependency chain)."""
    return cache._replace(table=cache.table.at[slot].set(row))


def _gather_slot_rows(pool_l, table):
    """Fallback view: [N, page, ...] pool + [S, MP] table ->
    [S, MP*page, ...] logical rows."""
    g = pool_l[table]  # [S, MP, page, ...]
    return g.reshape((g.shape[0], g.shape[1] * g.shape[2]) + g.shape[3:])


def _gather_slot_scales_flat(pool_l, table):
    """Fallback view for FLAT scales: [N, H, page] pool + [S, MP] table
    -> standard [S, MP*page, H] logical rows."""
    g = pool_l[table]  # [S, MP, H, page]
    g = g.transpose(0, 1, 3, 2)  # [S, MP, page, H]
    return g.reshape(g.shape[0], g.shape[1] * g.shape[2], g.shape[3])


def _gather_std(spec, cache, li, dtype):
    """Logical [S, T, Hq-unrepeated] dequantized K/V for layer ``li`` in
    either pool layout (fallback paths; CPU tests / interpret mode)."""
    if cache.flat:
        k = _dequantize_kv(
            _std_kv_view(spec, _gather_slot_rows(cache.k[li], cache.table)),
            _gather_slot_scales_flat(cache.k_scale[li], cache.table),
            dtype,
        )
        v = _dequantize_kv(
            _std_kv_view(spec, _gather_slot_rows(cache.v[li], cache.table)),
            _gather_slot_scales_flat(cache.v_scale[li], cache.table),
            dtype,
        )
        return k, v
    k = _dequantize_kv(
        _gather_slot_rows(cache.k[li], cache.table),
        _gather_slot_rows(cache.k_scale[li], cache.table),
        dtype,
    )
    v = _dequantize_kv(
        _gather_slot_rows(cache.v[li], cache.table),
        _gather_slot_rows(cache.v_scale[li], cache.table),
        dtype,
    )
    return k, v


# -- prefill (bucket path): write a whole padded prompt into one slot ------

def paged_prefill(
    spec: DecoderSpec,
    params,
    cache: PagedKVCache,
    ids: jnp.ndarray,      # int32 [P] padded prompt
    length: jnp.ndarray,   # int32 scalar: true prompt length
    slot: jnp.ndarray,     # int32 scalar: target slot
    dtype,
) -> tuple:
    """Paged analogue of decoder.prefill (models/decoder.py:314): same
    compute, the KV lands in the slot's allocated pages. Returns
    (cache', last_logits [vocab])."""
    p = ids.shape[0]
    page = cache.page_size
    positions = jnp.arange(p, dtype=jnp.int32)
    x = nn.embedding(params["embed"], ids[None, :], dtype)  # [1, P, D]
    valid = positions < length
    causal = (jnp.tril(jnp.ones((p, p), bool)) & valid[None, :])[None, None]
    rep = spec.q_heads // spec.kv_heads
    # pages this prompt touches (static count, dynamic page ids)
    n_pages = -(-p // page)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = _project_qkv(spec, layer, h, dtype)
        q = qf.reshape(1, p, spec.q_heads, spec.head_dim)
        k = kf.reshape(1, p, spec.kv_heads, spec.head_dim)
        v = vf.reshape(1, p, spec.kv_heads, spec.head_dim)
        q = rope(q, positions[None])
        k = rope(k, positions[None])
        kq, kscale = _quantize_kv(k[0])   # [P, H_kv, D], [P, H_kv]
        vq, vscale = _quantize_kv(v[0])
        ck, cv = cache.k[li], cache.v[li]
        cks, cvs = cache.k_scale[li], cache.v_scale[li]
        for j in range(n_pages):
            pid = cache.table[slot, j]
            lo, hi = j * page, min((j + 1) * page, p)
            n = hi - lo
            if cache.flat:
                ck = ck.at[pid, :n].set(_flat_rows(kq[lo:hi]))
                cv = cv.at[pid, :n].set(_flat_rows(vq[lo:hi]))
                cks = cks.at[pid, :, :n].set(kscale[lo:hi].T)
                cvs = cvs.at[pid, :, :n].set(vscale[lo:hi].T)
            else:
                ck = ck.at[pid, :n].set(kq[lo:hi])
                cv = cv.at[pid, :n].set(vq[lo:hi])
                cks = cks.at[pid, :n].set(kscale[lo:hi])
                cvs = cvs.at[pid, :n].set(vscale[lo:hi])
        cache = _with_layer(cache, li, ck, cv, cks, cvs)

        # in-prompt attention needs no cache read (single-shot prefill)
        kg = jnp.repeat(k, rep, axis=2)
        vg = jnp.repeat(v, rep, axis=2)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kg, preferred_element_type=jnp.float32
        ) / math.sqrt(spec.head_dim)
        logits = jnp.where(causal, logits, -1e9)
        probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, vg, preferred_element_type=jnp.float32
        )
        attn = attn.reshape(1, p, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    cache = cache._replace(lengths=cache.lengths.at[slot].set(length))
    x = rms_norm(params["final_norm"], x)
    last = x[0, length - 1]
    logits = nn.dense(params["lm_head"], last[None, :], dtype)[0]
    return cache, logits.astype(jnp.float32)


# -- chunked prefill --------------------------------------------------------

def paged_prefill_chunk(
    spec: DecoderSpec,
    params,
    cache: PagedKVCache,
    ids: jnp.ndarray,      # int32 [C] chunk tokens (tail chunk zero-padded)
    start: jnp.ndarray,    # int32 scalar: absolute offset (multiple of C)
    valid: jnp.ndarray,    # int32 scalar: real tokens in this chunk
    slot: jnp.ndarray,     # int32 scalar: target slot
    dtype,
) -> tuple:
    """Paged analogue of decoder.prefill_chunk (models/decoder.py:386).
    Requires the chunk size to be a multiple of the page size and chunks
    to be aligned (the engine enforces prefill_chunk % page == 0), so a
    chunk covers whole pages starting at logical page ``start // page``.
    """
    c = ids.shape[0]
    page = cache.page_size
    assert c % page == 0, (c, page)
    pages_per_chunk = c // page
    t_max = cache.max_len
    rows = jnp.arange(c, dtype=jnp.int32)
    positions = start + rows
    x = nn.embedding(params["embed"], ids[None, :], dtype)  # [1, C, D]
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    past_mask = (key_pos[None, :] < start)[None, None]
    cur_mask = jnp.tril(jnp.ones((c, c), bool))[None, None]
    inv = 1.0 / math.sqrt(spec.head_dim)
    rep = spec.q_heads // spec.kv_heads
    first_page = start // page

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = _project_qkv(spec, layer, h, dtype)
        q = qf.reshape(1, c, spec.q_heads, spec.head_dim)
        k = kf.reshape(1, c, spec.kv_heads, spec.head_dim)
        v = vf.reshape(1, c, spec.kv_heads, spec.head_dim)
        q = rope(q, positions[None])
        k = rope(k, positions[None])

        kq, kscale = _quantize_kv(k[0])
        vq, vscale = _quantize_kv(v[0])
        ck, cv = cache.k[li], cache.v[li]
        cks, cvs = cache.k_scale[li], cache.v_scale[li]
        for j in range(pages_per_chunk):
            pid = cache.table[slot, first_page + j]
            lo = j * page
            if cache.flat:
                ck = ck.at[pid].set(_flat_rows(kq[lo : lo + page]))
                cv = cv.at[pid].set(_flat_rows(vq[lo : lo + page]))
                cks = cks.at[pid].set(kscale[lo : lo + page].T)
                cvs = cvs.at[pid].set(vscale[lo : lo + page].T)
            else:
                ck = ck.at[pid].set(kq[lo : lo + page])
                cv = cv.at[pid].set(vq[lo : lo + page])
                cks = cks.at[pid].set(kscale[lo : lo + page])
                cvs = cvs.at[pid].set(vscale[lo : lo + page])
        cache = _with_layer(cache, li, ck, cv, cks, cvs)

        # past attention reads the slot's logical rows back through the
        # table (gather fallback; prefill is compute-bound)
        row = cache.table[slot]  # [MP]
        if cache.flat:
            row_k = _dequantize_kv(
                _std_kv_view(spec, cache.k[li][row].reshape(
                    t_max, spec.kv_heads * spec.head_dim)),
                _std_scale_view(cache.k_scale[li][row]).reshape(
                    t_max, spec.kv_heads),
                dtype,
            )
            row_v = _dequantize_kv(
                _std_kv_view(spec, cache.v[li][row].reshape(
                    t_max, spec.kv_heads * spec.head_dim)),
                _std_scale_view(cache.v_scale[li][row]).reshape(
                    t_max, spec.kv_heads),
                dtype,
            )
        else:
            row_k = _dequantize_kv(
                cache.k[li][row].reshape(t_max, spec.kv_heads, spec.head_dim),
                cache.k_scale[li][row].reshape(t_max, spec.kv_heads),
                dtype,
            )
            row_v = _dequantize_kv(
                cache.v[li][row].reshape(t_max, spec.kv_heads, spec.head_dim),
                cache.v_scale[li][row].reshape(t_max, spec.kv_heads),
                dtype,
            )
        row_k = jnp.repeat(row_k, rep, axis=1)[None]
        row_v = jnp.repeat(row_v, rep, axis=1)[None]
        s_past = jnp.einsum(
            "bqhd,bkhd->bhqk", q, row_k, preferred_element_type=jnp.float32
        ) * inv
        s_past = jnp.where(past_mask, s_past, -1e9)
        kc = jnp.repeat(k, rep, axis=2)
        vc = jnp.repeat(v, rep, axis=2)
        s_cur = jnp.einsum(
            "bqhd,bkhd->bhqk", q, kc, preferred_element_type=jnp.float32
        ) * inv
        s_cur = jnp.where(cur_mask, s_cur, -1e9)
        probs = jax.nn.softmax(
            jnp.concatenate([s_past, s_cur], axis=-1), axis=-1
        ).astype(dtype)
        p_past, p_cur = probs[..., :t_max], probs[..., t_max:]
        attn = jnp.einsum(
            "bhqk,bkhd->bqhd", p_past, row_v, preferred_element_type=jnp.float32
        )
        attn = attn + jnp.einsum(
            "bhqk,bkhd->bqhd", p_cur, vc, preferred_element_type=jnp.float32
        )
        attn = attn.reshape(1, c, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    cache = cache._replace(lengths=cache.lengths.at[slot].set(start + valid))
    x = rms_norm(params["final_norm"], x)
    last = x[0, valid - 1]
    logits = nn.dense(params["lm_head"], last[None, :], dtype)[0]
    return cache, logits.astype(jnp.float32)


# -- decode -----------------------------------------------------------------

def paged_decode_step(
    spec: DecoderSpec,
    params,
    cache: PagedKVCache,
    ids: jnp.ndarray,      # int32 [S]
    active: jnp.ndarray,   # bool [S]
    dtype,
) -> tuple:
    """Paged analogue of decoder.decode_step (models/decoder.py:516):
    the new token's KV scatters through the page table; attention reads
    the pool through the table (Pallas kernel on TPU, gather fallback
    elsewhere). Inactive slots park their writes in garbage page 0."""
    s = ids.shape[0]
    page = cache.page_size
    positions = cache.lengths
    x = nn.embedding(params["embed"], ids[:, None], dtype)  # [S, 1, D]
    t_max = cache.max_len
    key_pos = jnp.arange(t_max, dtype=jnp.int32)[None, :]
    mask = (key_pos <= positions[:, None])[:, None, None, :]
    slot_idx = jnp.arange(s)
    # write target: the slot's current page (garbage page 0 if inactive)
    page_ids = jnp.where(
        active, cache.table[slot_idx, positions // page], 0
    )
    offs = jnp.where(active, positions % page, 0)
    rep = spec.q_heads // spec.kv_heads
    use_fused = _use_fused_paged_attention(spec, page)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = _project_qkv(spec, layer, h, dtype)
        q = qf.reshape(s, 1, spec.q_heads, spec.head_dim)
        k = kf.reshape(s, 1, spec.kv_heads, spec.head_dim)
        v = vf.reshape(s, 1, spec.kv_heads, spec.head_dim)
        q = rope(q, positions[:, None])
        k = rope(k, positions[:, None])

        kq, kscale = _quantize_kv(k[:, 0])  # [S, H, D], [S, H]
        vq, vscale = _quantize_kv(v[:, 0])
        if cache.flat:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[page_ids, offs].set(_flat_rows(kq)),
                cache.v[li].at[page_ids, offs].set(_flat_rows(vq)),
                cache.k_scale[li].at[page_ids, :, offs].set(kscale),
                cache.v_scale[li].at[page_ids, :, offs].set(vscale),
            )
        else:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[page_ids, offs].set(kq),
                cache.v[li].at[page_ids, offs].set(vq),
                cache.k_scale[li].at[page_ids, offs].set(kscale),
                cache.v_scale[li].at[page_ids, offs].set(vscale),
            )

        if use_fused:
            from ..ops.decode_attention import paged_decode_attention

            # PER-LAYER pools: cache.k[li] is a tuple index onto the
            # layer's own buffer — no pool slice materializes and the
            # scatter aliases in place (the r4 layer-pinned whole-pool
            # variant regressed precisely because the stacked buffer
            # flipped into copy-on-write; per-layer leaves remove the
            # stacked buffer altogether).
            attn = paged_decode_attention(
                q[:, 0], cache.k[li], cache.v[li],
                cache.k_scale[li], cache.v_scale[li],
                cache.table, positions, rep=rep,
            ).reshape(s, 1, spec.q_heads * spec.head_dim).astype(dtype)
        else:
            k_all, v_all = _gather_std(spec, cache, li, dtype)  # [S, T, H, D]
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)
            logits = jnp.einsum(
                "sqhd,skhd->shqk", q, k_all, preferred_element_type=jnp.float32
            ) / math.sqrt(spec.head_dim)
            logits = jnp.where(mask, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            attn = jnp.einsum(
                "shqk,skhd->sqhd", probs, v_all,
                preferred_element_type=jnp.float32,
            ).reshape(s, 1, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    x = rms_norm(params["final_norm"], x)
    logits = nn.dense(params["lm_head"], x[:, 0], dtype).astype(jnp.float32)
    new_lengths = jnp.where(active, cache.lengths + 1, cache.lengths)
    return cache._replace(lengths=new_lengths), logits


# -- verify (speculative decoding) -----------------------------------------

def paged_verify_step(
    spec: DecoderSpec,
    params,
    cache: PagedKVCache,
    ids: jnp.ndarray,      # int32 [S, W]
    active: jnp.ndarray,   # bool [S]
    dtype,
) -> tuple:
    """Paged analogue of decoder.verify_step (models/decoder.py:597):
    W in-window writes scatter through the table (window rows may cross
    a page boundary); ``lengths`` is NOT advanced (caller commits)."""
    s, w = ids.shape
    page = cache.page_size
    start = cache.lengths
    rows = jnp.arange(w, dtype=jnp.int32)
    positions = start[:, None] + rows[None, :]              # [S, W]
    x = nn.embedding(params["embed"], ids, dtype)
    t_max = cache.max_len
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    mask = (key_pos[None, None, None, :] <= positions[:, None, :, None])
    slot_idx = jnp.arange(s)[:, None]
    page_ids = jnp.where(
        active[:, None], cache.table[slot_idx, positions // page], 0
    )                                                       # [S, W]
    offs = jnp.where(active[:, None], positions % page, 0)
    inv = 1.0 / math.sqrt(spec.head_dim)
    rep = spec.q_heads // spec.kv_heads
    use_fused = _use_fused_paged_attention(spec, page)

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = _project_qkv(spec, layer, h, dtype)
        q = qf.reshape(s, w, spec.q_heads, spec.head_dim)
        k = kf.reshape(s, w, spec.kv_heads, spec.head_dim)
        v = vf.reshape(s, w, spec.kv_heads, spec.head_dim)
        q = rope(q, positions)
        k = rope(k, positions)

        kq, kscale = _quantize_kv(k)   # [S, W, H, D], [S, W, H]
        vq, vscale = _quantize_kv(v)
        if cache.flat:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[page_ids, offs].set(_flat_rows(kq)),
                cache.v[li].at[page_ids, offs].set(_flat_rows(vq)),
                cache.k_scale[li].at[page_ids, :, offs].set(kscale),
                cache.v_scale[li].at[page_ids, :, offs].set(vscale),
            )
        else:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[page_ids, offs].set(kq),
                cache.v[li].at[page_ids, offs].set(vq),
                cache.k_scale[li].at[page_ids, offs].set(kscale),
                cache.v_scale[li].at[page_ids, offs].set(vscale),
            )

        if use_fused:
            from ..ops.decode_attention import paged_window_decode_attention

            attn = paged_window_decode_attention(
                q, cache.k[li], cache.v[li], cache.k_scale[li],
                cache.v_scale[li], cache.table, start, rep=rep,
            ).reshape(s, w, spec.q_heads * spec.head_dim).astype(dtype)
        else:
            k_all, v_all = _gather_std(spec, cache, li, dtype)
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)
            logits = jnp.einsum(
                "swhd,skhd->shwk", q, k_all, preferred_element_type=jnp.float32
            ) * inv
            logits = jnp.where(mask, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            attn = jnp.einsum(
                "shwk,skhd->swhd", probs, v_all,
                preferred_element_type=jnp.float32,
            ).reshape(s, w, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    x = rms_norm(params["final_norm"], x)
    logits = nn.dense(params["lm_head"], x.reshape(s * w, -1), dtype)
    return cache, logits.reshape(s, w, spec.vocab).astype(jnp.float32)


def _use_fused_paged_attention(spec: DecoderSpec, page_size: int) -> bool:
    """The paged Pallas kernels tile one pool page per grid step, so the
    page must be a lane-aligned chunk."""
    from ..ops import nn as _nn

    return (
        _nn.use_pallas()
        and spec.head_dim >= 64
        and page_size % 128 == 0
        and spec.q_heads % spec.kv_heads == 0
    )
