"""Llama-class decoder family with INT8 KV-cache serving support.

No reference counterpart (the reference serves encoder/classifier models
only, with no KV cache; SURVEY.md section 5.7) — this implements
BASELINE.json configs 4-5: decoder continuous batching with INT8
KV-cache and INT4/INT8 weights.

Architecture (the public Llama recipe): RMSNorm -> GQA attention with
rotary position embeddings -> residual, RMSNorm -> SwiGLU MLP ->
residual; no biases; tied-free LM head.

Serving design (TPU-first, static shapes throughout):

- the KV cache is a fixed [L, S, T, H_kv, D] tensor pair per k/v —
  S serving "slots" (concurrent sequences), T max context — quantized
  INT8 with one f32 scale per (layer, slot, position, head);
- ``prefill`` writes a whole padded prompt into one slot (one jit per
  prompt-length bucket);
- ``decode_step`` advances ALL slots one token in a single jitted call
  (the continuous-batching inner loop): inactive slots are masked, so
  admission/eviction never changes the compiled shape;
- cache updates donate the cache buffers, so XLA updates them in place.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn
from ..utils.config import TensorSpec
from .registry import ModelDefinition, register_family

# variant -> (hidden, layers, q_heads, kv_heads, intermediate, vocab,
#             num_experts, experts_per_token); num_experts 0 = dense MLP
_VARIANTS = {
    # tiny config for tests/CI
    "llama-tiny": (256, 4, 8, 4, 688, 2048, 0, 2),
    # ~1B class
    "llama-1b": (2048, 16, 32, 8, 5504, 32000, 0, 2),
    # ~7B class (llama-2-7b shapes)
    "llama-7b": (4096, 32, 32, 32, 11008, 32000, 0, 2),
    # MoE decoders (mixtral-style routed SwiGLU experts, top-2)
    "moe-tiny": (256, 4, 8, 4, 688, 2048, 4, 2),
    # ~8x1B class
    "moe-8x1b": (2048, 16, 32, 8, 5504, 32000, 8, 2),
    # mixtral-8x7b shapes
    "mixtral-8x7b": (4096, 32, 32, 8, 14336, 32000, 8, 2),
}

ROPE_THETA = 10000.0


@dataclasses.dataclass(frozen=True)
class DecoderSpec:
    hidden: int
    layers: int
    q_heads: int
    kv_heads: int
    intermediate: int
    vocab: int
    # mixture-of-experts MLP (0 experts = dense SwiGLU)
    num_experts: int = 0
    experts_per_token: int = 2

    def __post_init__(self):
        if self.num_experts and self.experts_per_token > self.num_experts:
            raise ValueError(
                f"experts_per_token ({self.experts_per_token}) cannot "
                f"exceed num_experts ({self.num_experts})"
            )

    @property
    def head_dim(self) -> int:
        return self.hidden // self.q_heads

    @property
    def is_moe(self) -> bool:
        return self.num_experts > 0


class KVCache(NamedTuple):
    """INT8 KV cache: values + per-(slot, pos, head) scales, plus the
    per-slot sequence lengths. Two layouts share this container:

    - LAYERED (default): ``k``/``v`` are length-L **tuples** of
      per-layer arrays int8 [S, T, H_kv, D] (scales f32 [S, T, H_kv]).
      Each step updates exactly one layer's buffer, which XLA aliases
      in place — ``cache.k[li]`` is a tuple index, not a slice, so
      nothing materializes and the whole-cache scatter copy-on-write
      that a stacked [L, ...] buffer provokes at S >= 32 cannot occur
      (VERDICT r4 item 4; the dense-16 layered-BlockSpec +35% carried
      to every slot count).
    - STACKED (pipe mode): single arrays with a leading [L] axis so the
      layer dim shards over the mesh 'pipe' axis
      (parallel/pipeline_decode.py keeps this layout).
    - FLAT (layered + ``flat=True``): per-layer leaves int8
      [S, T, H_kv*D] with scales f32 [S, H_kv, T]. Every minor dim is
      lane-aligned, so XLA's compact parameter layout IS the standard
      layout and standalone decode-block programs stop paying the
      whole-cache entry/exit layout conversion that the standard
      s8[..., H_kv, 64] shape provokes (~4.6 GB ≈ 56 ms per block at
      dense-128; see ops/decode_attention.py's flat-layout section and
      scripts/layout_pin_probe.py) — the structural version of the
      opt-in ``pin_cache_layouts`` fix, with no backend cooperation
      needed.
    """

    k: object             # tuple of int8 [S, T, H_kv, D] | int8 [L, S, T, H_kv, D]
    v: object
    k_scale: object       # tuple of f32 [S, T, H_kv] | f32 [L, S, T, H_kv]
    v_scale: object
    lengths: jnp.ndarray  # int32 [S]

    @property
    def layered(self) -> bool:
        return isinstance(self.k, (tuple, list))

    @property
    def flat(self) -> bool:
        return self.layered and self.k[0].ndim == 3

    @property
    def num_slots(self) -> int:
        return self.k[0].shape[0] if self.layered else self.k.shape[1]

    @property
    def max_len(self) -> int:
        return self.k[0].shape[1] if self.layered else self.k.shape[2]


def _flat_rows(t: jnp.ndarray) -> jnp.ndarray:
    """[..., H, D] new-token K/V -> [..., H*D] flat rows."""
    return t.reshape(t.shape[:-2] + (t.shape[-2] * t.shape[-1],))


def _std_kv_view(spec: DecoderSpec, a: jnp.ndarray) -> jnp.ndarray:
    """FLAT [..., T, H*D] -> standard [..., T, H, D] view (fallback
    paths only; materializes a relayout inside the program)."""
    return a.reshape(a.shape[:-1] + (spec.kv_heads, spec.head_dim))


def _std_scale_view(a: jnp.ndarray) -> jnp.ndarray:
    """FLAT scales [..., H, T] -> standard [..., T, H]."""
    return jnp.swapaxes(a, -1, -2)


def init_cache(spec: DecoderSpec, num_slots: int, max_len: int,
               stacked: bool = False, flat: bool = False) -> KVCache:
    shape = (num_slots, max_len, spec.kv_heads, spec.head_dim)
    if stacked:
        if flat:
            raise ValueError(
                "flat cache layout does not compose with the stacked "
                "(pipe-mode) layout: the pipe stages' cache specs shard "
                "the head axis over 'model', which the flat [T, H*D] "
                "rows fold away"
            )
        return KVCache(
            k=jnp.zeros((spec.layers,) + shape, jnp.int8),
            v=jnp.zeros((spec.layers,) + shape, jnp.int8),
            k_scale=jnp.zeros((spec.layers,) + shape[:-1], jnp.float32),
            v_scale=jnp.zeros((spec.layers,) + shape[:-1], jnp.float32),
            lengths=jnp.zeros((num_slots,), jnp.int32),
        )
    if flat:
        fshape = (num_slots, max_len, spec.kv_heads * spec.head_dim)
        sshape = (num_slots, spec.kv_heads, max_len)
        return KVCache(
            k=tuple(jnp.zeros(fshape, jnp.int8) for _ in range(spec.layers)),
            v=tuple(jnp.zeros(fshape, jnp.int8) for _ in range(spec.layers)),
            k_scale=tuple(jnp.zeros(sshape, jnp.float32)
                          for _ in range(spec.layers)),
            v_scale=tuple(jnp.zeros(sshape, jnp.float32)
                          for _ in range(spec.layers)),
            lengths=jnp.zeros((num_slots,), jnp.int32),
        )
    return KVCache(
        k=tuple(jnp.zeros(shape, jnp.int8) for _ in range(spec.layers)),
        v=tuple(jnp.zeros(shape, jnp.int8) for _ in range(spec.layers)),
        k_scale=tuple(jnp.zeros(shape[:-1], jnp.float32)
                      for _ in range(spec.layers)),
        v_scale=tuple(jnp.zeros(shape[:-1], jnp.float32)
                      for _ in range(spec.layers)),
        lengths=jnp.zeros((num_slots,), jnp.int32),
    )


def stack_cache(cache: KVCache) -> KVCache:
    """LAYERED -> STACKED conversion (materializes one [L, ...] buffer
    per tensor; pipe-mode interop and tests only — the serving paths
    never convert)."""
    if not cache.layered:
        return cache
    if cache.flat:
        raise ValueError("flat cache layout cannot be stacked (pipe mode)")
    return cache._replace(
        k=jnp.stack(cache.k), v=jnp.stack(cache.v),
        k_scale=jnp.stack(cache.k_scale), v_scale=jnp.stack(cache.v_scale),
    )


def _with_layer(cache: KVCache, li: int, k, v, k_scale, v_scale) -> KVCache:
    """Functional single-layer update of a LAYERED cache (tuple fields;
    ``li`` is a Python int — the layer loop is unrolled)."""
    return cache._replace(
        k=cache.k[:li] + (k,) + cache.k[li + 1:],
        v=cache.v[:li] + (v,) + cache.v[li + 1:],
        k_scale=cache.k_scale[:li] + (k_scale,) + cache.k_scale[li + 1:],
        v_scale=cache.v_scale[:li] + (v_scale,) + cache.v_scale[li + 1:],
    )


# -- params ----------------------------------------------------------------

def _linear(rng, cin, cout):
    return {"w": (rng.standard_normal((cin, cout)) * (1.0 / math.sqrt(cin))).astype(np.float32)}


def init_params(spec: DecoderSpec, rng: np.random.Generator):
    """Param layout uses FUSED projections — qkv as one [H, (Hq+2Hkv)*D]
    matrix and gate+up as one [H, 2*I] — so a decode step issues one
    matmul where three (resp. two) would otherwise launch. Per-channel
    quantization scales are per output column, so fusion commutes with
    quantization. scripts/import_weights.py concatenates per-projection
    checkpoints into this layout."""
    qkv_out = (spec.q_heads + 2 * spec.kv_heads) * spec.head_dim
    layers = []
    for _ in range(spec.layers):
        if spec.is_moe:
            # stacked expert tensors [E, in, out]: one einsum computes every
            # LOCAL expert (the E axis shards over the mesh 'expert' axis),
            # instead of E small matmuls that XLA can't batch
            e = spec.num_experts
            scale_g = 1.0 / math.sqrt(spec.hidden)
            scale_d = 1.0 / math.sqrt(spec.intermediate)
            mlp = {
                "router": _linear(rng, spec.hidden, e),
                "experts": {
                    "gate_up": {"w": (rng.standard_normal(
                        (e, spec.hidden, 2 * spec.intermediate)) * scale_g
                    ).astype(np.float32)},
                    "down": {"w": (rng.standard_normal(
                        (e, spec.intermediate, spec.hidden)) * scale_d
                    ).astype(np.float32)},
                },
            }
        else:
            mlp = {
                "gate_up": _linear(rng, spec.hidden, 2 * spec.intermediate),
                "down": _linear(rng, spec.intermediate, spec.hidden),
            }
        layers.append({
            "attn_norm": {"gamma": np.ones((spec.hidden,), np.float32)},
            "attn": {
                "qkv": _linear(rng, spec.hidden, qkv_out),
                "o": _linear(rng, spec.q_heads * spec.head_dim, spec.hidden),
            },
            "mlp_norm": {"gamma": np.ones((spec.hidden,), np.float32)},
            "mlp": mlp,
        })
    return {
        "embed": {"w": (rng.standard_normal((spec.vocab, spec.hidden)) * 0.02).astype(np.float32)},
        "layers": layers,
        "final_norm": {"gamma": np.ones((spec.hidden,), np.float32)},
        "lm_head": _linear(rng, spec.hidden, spec.vocab),
    }


def _project_qkv(spec: DecoderSpec, layer, h, dtype):
    """One fused matmul -> (q, k, v) column slices."""
    fused = nn.dense(layer["attn"]["qkv"], h, dtype)
    dq = spec.q_heads * spec.head_dim
    dkv = spec.kv_heads * spec.head_dim
    return (
        fused[..., :dq],
        fused[..., dq : dq + dkv],
        fused[..., dq + dkv :],
    )


def _fused_mlp(layer, x, dtype):
    fused = nn.dense(layer["mlp"]["gate_up"], x, dtype)
    inter = fused.shape[-1] // 2
    gate, up = fused[..., :inter], fused[..., inter:]
    act = jax.nn.silu(gate.astype(jnp.float32)).astype(dtype) * up
    return nn.dense(layer["mlp"]["down"], act, dtype)


def _moe_mlp(spec: DecoderSpec, layer, x, dtype):
    """Mixtral-style routed SwiGLU MoE, dense-dispatch form.

    TPU-first design: instead of gather/scatter token routing (dynamic
    shapes XLA can't tile), every expert computes every token through ONE
    batched einsum over the stacked [E, in, out] weights and the top-k
    routing weights zero out the rest in the combine einsum. Under
    expert-parallel sharding (partition.py shards the E axis over the
    mesh 'expert' axis) each device touches only its local experts' HBM
    and the combine's E-reduction becomes the single psum GSPMD inserts.
    No reference counterpart (encoder models only; SURVEY.md section 2.9
    lists EP as a TPU-native extension axis)."""
    moe = layer["mlp"]
    lead = x.shape[:-1]
    xf = x.reshape(-1, x.shape[-1])  # [T, H]
    logits = nn.dense(moe["router"], xf, dtype).astype(jnp.float32)  # [T, E]
    probs = jax.nn.softmax(logits, axis=-1)
    vals, idx = jax.lax.top_k(probs, spec.experts_per_token)  # [T, k]
    vals = vals / jnp.sum(vals, axis=-1, keepdims=True)
    combine = jnp.sum(
        jax.nn.one_hot(idx, spec.num_experts, dtype=jnp.float32)
        * vals[..., None],
        axis=1,
    )  # [T, E]
    wg = nn.resolve_weight(moe["experts"]["gate_up"]["w"], dtype)  # [E,H,2I]
    wd = nn.resolve_weight(moe["experts"]["down"]["w"], dtype)     # [E,I,H]
    h = jnp.einsum(
        "th,ehf->etf", xf.astype(dtype), wg, preferred_element_type=jnp.float32
    )
    inter = h.shape[-1] // 2
    act = (jax.nn.silu(h[..., :inter]) * h[..., inter:]).astype(dtype)
    y = jnp.einsum("eti,eih->eth", act, wd, preferred_element_type=jnp.float32)
    y = jnp.einsum("te,eth->th", combine, y)  # reduce over E: EP's one psum
    return y.reshape(*lead, x.shape[-1]).astype(dtype)


def _mlp_block(spec: DecoderSpec, layer, x, dtype):
    """Dense or routed MLP, decided by the param-tree structure (static
    under jit)."""
    if "router" in layer["mlp"]:
        return _moe_mlp(spec, layer, x, dtype)
    return _fused_mlp(layer, x, dtype)


# -- building blocks -------------------------------------------------------

def rms_norm(p, x, eps=1e-5):
    xf = x.astype(jnp.float32)
    scale = jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf * scale * p["gamma"].astype(jnp.float32)).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray) -> jnp.ndarray:
    """Rotary embedding. x: [..., T, H, D]; positions: [..., T]."""
    d = x.shape[-1]
    half = d // 2
    freqs = ROPE_THETA ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[..., None].astype(jnp.float32) * freqs  # [..., T, half]
    cos = jnp.cos(angles)[..., None, :]  # [..., T, 1, half]
    sin = jnp.sin(angles)[..., None, :]
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(jnp.float32)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x1 * sin + x2 * cos], axis=-1
    ).astype(x.dtype)


def _quantize_kv(t: jnp.ndarray):
    """Per-(token, head) symmetric int8: t [..., H, D] ->
    (int8 values, f32 scale[..., H])."""
    absmax = jnp.max(jnp.abs(t.astype(jnp.float32)), axis=-1)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(
        jnp.round(t.astype(jnp.float32) / scale[..., None]), -127, 127
    ).astype(jnp.int8)
    return q, scale


def _dequantize_kv(q: jnp.ndarray, scale: jnp.ndarray, dtype):
    return (q.astype(jnp.float32) * scale[..., None]).astype(dtype)


# -- full (teacher-forcing) forward: the registry-visible apply ------------

def forward_logits(spec: DecoderSpec, params, ids: jnp.ndarray, dtype) -> jnp.ndarray:
    """Causal forward over a [B, T] batch, returns [B, T, vocab] logits."""
    b, t = ids.shape
    positions = jnp.arange(t, dtype=jnp.int32)[None, :].repeat(b, axis=0)
    x = nn.embedding(params["embed"], ids, dtype)
    causal = jnp.tril(jnp.ones((t, t), bool))[None, None]
    for layer in params["layers"]:
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = _project_qkv(spec, layer, h, dtype)
        q = qf.reshape(b, t, spec.q_heads, spec.head_dim)
        k = kf.reshape(b, t, spec.kv_heads, spec.head_dim)
        v = vf.reshape(b, t, spec.kv_heads, spec.head_dim)
        q = rope(q, positions)
        k = rope(k, positions)
        rep = spec.q_heads // spec.kv_heads
        if _use_fused_prefill_attention(spec, t):
            from ..ops.prefill_attention import causal_attention

            attn = causal_attention(q, k, v, rep=rep, out_dtype=dtype)
        else:
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
            logits = logits / math.sqrt(spec.head_dim)
            logits = jnp.where(causal, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, v, preferred_element_type=jnp.float32)
        attn = attn.reshape(b, t, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)
    x = rms_norm(params["final_norm"], x)
    return nn.dense(params["lm_head"], x, dtype).astype(jnp.float32)


# -- prefill: write a prompt into one cache slot ---------------------------

def prefill(
    spec: DecoderSpec,
    params,
    cache: KVCache,
    ids: jnp.ndarray,      # int32 [P] padded prompt
    length: jnp.ndarray,   # int32 scalar: true prompt length
    slot: jnp.ndarray,     # int32 scalar: target slot
    dtype,
) -> tuple:
    """Returns (cache', last_logits [vocab])."""
    p = ids.shape[0]
    positions = jnp.arange(p, dtype=jnp.int32)
    x = nn.embedding(params["embed"], ids[None, :], dtype)  # [1, P, D]
    valid = positions < length
    causal = (jnp.tril(jnp.ones((p, p), bool)) & valid[None, :])[None, None]

    zero = jnp.zeros((), jnp.int32)
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
        # write this layer's prompt KV into slot rows [0, P) as we go:
        # per-layer buffers update in place (rows past ``length`` keep
        # stale values that are overwritten before they can be attended
        # — the standard mask/write-ordering invariant)
        if cache.flat:
            cache = _with_layer(
                cache, li,
                jax.lax.dynamic_update_slice(
                    cache.k[li], _flat_rows(kq)[None], (slot, zero, zero)),
                jax.lax.dynamic_update_slice(
                    cache.v[li], _flat_rows(vq)[None], (slot, zero, zero)),
                jax.lax.dynamic_update_slice(
                    cache.k_scale[li], kscale.T[None], (slot, zero, zero)),
                jax.lax.dynamic_update_slice(
                    cache.v_scale[li], vscale.T[None], (slot, zero, zero)),
            )
        else:
            cache = _with_layer(
                cache, li,
                jax.lax.dynamic_update_slice(cache.k[li], kq[None],
                                             (slot, zero, zero, zero)),
                jax.lax.dynamic_update_slice(cache.v[li], vq[None],
                                             (slot, zero, zero, zero)),
                jax.lax.dynamic_update_slice(cache.k_scale[li], kscale[None],
                                             (slot, zero, zero)),
                jax.lax.dynamic_update_slice(cache.v_scale[li], vscale[None],
                                             (slot, zero, zero)),
            )
        rep = spec.q_heads // spec.kv_heads
        if _use_fused_prefill_attention(spec, p):
            from ..ops.prefill_attention import causal_attention

            # pure-causal == causal&valid for every row < length (rows
            # past length are garbage either way, never read)
            attn = causal_attention(q, k, v, rep=rep, out_dtype=dtype)
        else:
            kf = jnp.repeat(k, rep, axis=2)
            vf = jnp.repeat(v, rep, axis=2)
            logits = jnp.einsum("bqhd,bkhd->bhqk", q, kf, preferred_element_type=jnp.float32)
            logits = logits / math.sqrt(spec.head_dim)
            logits = jnp.where(causal, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", probs, vf, preferred_element_type=jnp.float32)
        attn = attn.reshape(1, p, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    cache = cache._replace(lengths=cache.lengths.at[slot].set(length))
    x = rms_norm(params["final_norm"], x)
    last = x[0, length - 1]
    logits = nn.dense(params["lm_head"], last[None, :], dtype)[0]
    return cache, logits.astype(jnp.float32)


# -- chunked prefill: write one prompt chunk into a cache slot --------------

def prefill_chunk(
    spec: DecoderSpec,
    params,
    cache: KVCache,
    ids: jnp.ndarray,      # int32 [C] chunk tokens (tail chunk zero-padded)
    start: jnp.ndarray,    # int32 scalar: absolute offset of this chunk
    valid: jnp.ndarray,    # int32 scalar: real tokens in this chunk (<= C)
    slot: jnp.ndarray,     # int32 scalar: target slot
    dtype,
) -> tuple:
    """Process ``C`` prompt tokens at absolute positions
    ``start..start+C-1`` and write their INT8 KV into slot row
    ``[start, start+C)``. Returns ``(cache', logits[vocab])`` where the
    logits are for chunk row ``valid-1`` (only meaningful on the final
    chunk).

    Attention is two-part: keys before ``start`` are read back from the
    INT8 cache row (same numerics as decode), in-chunk keys stay at
    compute precision with a causal mask — so a single-chunk prefill is
    numerically identical to :func:`prefill`. Chunking lets the engine
    interleave decode blocks between chunks of a long prompt instead of
    stalling every active sequence for the whole prompt (the reference
    has no decoders; this serves SURVEY.md section 5.7's long-context
    capability axis)."""
    c = ids.shape[0]
    t_max = cache.max_len
    rows = jnp.arange(c, dtype=jnp.int32)
    positions = start + rows
    x = nn.embedding(params["embed"], ids[None, :], dtype)  # [1, C, D]
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    # past keys: everything the slot accumulated before this chunk
    past_mask = (key_pos[None, :] < start)[None, None]          # [1,1,C→bc,T]
    # in-chunk causal (padding rows produce garbage that is never used)
    cur_mask = jnp.tril(jnp.ones((c, c), bool))[None, None]     # [1,1,C,C]
    inv = 1.0 / math.sqrt(spec.head_dim)
    rep = spec.q_heads // spec.kv_heads

    for li, layer in enumerate(params["layers"]):
        h = rms_norm(layer["attn_norm"], x)
        qf, kf, vf = _project_qkv(spec, layer, h, dtype)
        q = qf.reshape(1, c, spec.q_heads, spec.head_dim)
        k = kf.reshape(1, c, spec.kv_heads, spec.head_dim)
        v = vf.reshape(1, c, spec.kv_heads, spec.head_dim)
        q = rope(q, positions[None])
        k = rope(k, positions[None])

        kq, kscale = _quantize_kv(k[0])   # [C, H_kv, D], [C, H_kv]
        vq, vscale = _quantize_kv(v[0])
        zero = jnp.zeros((), jnp.int32)
        if cache.flat:
            cache = _with_layer(
                cache, li,
                jax.lax.dynamic_update_slice(
                    cache.k[li], _flat_rows(kq)[None], (slot, start, zero)),
                jax.lax.dynamic_update_slice(
                    cache.v[li], _flat_rows(vq)[None], (slot, start, zero)),
                jax.lax.dynamic_update_slice(
                    cache.k_scale[li], kscale.T[None], (slot, zero, start)),
                jax.lax.dynamic_update_slice(
                    cache.v_scale[li], vscale.T[None], (slot, zero, start)),
            )
            # standard-shape views of the slot's row for the attention
            # read-back (one small relayout temp per layer — prefill is
            # compute-bound, the FLAT win is on the decode hot path)
            row_ck = _std_kv_view(spec, cache.k[li][slot])
            row_cv = _std_kv_view(spec, cache.v[li][slot])
            row_cks = _std_scale_view(cache.k_scale[li][slot])
            row_cvs = _std_scale_view(cache.v_scale[li][slot])
        else:
            cache = _with_layer(
                cache, li,
                jax.lax.dynamic_update_slice(cache.k[li], kq[None],
                                             (slot, start, zero, zero)),
                jax.lax.dynamic_update_slice(cache.v[li], vq[None],
                                             (slot, start, zero, zero)),
                jax.lax.dynamic_update_slice(cache.k_scale[li], kscale[None],
                                             (slot, start, zero)),
                jax.lax.dynamic_update_slice(cache.v_scale[li], vscale[None],
                                             (slot, start, zero)),
            )
            row_ck = cache.k[li][slot]
            row_cv = cache.v[li][slot]
            row_cks = cache.k_scale[li][slot]
            row_cvs = cache.v_scale[li][slot]

        if _use_fused_prefill_attention(spec, t_max, min_seq=512):
            from ..ops.prefill_attention import chunk_prefill_attention

            attn = chunk_prefill_attention(
                q[0], row_ck, row_cv, row_cks, row_cvs,
                k[0], v[0], start, rep=rep, out_dtype=dtype,
            ).reshape(1, c, spec.q_heads * spec.head_dim)
        else:
            # past attention over the INT8 cache row (positions < start)
            row_k = _dequantize_kv(row_ck, row_cks, dtype)  # [T,H,D]
            row_v = _dequantize_kv(row_cv, row_cvs, dtype)
            row_k = jnp.repeat(row_k, rep, axis=1)[None]
            row_v = jnp.repeat(row_v, rep, axis=1)[None]
            s_past = jnp.einsum("bqhd,bkhd->bhqk", q, row_k, preferred_element_type=jnp.float32) * inv
            s_past = jnp.where(past_mask, s_past, -1e9)
            # in-chunk attention at compute precision
            kc = jnp.repeat(k, rep, axis=2)
            vc = jnp.repeat(v, rep, axis=2)
            s_cur = jnp.einsum("bqhd,bkhd->bhqk", q, kc, preferred_element_type=jnp.float32) * inv
            s_cur = jnp.where(cur_mask, s_cur, -1e9)
            probs = jax.nn.softmax(
                jnp.concatenate([s_past, s_cur], axis=-1), axis=-1
            ).astype(dtype)
            p_past, p_cur = probs[..., :t_max], probs[..., t_max:]
            attn = jnp.einsum("bhqk,bkhd->bqhd", p_past, row_v, preferred_element_type=jnp.float32)
            attn = attn + jnp.einsum("bhqk,bkhd->bqhd", p_cur, vc, preferred_element_type=jnp.float32)
            attn = attn.reshape(1, c, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    cache = cache._replace(lengths=cache.lengths.at[slot].set(start + valid))
    x = rms_norm(params["final_norm"], x)
    last = x[0, valid - 1]
    logits = nn.dense(params["lm_head"], last[None, :], dtype)[0]
    return cache, logits.astype(jnp.float32)


def _use_fused_decode_attention(spec: DecoderSpec, t_max: int) -> bool:
    """Route decode attention through the Pallas fused INT8-KV kernel
    (ops/decode_attention.py) when enabled and the shapes fit its tiling
    (head_dim >= 64, context a multiple of 128)."""
    from ..ops import nn as _nn

    return (
        _nn.use_pallas()
        and spec.head_dim >= 64
        and t_max % 128 == 0
        and spec.q_heads % spec.kv_heads == 0
    )


def _use_fused_prefill_attention(
    spec: DecoderSpec, seq: int, min_seq: int = 256
) -> bool:
    """Route prefill attention through the Pallas flash kernels
    (ops/prefill_attention.py) when enabled, the sequence fits the
    tiling, and the shape is where the kernel measured ahead of XLA
    (v5e, llama-1b heads: ~tie at 512, 1.76x at 1024, 4.3x at 2048 —
    below ``min_seq`` XLA's fused attention already wins)."""
    from ..ops import nn as _nn

    return (
        _nn.use_pallas()
        and spec.head_dim >= 64
        and seq >= min_seq
        and seq % 128 == 0
        and spec.q_heads % spec.kv_heads == 0
    )


# -- decode: advance every active slot one token ---------------------------

def decode_step(
    spec: DecoderSpec,
    params,
    cache: KVCache,
    ids: jnp.ndarray,      # int32 [S] current token per slot
    active: jnp.ndarray,   # bool [S]
    dtype,
) -> tuple:
    """Returns (cache', logits [S, vocab]). Inactive slots are computed
    but masked (static shapes; the continuous-batching contract)."""
    s = ids.shape[0]
    positions = cache.lengths  # new token goes at index ``length``
    x = nn.embedding(params["embed"], ids[:, None], dtype)  # [S, 1, D]
    t_max = cache.max_len
    key_pos = jnp.arange(t_max, dtype=jnp.int32)[None, :]  # [1, T]
    # attend to cached positions < length, plus the new token at ``length``
    mask = (key_pos <= positions[:, None])[:, None, None, :]  # [S,1,1,T]

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
        # scatter the new token at (slot s, position lengths[s]); INACTIVE
        # slots park their (discarded) write at t_max-1 so a decode block
        # interleaved with another slot's chunked prefill can never clobber
        # that slot's freshly written prompt rows. Position t_max-1 is safe:
        # it is rewritten by the slot's own decode step before it is ever
        # attended (mask is key_pos <= length, writes precede the attend).
        slot_idx = jnp.arange(s)
        write_pos = jnp.where(active, positions, t_max - 1)
        if cache.flat:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[slot_idx, write_pos].set(_flat_rows(kq)),
                cache.v[li].at[slot_idx, write_pos].set(_flat_rows(vq)),
                cache.k_scale[li].at[slot_idx, :, write_pos].set(kscale),
                cache.v_scale[li].at[slot_idx, :, write_pos].set(vscale),
            )
        else:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[slot_idx, write_pos].set(kq),
                cache.v[li].at[slot_idx, write_pos].set(vq),
                cache.k_scale[li].at[slot_idx, write_pos].set(kscale),
                cache.v_scale[li].at[slot_idx, write_pos].set(vscale),
            )

        rep = spec.q_heads // spec.kv_heads
        if _use_fused_decode_attention(spec, t_max):
            from ..ops.decode_attention import decode_attention

            # LAYERED cache: cache.k[li] is a tuple index onto this
            # layer's own buffer — no slice materializes and the
            # per-layer scatter aliases in place at EVERY slot count
            # (the r4 layered-BlockSpec win without its S<=16 gate;
            # VERDICT r4 item 4). Uses the slot-GROUPED kernel grid.
            attn = decode_attention(
                q[:, 0],
                cache.k[li],
                cache.v[li],
                cache.k_scale[li],
                cache.v_scale[li],
                positions,
                rep=rep,
            ).reshape(s, 1, spec.q_heads * spec.head_dim).astype(dtype)
        else:
            if cache.flat:
                k_all = _dequantize_kv(
                    _std_kv_view(spec, cache.k[li]),
                    _std_scale_view(cache.k_scale[li]), dtype)  # [S,T,H,D]
                v_all = _dequantize_kv(
                    _std_kv_view(spec, cache.v[li]),
                    _std_scale_view(cache.v_scale[li]), dtype)
            else:
                k_all = _dequantize_kv(cache.k[li], cache.k_scale[li], dtype)
                v_all = _dequantize_kv(cache.v[li], cache.v_scale[li], dtype)
            k_all = jnp.repeat(k_all, rep, axis=2)
            v_all = jnp.repeat(v_all, rep, axis=2)
            logits = jnp.einsum(
                "sqhd,skhd->shqk", q, k_all, preferred_element_type=jnp.float32
            ) / math.sqrt(spec.head_dim)
            logits = jnp.where(mask, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            attn = jnp.einsum(
                "shqk,skhd->sqhd", probs, v_all, preferred_element_type=jnp.float32
            ).reshape(s, 1, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    x = rms_norm(params["final_norm"], x)
    logits = nn.dense(params["lm_head"], x[:, 0], dtype).astype(jnp.float32)
    new_lengths = jnp.where(active, cache.lengths + 1, cache.lengths)
    return cache._replace(lengths=new_lengths), logits


# -- verify: score a window of draft tokens against the target model -------

def verify_step(
    spec: DecoderSpec,
    params,
    cache: KVCache,
    ids: jnp.ndarray,      # int32 [S, W]: row i's token sits at lengths+i
    active: jnp.ndarray,   # bool [S]
    dtype,
) -> tuple:
    """Speculative-decoding verification forward: advance every active
    slot ``W`` tokens in ONE call and return the logits after each.

    Returns ``(cache', logits [S, W, vocab])``. KV for all ``W``
    positions is written (rows ``lengths .. lengths+W-1``), but
    ``lengths`` is NOT advanced — the caller commits only the accepted
    prefix by setting ``lengths``; stale rows past the commit point are
    overwritten by that slot's next write before they can be attended
    (the same mask/write ordering argument as :func:`decode_step`).

    Numerics match ``decode_step`` run sequentially: every key/value —
    including the in-window ones — round-trips the INT8 cache before it
    is attended, so greedy acceptance compares like against like.

    No reference counterpart (the reference serves encoder models only,
    SURVEY.md section 5.7); this is the continuous-batching extension's
    speculative-decoding lever.
    """
    s, w = ids.shape
    start = cache.lengths
    rows = jnp.arange(w, dtype=jnp.int32)
    positions = start[:, None] + rows[None, :]              # [S, W]
    x = nn.embedding(params["embed"], ids, dtype)           # [S, W, D]
    t_max = cache.max_len
    key_pos = jnp.arange(t_max, dtype=jnp.int32)
    # query row i attends cache positions <= lengths+i: the past plus the
    # in-window tokens written earlier this step
    mask = (key_pos[None, None, None, :] <= positions[:, None, :, None])
    slot_idx = jnp.arange(s)
    # inactive slots park their (discarded) writes at t_max-1, exactly
    # like decode_step, so they can never clobber a live row
    write_pos = jnp.where(active[:, None], positions, t_max - 1)  # [S, W]
    inv = 1.0 / math.sqrt(spec.head_dim)
    rep = spec.q_heads // spec.kv_heads

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
        sl = slot_idx[:, None]
        if cache.flat:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[sl, write_pos].set(_flat_rows(kq)),
                cache.v[li].at[sl, write_pos].set(_flat_rows(vq)),
                cache.k_scale[li].at[sl, :, write_pos].set(kscale),
                cache.v_scale[li].at[sl, :, write_pos].set(vscale),
            )
        else:
            cache = _with_layer(
                cache, li,
                cache.k[li].at[sl, write_pos].set(kq),
                cache.v[li].at[sl, write_pos].set(vq),
                cache.k_scale[li].at[sl, write_pos].set(kscale),
                cache.v_scale[li].at[sl, write_pos].set(vscale),
            )

        if _use_fused_decode_attention(spec, t_max):
            from ..ops.decode_attention import window_decode_attention

            attn = window_decode_attention(
                q, cache.k[li], cache.v[li], cache.k_scale[li],
                cache.v_scale[li], start, rep=rep,
            ).reshape(s, w, spec.q_heads * spec.head_dim).astype(dtype)
        else:
            if cache.flat:
                k_all = _dequantize_kv(
                    _std_kv_view(spec, cache.k[li]),
                    _std_scale_view(cache.k_scale[li]), dtype)
                v_all = _dequantize_kv(
                    _std_kv_view(spec, cache.v[li]),
                    _std_scale_view(cache.v_scale[li]), dtype)
            else:
                k_all = _dequantize_kv(cache.k[li], cache.k_scale[li], dtype)
                v_all = _dequantize_kv(cache.v[li], cache.v_scale[li], dtype)
            k_all = jnp.repeat(k_all, rep, axis=2)  # [S, T, Hq, D]
            v_all = jnp.repeat(v_all, rep, axis=2)
            logits = jnp.einsum(
                "swhd,skhd->shwk", q, k_all, preferred_element_type=jnp.float32
            ) * inv
            logits = jnp.where(mask, logits, -1e9)
            probs = jax.nn.softmax(logits, axis=-1).astype(dtype)
            attn = jnp.einsum(
                "shwk,skhd->swhd", probs, v_all, preferred_element_type=jnp.float32
            ).reshape(s, w, spec.q_heads * spec.head_dim).astype(dtype)
        x = x + nn.dense(layer["attn"]["o"], attn, dtype)
        h = rms_norm(layer["mlp_norm"], x)
        x = x + _mlp_block(spec, layer, h, dtype)

    x = rms_norm(params["final_norm"], x)
    logits = nn.dense(params["lm_head"], x.reshape(s * w, -1), dtype)
    return cache, logits.reshape(s, w, spec.vocab).astype(jnp.float32)


# -- registry glue ---------------------------------------------------------

def get_spec(variant: str, options) -> DecoderSpec:
    hidden, layers, qh, kvh, inter, vocab, experts, top_k = _VARIANTS[variant]
    return DecoderSpec(
        hidden=int(options.get("hidden", hidden)),
        layers=int(options.get("layers", layers)),
        q_heads=int(options.get("q_heads", qh)),
        kv_heads=int(options.get("kv_heads", kvh)),
        intermediate=int(options.get("intermediate", inter)),
        vocab=int(options.get("vocab", vocab)),
        num_experts=int(options.get("num_experts", experts)),
        experts_per_token=int(options.get("experts_per_token", top_k)),
    )


def rig_copy_model(spec: DecoderSpec, params, cycle_len: int):
    """Benchmark rig: make GREEDY output follow permutation cycles of
    ``cycle_len`` while keeping every matmul at full shape (zeroed
    residual-write projections + permuted-embedding lm head) — a
    synthetic generator of repetition-heavy output at the real model's
    per-forward cost. Pretrained checkpoints are unreachable offline
    and random weights cannot restate spans, so this is how the
    prompt-lookup speculation workload (doc-QA/extraction-style
    repetition) is produced for A/Bs (scripts/lookup_ab.py,
    scripts/serving_series.py --lookup). Never enable for accuracy
    work."""
    import numpy as np

    L = int(cycle_len)
    v = spec.vocab - spec.vocab % L
    perm = np.arange(spec.vocab)
    blocks = perm[:v].reshape(-1, L)
    perm[:v] = np.roll(blocks, -1, axis=1).reshape(-1)
    inv = np.argsort(perm)
    for layer in params["layers"]:
        layer["attn"]["o"]["w"][:] = 0
        layer["mlp"]["down"]["w"][:] = 0
    params["lm_head"]["w"] = np.ascontiguousarray(
        params["embed"]["w"][inv].T
    )
    return params


def _build_decoder(variant: str, options) -> ModelDefinition:
    spec = get_spec(variant, options)
    seq_len = int(options.get("seq_len", 128))
    copy_cycle = int(options.get("copy_model_cycle", 0))

    def init(rng):
        params = init_params(spec, rng)
        if copy_cycle:
            params = rig_copy_model(spec, params, copy_cycle)
        return params

    def apply(params, inputs, dtype):
        ids = inputs["input_ids"].astype(jnp.int32)
        return {"logits": forward_logits(spec, params, ids, dtype)}

    def pipeline_apply(params, inputs, mesh, num_microbatches, dtype):
        from ..parallel.pipeline import pipelined_decoder_logits

        ids = inputs["input_ids"].astype(jnp.int32)
        return {
            "logits": pipelined_decoder_logits(
                spec, params, ids, mesh, num_microbatches, dtype
            )
        }

    def tp_layer_shuffle(layer, tp):
        from ..parallel.tp_layout import (
            shuffle_decoder_layer_for_tp,
            validate_decoder_tp,
        )

        validate_decoder_tp(spec, tp)
        return shuffle_decoder_layer_for_tp(spec, layer, tp)

    return ModelDefinition(
        family=variant,
        init_params=init,
        apply=apply,
        input_specs=(TensorSpec("input_ids", (seq_len,), "INT64"),),
        output_specs=(TensorSpec("logits", (seq_len, spec.vocab), "FP32"),),
        supports_generation=True,
        pipeline_apply=pipeline_apply,
        tp_layer_shuffle=tp_layer_shuffle,
    )


for _variant in _VARIANTS:
    register_family(_variant)(
        lambda options, _v=_variant: _build_decoder(_v, options)
    )
