"""Continuous-batching generation engine for decoder models.

No reference counterpart (SURVEY.md section 5.7: the reference has no
decoders and no KV cache) — this is the BASELINE.json continuous-batching
requirement. Design:

- a fixed pool of KV-cache SLOTS (static shapes; admission/eviction
  never triggers recompilation);
- the engine thread loop: admit pending prompts into free slots
  (one jitted ``prefill`` per prompt-length bucket), then advance every
  active slot one token with a single jitted ``decode_step`` whose cache
  arguments are DONATED, so XLA updates the cache in place;
- greedy argmax sampling happens on device; only the [S] next-token
  vector syncs to host per step;
- per-request token streams with EOS / max-new-tokens termination.
"""

from __future__ import annotations

import concurrent.futures
import dataclasses
import threading
from collections import deque
from functools import partial
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import (
    DecoderSpec,
    KVCache,
    decode_step,
    init_cache,
    prefill,
    verify_step,
)
from ..models.decoder import prefill_chunk as prefill_chunk_step
from ..utils.clock import now_s
from ..utils.logger import get_logger


def _sample_tokens(logits, temps, top_k, step_keys):
    """Per-slot token selection on device: greedy argmax where
    temperature is 0, temperature/top-k categorical sampling elsewhere.
    logits f32 [S, V], temps f32 [S], top_k int32 [S], step_keys [S]."""
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    temp = jnp.maximum(temps, 1e-6)[:, None]
    scaled = logits / temp
    # top-k: mask everything below the k-th logit (per slot)
    sorted_desc = jnp.sort(scaled, axis=-1)[:, ::-1]
    k_idx = jnp.clip(top_k - 1, 0, scaled.shape[-1] - 1)
    kth = jnp.take_along_axis(sorted_desc, k_idx[:, None], axis=-1)
    masked = jnp.where((top_k[:, None] > 0) & (scaled < kth), -jnp.inf, scaled)
    sampled = jax.vmap(
        lambda key, lg: jax.random.categorical(key, lg)
    )(step_keys, masked).astype(jnp.int32)
    return jnp.where(temps > 0, sampled, greedy)


def _ngram_drafts(history, len_h, k: int, n: int):
    """Prompt-lookup draft proposal, fully on device.

    ``history`` int32 [S, T] holds each slot's prompt + emitted tokens;
    ``len_h`` int32 [S] is the number of valid tokens (the last one is
    the current input token). The query is the trailing ``n``-gram;
    every window position p < len_h - n is compared and the MOST RECENT
    match wins (recent context predicts the continuation best). The
    ``k`` tokens after the match are the drafts; positions at or past
    ``len_h`` are masked to 0 so a draft never leaks a previous
    request's tokens from a reused slot.

    Returns (drafts int32 [S, k], found bool [S]). Cost is O(S*T*n)
    int32 VPU compares — noise next to a model forward."""
    s, t = history.shape
    # query = history[len_h-n : len_h]                            [S, n]
    qidx = jnp.clip(len_h[:, None] - n + jnp.arange(n)[None, :], 0, t - 1)
    q = jnp.take_along_axis(history, qidx, axis=1)
    # windows[s, p, :] = history[s, p : p+n]               [S, T-n+1, n]
    windows = jnp.stack(
        [history[:, j: t - n + 1 + j] for j in range(n)], axis=2
    )
    p_idx = jnp.arange(t - n + 1)[None, :]
    valid = p_idx < (len_h - n)[:, None]  # strictly before the query
    eq = (windows == q[:, None, :]).all(axis=-1) & valid
    found = eq.any(axis=1)
    # last (most recent) match: argmax over the reversed mask
    p_star = (t - n) - jnp.argmax(eq[:, ::-1], axis=1)
    cont = p_star + n
    didx = cont[:, None] + jnp.arange(k)[None, :]
    drafts = jnp.take_along_axis(
        history, jnp.clip(didx, 0, t - 1), axis=1
    )
    # only known tokens may be drafted
    drafts = jnp.where(didx < len_h[:, None], drafts, 0)
    return drafts, found


def _copy_slot_rows(cache: "KVCache", src, dst) -> "KVCache":
    """Copy slot ``src``'s whole KV rows (every layer, full context) over
    slot ``dst`` — the device side of a prefix-cache hit. Rows past the
    shared prefix carry stale values that are never attended before
    being overwritten (the same mask/write-ordering invariant the
    decode/prefill paths already rely on). ``lengths`` is untouched (the
    tail prefill sets it)."""

    # slot axis: 0 on the LAYERED layout's per-layer leaves, 1 after the
    # stacked [L] axis (prefix cache only runs non-pipe, but stay exact)
    axis = 0 if cache.layered else 1

    def cp(a):
        row = jax.lax.dynamic_index_in_dim(a, src, axis=axis, keepdims=False)
        return jax.lax.dynamic_update_index_in_dim(a, row, dst, axis=axis)

    return cache._replace(
        k=jax.tree.map(cp, cache.k), v=jax.tree.map(cp, cache.v),
        k_scale=jax.tree.map(cp, cache.k_scale),
        v_scale=jax.tree.map(cp, cache.v_scale),
    )


class _FetchPool:
    """Daemon-thread pool for device->host fetches.

    Replaces ``ThreadPoolExecutor`` deliberately: the tunneled transport
    this engine runs over can wedge a fetch forever (the exact failure
    the fetch watchdog exists for), and a stdlib executor's non-daemon
    workers then hang ``shutdown(wait=True)`` and interpreter exit.
    Workers here are daemonic and never joined — a wedged ``np.asarray``
    can strand one worker without stranding the process. Liveness is an
    explicit ``alive`` flag (not a private-attribute probe)."""

    def __init__(self, workers: int = 4, name: str = "gen-fetch") -> None:
        import queue

        self._q: "queue.SimpleQueue" = queue.SimpleQueue()
        self._workers = workers
        self.alive = True
        for i in range(workers):
            threading.Thread(
                target=self._run, name=f"{name}-{i}", daemon=True
            ).start()

    def _run(self) -> None:
        while True:
            item = self._q.get()
            if item is None:
                return
            fut, fn, args = item
            if not fut.set_running_or_notify_cancel():
                continue
            try:
                fut.set_result(fn(*args))
            except BaseException as exc:  # noqa: BLE001 - delivered via future
                fut.set_exception(exc)

    def submit(self, fn, *args) -> "concurrent.futures.Future":
        fut: concurrent.futures.Future = concurrent.futures.Future()
        self._q.put((fut, fn, args))
        return fut

    def shutdown(self, drain: bool = True) -> None:
        """Mark the pool dead so ``start()`` recreates it. With ``drain``
        the workers exit after finishing queued fetches (sentinel per
        worker); without it they linger idle — daemonic, so they cost
        nothing and never block exit. Never waits."""
        self.alive = False
        if drain:
            for _ in range(self._workers):
                self._q.put(None)


@dataclasses.dataclass
class GenerationRequest:
    prompt_ids: np.ndarray            # int32 [P]
    max_new_tokens: int = 32
    eos_id: Optional[int] = None
    temperature: float = 0.0          # 0 = greedy argmax
    top_k: int = 0                    # 0 = no top-k restriction
    seed: int = 0
    request_id: str = ""
    # filled by the engine
    tokens: List[int] = dataclasses.field(default_factory=list)
    done: threading.Event = dataclasses.field(default_factory=threading.Event)
    error: Optional[BaseException] = None
    on_token: Optional[Callable[[int], None]] = None  # streaming hook
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0
    cancel_flag: threading.Event = dataclasses.field(
        default_factory=threading.Event
    )

    def cancel(self) -> None:
        """Request-side cancellation (reference parity:
        inference_service_async.cpp:392-444 wires gRPC context
        cancellation to the job's cancel flag). The engine drops a
        pending request at admission, aborts an in-flight chunked
        prefill, and releases an active slot at the next sync block;
        ``done`` is set in every case. Safe after completion (no-op)."""
        self.cancel_flag.set()

    def result(self, timeout: Optional[float] = None) -> List[int]:
        if not self.done.wait(timeout=timeout):
            raise TimeoutError("generation did not finish in time")
        if self.error is not None:
            raise self.error
        return self.tokens


@dataclasses.dataclass
class _SlotState:
    request: GenerationRequest
    last_token: int
    emitted: int


@dataclasses.dataclass
class _PrefillProgress:
    """A chunked prefill in flight: the slot is reserved but inactive
    (not decoded) until the last chunk lands."""

    request: GenerationRequest
    slot: int
    prompt: np.ndarray
    offset: int = 0


@dataclasses.dataclass
class _PrefillLanding:
    """A dispatched-but-unfetched prefill: its logits stay on device
    until a decode block dispatched AFTER it has been consumed (the
    device executes programs in dispatch order, so that consume proves
    the prefill finished and the logits fetch returns without stalling).
    This is what lets admission overlap decode instead of stopping the
    world (VERDICT round-1 item 1: _admit_pending ran a synchronous
    logits fetch on the loop thread)."""

    request: GenerationRequest
    slot: int
    logits: object          # jax.Array [V], last-position prefill logits
    seq: int                # dispatch sequence number of the prefill
    # logits fetch started at dispatch time (its wire RTT overlaps the
    # decode blocks in flight); None on paths that fetch synchronously
    fetch: object = None
    # batched prefill: ``logits``/``fetch`` hold the whole [N, V] block
    # shared by N landings; ``row`` selects this landing's vector
    row: int = -1


class GenerationEngine:
    def __init__(
        self,
        spec: DecoderSpec,
        params,
        dtype=jnp.bfloat16,
        num_slots: int = 8,
        max_len: int = 512,
        prefill_buckets: Optional[List[int]] = None,
        steps_per_sync: int = 1,
        prefill_chunk: int = 0,
        mesh=None,
        family: str = "llama",
        draft_spec: Optional[DecoderSpec] = None,
        draft_params=None,
        speculate_k: int = 4,
        prompt_lookup_ngram: int = 0,
        pipe_microgroups: int = 0,
        pin_cache_layouts: bool = False,
        kv_cache_layout: str = "standard",
        prefix_cache: bool = False,
        prefix_cache_min: int = 16,
        decode_overlap: bool = False,
        pipeline_depth: int = 2,
        kv_page_size: int = 0,
        kv_pool_pages: int = 0,
        fetch_timeout_s: float = 120.0,
        metrics=None,
    ):
        """``mesh``: optional jax.sharding.Mesh for multi-chip decoding —
        weights shard tensor-/expert-parallel per partition.py rules, the
        KV cache and per-slot vectors shard their slot dim over the
        ``data`` axis (slots are independent, so slot-sharding is the
        decoder analogue of batch data-parallelism), and GSPMD inserts
        the collectives. Pallas fused kernels are single-device programs,
        so mesh mode keeps the XLA dequant+dot path.

        A mesh whose ``pipe`` axis is >1 instead selects PIPELINED
        decoding (parallel/pipeline_decode.py): the stacked layer
        weights and the cache's layer axis shard over ``pipe``; prefill
        sequence-chunks and decode slot-microgroups flow through the
        stages. The ``model``/``expert`` axes compose INSIDE each stage
        (manual TP/EP with block-shuffled fused layouts + the cache's
        head axis sharded over ``model``); only ``data`` is excluded
        (slots microgroup over ``pipe`` instead). ``params`` may be
        pre-stacked+placed (parallel.pipeline.prepare_pipelined_params —
        the server reuses the ModelEngine's placement) or a raw tree,
        which is prepared here. ``pipe_microgroups`` sets the decode
        microgroup count (0 = min(stages, num_slots))."""
        self.spec = spec
        self.mesh = mesh
        self._family = family
        self._pipe_stages = 0
        # cache ENTRY/EXIT layout formats (single-device pinning; see
        # _std_format_tree and _pin for the measured upside and why the
        # default is OFF) — None under a mesh, where _pin is a no-op
        self._pin_layouts = bool(pin_cache_layouts)
        self._cache_fmt = None
        self._draft_fmt = None
        # FLAT cache layout ([S, T, Hkv*D] K/V + [S, Hkv, T] scales):
        # every minor dim is lane-aligned, so XLA's compact parameter
        # layout IS the standard layout and decode blocks stop paying
        # the whole-cache entry/exit conversion — the structural version
        # of pin_cache_layouts with no backend layout plumbing involved
        # (models/decoder.init_cache, ops/decode_attention.py).
        if kv_cache_layout not in ("standard", "flat"):
            raise ValueError(
                f"kv_cache_layout must be 'standard' or 'flat', got "
                f"{kv_cache_layout!r}"
            )
        self._flat_cache = kv_cache_layout == "flat"
        if self._flat_cache and mesh is not None:
            raise ValueError(
                "kv_cache_layout='flat' is single-device only (mesh "
                "decode paths keep the standard layout)"
            )
        if self._flat_cache and self._pin_layouts:
            raise ValueError(
                "pin_cache_layouts is redundant with kv_cache_layout="
                "'flat' (the flat layout's standard layout already is "
                "the compact layout) — enable one or the other"
            )
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import DATA_AXIS, PIPE_AXIS

            if mesh.shape.get(PIPE_AXIS, 1) > 1:
                from ..parallel.mesh import MODEL_AXIS
                from ..parallel.pipeline_decode import validate_pipe_mesh
                from ..parallel.tp_layout import validate_decoder_tp

                self._pipe_stages = validate_pipe_mesh(mesh)
                validate_decoder_tp(spec, mesh.shape.get(MODEL_AXIS, 1))
                if prefill_chunk:
                    raise ValueError(
                        "prefill_chunk and pipelined decoding do not "
                        "compose: the pipelined prefill already chunks "
                        "the prompt over the stages (set prefill_chunk=0)"
                    )
                for b in prefill_buckets or [32, 64, 128, 256]:
                    if b % self._pipe_stages != 0:
                        raise ValueError(
                            f"prefill bucket {b} not divisible by "
                            f"{self._pipe_stages} pipeline stages"
                        )
                self._microgroups = pipe_microgroups or min(
                    self._pipe_stages, num_slots
                )
                if num_slots % self._microgroups != 0:
                    raise ValueError(
                        f"num_slots ({num_slots}) not divisible by decode "
                        f"microgroups ({self._microgroups})"
                    )
                # layer axis over pipe; head axis over model (matches the
                # stage programs' _cache_specs so entry never reshards)
                self._cache_sharding = NamedSharding(
                    mesh, P(PIPE_AXIS, None, None, MODEL_AXIS)
                )
                self._slot_sharding = NamedSharding(mesh, P())
            else:
                data_size = mesh.shape.get(DATA_AXIS, 1)
                if num_slots % data_size != 0:
                    raise ValueError(
                        f"num_slots ({num_slots}) must be divisible by the "
                        f"mesh data axis ({data_size}) to shard the KV slots"
                    )
                self._slot_sharding = NamedSharding(mesh, P(DATA_AXIS))
                # LAYERED cache leaves lead with the slot axis
                self._cache_sharding = NamedSharding(mesh, P(DATA_AXIS))
        self.params = self._place_params(params)
        self.dtype = dtype
        self.num_slots = num_slots
        self.max_len = max_len
        # tokens decoded per host sync: the engine loop runs
        # ``steps_per_sync`` decode steps inside ONE jitted call and
        # fetches a [steps, S] token block, amortizing the host round
        # trip. Tokens generated past a request's EOS/limit inside a
        # block are computed-and-discarded (bounded waste, stale cache
        # rows are reset at slot release).
        self.steps_per_sync = max(1, int(steps_per_sync))
        # overlapped dispatch: keep up to ``pipeline_depth`` decode
        # blocks in flight — block N+k is dispatched from the
        # device-resident carry (next ids + sampling progress) BEFORE
        # block N's tokens are fetched, so host-side fetch/emit/stream
        # work and device compute run concurrently, and the device stays
        # busy across host stalls (the axon tunnel adds ~10ms+ per
        # fetch/dispatch round trip — one extra queued block hides it).
        # Valid only while slot membership is unchanged; any
        # admit/release stops the pump and drains the queue one block per
        # loop (per-slot state identity checks drop tokens for released
        # slots). Greedy and seeded-sampling outputs are
        # bitwise-identical at any depth (the PRNG folds (seed, absolute
        # progress), which the carry threads through on device). Costs
        # no context headroom: device-side completion freezes a slot the
        # moment it hits EOS/budget, even inside queued blocks.
        self.decode_overlap = bool(decode_overlap)
        self.pipeline_depth = max(2, int(pipeline_depth)) if decode_overlap else 1
        self._inflight: deque = deque()  # dispatched, not yet consumed
        self._membership_dirty = False
        self.prefill_buckets = sorted(prefill_buckets or [32, 64, 128, 256])
        # chunked prefill: prompts longer than this are prefilled
        # ``prefill_chunk`` tokens at a time, with decode blocks for the
        # already-active slots interleaved between chunks — a long prompt
        # stalls concurrent generation by at most one chunk's latency
        # instead of the whole prompt. 0 disables (bucket path only).
        self.prefill_chunk = max(0, int(prefill_chunk))
        if self.prefill_chunk and max_len % self.prefill_chunk != 0:
            raise ValueError(
                f"prefill_chunk ({self.prefill_chunk}) must divide "
                f"max_len ({max_len}) so every chunk fits the cache row"
            )
        # paged KV cache (kv_page_size > 0): a global pool of fixed-size
        # pages + per-slot page table replaces the dense [S, max_len]
        # preallocation — HBM is sized by kv_pool_pages, requests reserve
        # only ceil((prompt+max_new+headroom)/page) pages, and slot count
        # scales with demand (models/paged_decoder.py; VERDICT r1 item 3).
        self.kv_page_size = max(0, int(kv_page_size))
        if self.kv_page_size:
            from ..models.paged_decoder import init_paged_cache

            if mesh is not None:
                raise ValueError(
                    "paged KV cache does not compose with mesh decoding "
                    "yet (slot-sharded dense cache only)"
                )
            if max_len % self.kv_page_size:
                raise ValueError(
                    f"kv_page_size ({self.kv_page_size}) must divide "
                    f"max_len ({max_len})"
                )
            if self.prefill_chunk and self.prefill_chunk % self.kv_page_size:
                raise ValueError(
                    f"prefill_chunk ({self.prefill_chunk}) must be a "
                    f"multiple of kv_page_size ({self.kv_page_size}) so "
                    "chunks cover whole pages"
                )
            # default pool: half the dense footprint (the headline win is
            # 2x the slots at equal HBM; callers size it explicitly for
            # real deployments)
            self.kv_pool_pages = int(kv_pool_pages) or (
                1 + num_slots * (max_len // self.kv_page_size) // 2
            )
            paged0 = init_paged_cache(
                spec, num_slots, max_len,
                num_pages=self.kv_pool_pages,
                page_size=self.kv_page_size,
                flat=self._flat_cache,
            )
            # opt-in pool-layout pinning, like the dense cache (see
            # _std_format_tree): the paged pools have the same
            # compact-vs-body layout divergence
            if self._pin_layouts:
                self._cache_fmt = self._std_format_tree(paged0)
                self.cache = jax.device_put(paged0, self._cache_fmt)
            else:
                self.cache = jax.device_put(paged0)
            # host-side allocator: free pool page ids (page 0 reserved as
            # the garbage page) + per-slot grants. Immediate free at
            # release is safe: every program (prefill, table install,
            # decode block) chains through the donated cache value, so a
            # re-granted page's overwrite executes on device strictly
            # after any in-flight block that still reads/writes it under
            # the old table snapshot.
            self._free_pages: List[int] = list(
                range(1, self.kv_pool_pages)
            )
            self._slot_pages: List[List[int]] = [[] for _ in range(num_slots)]
            # prefix_cache x paged: pages are REFCOUNTED so a new slot's
            # table can point straight at the whole pages holding a
            # shared prefix (zero-copy reuse — the paged analogue of the
            # dense path's device row copy). Released slots RETAIN their
            # grant (refs alive) so their pages stay valid for future
            # hits; retention is reclaimed on pool pressure.
            self._page_refs = np.zeros((self.kv_pool_pages,), np.int32)
            self._retained: set = set()
            from ..models.paged_decoder import set_table_row

            self._set_table_row = jax.jit(set_table_row, **self._pin(
                (0,), 3, {0: self._cache_fmt}, 1, {0: self._cache_fmt}
            ))
        else:
            self.kv_pool_pages = 0
            # pipe mode keeps the STACKED layout (the [L] axis shards
            # over 'pipe'); everything else uses per-layer leaves
            self.cache: KVCache = self._place_cache(
                init_cache(spec, num_slots, max_len,
                           stacked=bool(self._pipe_stages),
                           flat=self._flat_cache)
            )

        # prefix caching: released slots keep their KV rows resident, so
        # a new prompt sharing a prefix with a slot's (completed) prompt
        # copies those rows device-side and prefills only the tail —
        # shared system prompts prefill once per residency. Host-side
        # index: _slot_prompts[i] = the prompt whose rows [0, len) slot i
        # holds (set at prefill COMPLETION, kept after release, dropped
        # when the slot is reused). Requires chunked prefill (the tail
        # resumes at an arbitrary offset); no reference counterpart.
        self.prefix_cache = bool(prefix_cache)
        self.prefix_cache_min = max(1, int(prefix_cache_min))
        if self.prefix_cache and not self.prefill_chunk:
            raise ValueError(
                "prefix_cache requires chunked prefill (set prefill_chunk)"
            )
        self._slot_prompts: List[Optional[np.ndarray]] = [None] * num_slots
        self.prefix_hits = 0
        self.prefix_tokens_reused = 0
        self._copy_prefix = jax.jit(_copy_slot_rows, donate_argnums=(0,))
        # engine observability (MetricsRecorder or None): tokens/TTFT/
        # slot-occupancy/acceptance families — the decoder analogue of
        # the batch pipeline's per-job metrics (SURVEY section 5.5)
        self._metrics = metrics

        # speculative decoding: a small DRAFT decoder proposes
        # ``speculate_k`` greedy tokens per block, the target model scores
        # the whole window in one verify_step, and the accepted prefix
        # (plus the target's correction token) is committed — up to K+1
        # tokens of progress for one target forward. Greedy output is the
        # target model's own greedy sequence; sampled slots fall back to
        # one verified token per block with unchanged PRNG semantics.
        self.draft_spec = draft_spec
        self.speculate_k = max(1, int(speculate_k))
        self._draft_params = None
        self.drafted_tokens = 0
        self.accepted_drafts = 0
        if draft_spec is not None:
            if draft_params is None:
                raise ValueError("draft_spec requires draft_params")
            if draft_spec.vocab != spec.vocab:
                raise ValueError(
                    f"draft vocab ({draft_spec.vocab}) must match target "
                    f"vocab ({spec.vocab})"
                )
            self._draft_params = self._place_draft_params(draft_params)
            draft_cache0 = init_cache(draft_spec, num_slots, max_len,
                                      flat=self._flat_cache)
            self._draft_fmt = (
                self._std_format_tree(draft_cache0)
                if self.mesh is None and self._pin_layouts else None
            )
            self._draft_cache: KVCache = (
                jax.device_put(draft_cache0, self._draft_fmt)
                if self._draft_fmt is not None
                else self._place_draft_cache(draft_cache0)
            )
            self._draft_prefill = jax.jit(
                partial(prefill, draft_spec, dtype=self.dtype),
                **self._pin((1,), 5, {1: self._draft_fmt},
                            2, {0: self._draft_fmt}),
            )
            # chunked prefill composes: each chunk advances BOTH caches
            # (the draft must hold the prompt before it can draft)
            self._draft_prefill_chunk = jax.jit(
                partial(prefill_chunk_step, draft_spec, dtype=self.dtype),
                **self._pin((1,), 6, {1: self._draft_fmt},
                            2, {0: self._draft_fmt}),
            )
            self._spec_decode = jax.jit(
                self._speculative_block,
                **self._pin((2, 3),
                            12, {2: self._cache_fmt, 3: self._draft_fmt},
                            6, {0: self._cache_fmt, 1: self._draft_fmt}),
            )

        # prompt-lookup speculation: drafts come from the sequence's own
        # token history (device-resident [S, max_len] buffer) — no draft
        # model, the verify machinery is shared with the model-draft
        # path. Mutually exclusive with a draft model; single-device
        # only (the history scatter is not sharded).
        self._lookup_ngram = max(0, int(prompt_lookup_ngram))
        if self._lookup_ngram:
            if draft_spec is not None:
                raise ValueError(
                    "prompt_lookup_ngram and draft_variant are mutually "
                    "exclusive draft sources"
                )
            if self.mesh is not None:
                raise ValueError(
                    "prompt_lookup_ngram does not compose with mesh "
                    "decoding yet (history buffer is unsharded)"
                )
            self._history = jax.device_put(
                jnp.zeros((num_slots, max_len), jnp.int32)
            )
            self._lookup_decode = jax.jit(
                self._prompt_lookup_block,
                **self._pin((1, 2), 11, {1: self._cache_fmt},
                            6, {0: self._cache_fmt}),
            )
            self._seed_history = jax.jit(
                lambda history, row, slot: history.at[slot].set(row),
                donate_argnums=(0,),
            )

        # jit: cache buffers donated -> in-place updates on device
        if self._pipe_stages:
            from ..parallel.pipeline_decode import (
                pipelined_decode_step,
                pipelined_prefill,
                pipelined_verify_step,
            )

            self._prefill = jax.jit(
                self._wrap_prefill(partial(
                    pipelined_prefill,
                    spec,
                    mesh=self.mesh,
                    dtype=self.dtype,
                    num_chunks=self._pipe_stages,
                )),
                donate_argnums=(1,),
            )
            self._step_fn = partial(
                pipelined_decode_step,
                spec,
                mesh=self.mesh,
                dtype=self.dtype,
                num_microgroups=self._microgroups,
            )
            self._verify_fn = partial(
                pipelined_verify_step,
                spec,
                mesh=self.mesh,
                dtype=self.dtype,
                num_microgroups=self._microgroups,
            )
        elif self.kv_page_size:
            from ..models.paged_decoder import (
                paged_decode_step,
                paged_prefill,
                paged_verify_step,
            )

            self._prefill_raw = partial(paged_prefill, spec, dtype=self.dtype)
            self._prefill = jax.jit(
                self._salted(self._wrap_prefill(self._prefill_raw)),
                **self._pin((1,), 5, {1: self._cache_fmt},
                            2, {0: self._cache_fmt}),
            )
            self._step_fn = partial(paged_decode_step, spec, dtype=self.dtype)
            self._verify_fn = partial(
                paged_verify_step, spec, dtype=self.dtype
            )
        else:
            self._prefill_raw = partial(prefill, spec, dtype=self.dtype)
            self._prefill = jax.jit(
                self._salted(self._wrap_prefill(self._prefill_raw)),
                **self._pin((1,), 5, {1: self._cache_fmt},
                            2, {0: self._cache_fmt}),
            )
            self._step_fn = partial(decode_step, spec, dtype=self.dtype)
            self._verify_fn = partial(verify_step, spec, dtype=self.dtype)
        # batched prefill (one PROGRAM for N same-bucket admissions):
        # over the tunneled backend each program launch costs ~7 ms
        # device-side regardless of size, so a 16-request admission wave
        # as 16 programs burns ~100 ms of pure boundary cost. Disabled
        # under pipe meshes (shard_map prefill) and speculation (draft
        # cache must advance in lockstep).
        if self._pipe_stages:
            self._prefill_raw = None
            self._prefill_many = None
        else:
            self._prefill_many = jax.jit(
                self._salted(self._prefill_many_fn),
                **self._pin((1,), 5, {1: self._cache_fmt},
                            2, {0: self._cache_fmt}),
            )
        self._decode = jax.jit(
            self._salted(self._decode_and_sample),
            **self._pin((1,), 10, {1: self._cache_fmt},
                        5, {0: self._cache_fmt}),
        )
        if self.kv_page_size:
            from ..models.paged_decoder import paged_prefill_chunk

            self._prefill_chunk_fn = jax.jit(
                self._salted(self._wrap_prefill(
                    partial(paged_prefill_chunk, spec, dtype=self.dtype)
                )),
                **self._pin((1,), 6, {1: self._cache_fmt},
                            2, {0: self._cache_fmt}),
            )
        else:
            self._prefill_chunk_fn = jax.jit(
                self._salted(self._wrap_prefill(
                    partial(prefill_chunk_step, spec, dtype=self.dtype)
                )),
                **self._pin((1,), 6, {1: self._cache_fmt},
                            2, {0: self._cache_fmt}),
            )
        self._prefilling: Optional[_PrefillProgress] = None
        # async admission state: slots whose prefill is dispatched but
        # not yet landed, the FIFO of landings awaiting their fetch, and
        # the dispatch/consume sequence counters that prove readiness
        self._reserved: set = set()
        self._landings: deque = deque()
        self._dispatch_seq = 0
        self._consumed_seq = 0

        # Token fetches run on a small thread pool so their wire round
        # trips PIPELINE: a synchronous per-block np.asarray costs a
        # full host<->device RTT (~25 ms over the axon tunnel) that
        # serializes the engine to one block per RTT no matter how many
        # blocks are queued on device; submitting the fetch at dispatch
        # time overlaps the RTTs of all in-flight blocks (measured
        # 25 ms -> ~4 ms per block).
        self._fetch_pool = _FetchPool()
        self.fetch_timeout_s = float(fetch_timeout_s)
        self._slots: List[Optional[_SlotState]] = [None] * num_slots
        self._pending: deque = deque()
        self._lock = threading.Lock()
        self._work = threading.Condition(self._lock)
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.steps = 0
        self.generated_tokens = 0
        # cumulative engine-loop phase timers (seconds); "step" further
        # splits into dispatch vs consume-wait below
        self.loop_timers = {"admit": 0.0, "step": 0.0, "land": 0.0,
                            "dispatch": 0.0, "consume": 0.0}

    # -- placement ---------------------------------------------------------

    def _place_params(self, params):
        """Mirror of ModelEngine placement: mesh mode shards per
        partition rules; single-TPU mode packs int4 leaves for the Pallas
        kernels; CPU just device_puts."""
        if self._pipe_stages:
            if isinstance(params.get("layers"), dict):
                return params  # already stacked+placed by the ModelEngine
            from ..parallel.mesh import MODEL_AXIS
            from ..parallel.partition import partition_rules_for
            from ..parallel.pipeline import prepare_pipelined_params

            shuffle = None
            tp = self.mesh.shape.get(MODEL_AXIS, 1)
            if tp > 1:
                from ..parallel.tp_layout import shuffle_decoder_layer_for_tp

                shuffle = lambda layer: shuffle_decoder_layer_for_tp(
                    self.spec, layer, tp
                )
            return prepare_pipelined_params(
                params, self.mesh, partition_rules_for(self._family),
                layer_shuffle=shuffle,
            )
        if self.mesh is not None:
            from ..parallel.partition import partition_rules_for, shard_params

            return shard_params(
                params, self.mesh, partition_rules_for(self._family)
            )
        if jax.default_backend() == "tpu":
            from ..ops import nn
            from ..ops.quant import pack_int4_tree

            nn.set_use_pallas(True)
            return jax.device_put(pack_int4_tree(params))
        return jax.device_put(params)

    def _std_format_tree(self, tree):
        """Explicit standard-layout Format per leaf (single device).

        WHY (round-5 dispatch-bubble fix): XLA stores s8[S,T,Hkv,64]
        cache buffers in a compact {1,3,2,0} entry layout (the standard
        layout pads D=64 to 128 lanes) while every program BODY computes
        in the standard {3,2,1,0} layout — so each standalone decode
        block converted the whole cache at entry AND exit (4.6 GB ≈
        56 ms at S=128, the entire raw-vs-dispatch gap; HLO census in
        scripts/layout_pin_probe.py). Declaring standard-layout Formats
        on the cache's jit entries/exits and placing the buffers in that
        layout once removes every conversion: dispatch-only throughput
        measured 8,691 -> 11,780 tok/s at dense-128 (+36%). Costs padded
        HBM storage — bandwidth for speed, the right trade on this
        serving path."""
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding

        dev = SingleDeviceSharding(jax.devices()[0])
        return jax.tree.map(
            lambda a: Format(
                Layout(major_to_minor=tuple(range(a.ndim))), dev
            ),
            tree,
        )

    def _salted(self, fn):
        """Make a PINNED program's HLO differ from any unpinned
        compilation of the same computation.

        Mixing an optimization_barrier'd scalar into the cache lengths
        puts two un-foldable adds into the HLO, making a pinned
        program's module distinct from any unpinned compilation of the
        same computation — this was the experiment that RULED OUT a
        stale-executable-cache explanation for the pinning failures
        (the salted flow still failed nondeterministically, so the
        backend itself drops the layout request; see _pin). Kept so
        pinned programs stay cache-distinct on backends where the flag
        is usable. No-op numerically; only applied when pinning is
        on."""
        if not self._pin_layouts:
            return fn

        def wrapped(params, cache, *rest):
            salt = jax.lax.optimization_barrier(jnp.int32(1))
            cache = cache._replace(lengths=cache.lengths + salt - salt)
            return fn(params, cache, *rest)

        return wrapped

    def _pin(self, donate, n_in, in_fmts, n_out, out_fmts):
        """jax.jit kwargs pinning cache ENTRY/EXIT layouts at the given
        positional indices (single-device engines only — mesh paths
        keep their shardings).

        OPT-IN (``pin_cache_layouts``): measured +36% dispatch-only /
        +35% engine throughput at dense-128 (the conversion copies
        disappear; scripts/layout_pin_probe.py), but the axon
        remote-compile backend NONDETERMINISTICALLY drops the requested
        entry/exit layouts: identical scripts pass or fail across runs
        with some executable returning compact-layout outputs that fail
        the next pinned call's check. A compile-key salt
        (``_salted`` — unique HLO per pinned program) did NOT fix it,
        ruling out a stale executable cache: the backend itself loses
        the layout request. Until that transport bug is fixed the
        default stays off; on a backend that honors jit Formats the
        flag is a free +36%."""
        if self.mesh is not None or not self._pin_layouts:
            return {"donate_argnums": donate}
        in_sh = [None] * n_in
        for pos, fmt in in_fmts.items():
            in_sh[pos] = fmt
        if n_out == 1:
            # single (possibly pytree) output: not wrapped in a tuple
            out_sh = out_fmts.get(0)
        else:
            out_list = [None] * n_out
            for pos, fmt in out_fmts.items():
                out_list[pos] = fmt
            out_sh = tuple(out_list)
        return {
            "donate_argnums": donate,
            "in_shardings": tuple(in_sh),
            "out_shardings": out_sh,
        }

    def _place_cache(self, cache0: KVCache) -> KVCache:
        if self.mesh is None:
            if not self._pin_layouts:
                return jax.device_put(cache0)
            self._cache_fmt = self._std_format_tree(cache0)
            return jax.device_put(cache0, self._cache_fmt)
        return KVCache(
            k=jax.device_put(cache0.k, self._cache_sharding),
            v=jax.device_put(cache0.v, self._cache_sharding),
            k_scale=jax.device_put(cache0.k_scale, self._cache_sharding),
            v_scale=jax.device_put(cache0.v_scale, self._cache_sharding),
            lengths=jax.device_put(cache0.lengths, self._slot_sharding),
        )

    def _place_draft_params(self, params):
        """The draft model is small: under a PIPE mesh it replicates
        whole (its few layers are not worth pipelining; its forwards run
        as ordinary GSPMD programs on every device). Other modes share
        the target placement."""
        if self._pipe_stages:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            return jax.tree.map(
                lambda a: jax.device_put(a, rep) if hasattr(a, "ndim") else a,
                params,
            )
        return self._place_params(params)

    def _place_draft_cache(self, cache0: KVCache) -> KVCache:
        if self._pipe_stages:
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = NamedSharding(self.mesh, P())
            return jax.tree.map(lambda a: jax.device_put(a, rep), cache0)
        return self._place_cache(cache0)

    # -- device fns --------------------------------------------------------

    def _rep_for_host(self, x):
        """Force a host-fetched program output REPLICATED across the
        mesh. With jax.process_count() > 1 (multi-host pod slice, or the
        2-process loopback bring-up) an output whose shards live on
        another host's devices cannot be np.asarray'd; an all-gather at
        the program tail makes every host's fetch local. Single-process
        meshes skip the constraint (all shards are addressable, and the
        fetch path measured today stays untouched)."""
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, P())
            )
        return x

    def _wrap_prefill(self, fn):
        """Wrap a (…) -> (cache, logits) prefill so the logits (the
        landing's host fetch) are host-fetchable on every process."""
        def wrapped(*args):
            cache, logits = fn(*args)
            return cache, self._rep_for_host(logits)

        return wrapped

    def _verify_accept(self, tparams, tcache, cur, drafts, alive, temps,
                       top_k, seeds, progress, eos, limit):
        """Shared verify-and-commit for every draft source (model draft
        or prompt-lookup): score the [cur, drafts] window with ONE
        target forward, accept the longest draft prefix matching the
        target's greedy tokens plus the target's own correction/bonus
        token, then clamp the commit count ON DEVICE to the slot's
        remaining budget and to the first EOS inside the window (the
        device-side completion contract of ``_decode_and_sample``).
        Sampled slots accept no drafts — they emit exactly one verified
        token per block with the sequential PRNG fold, so a request
        samples the same tokens as the plain engine.

        Returns (tcache, out [S, K+1], counts [S], accepted_raw [S],
        nxt [S], alive_next [S], progress [S], new_len [S])."""
        k = self.speculate_k
        start = tcache.lengths
        window = jnp.concatenate([cur[:, None], drafts], 1)   # [S, K+1]
        tcache, logits = self._verify_fn(
            tparams, tcache, window, alive
        )
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        matches = drafts == greedy[:, :k]
        accepted = jnp.cumprod(matches.astype(jnp.int32), axis=1).sum(
            axis=1
        )
        sampled = temps > 0
        step_keys = jax.vmap(
            lambda sd, pg: jax.random.fold_in(jax.random.PRNGKey(sd), pg)
        )(seeds, progress)
        first = _sample_tokens(logits[:, 0], temps, top_k, step_keys)
        accepted = jnp.where(sampled, 0, accepted)
        out = greedy.at[:, 0].set(first)
        # budget clamp first (the host emits at most ``remaining``
        # tokens), then stop at the first EOS among the survivors
        counts = jnp.minimum(
            accepted + 1, jnp.maximum(limit - progress, 0)
        )
        emit = jnp.arange(k + 1)[None, :] < counts[:, None]
        hits = emit & (out == eos[:, None]) & (eos[:, None] >= 0)
        any_eos = hits.any(axis=1)
        first_eos = jnp.argmax(hits, axis=1)
        counts = jnp.where(any_eos, first_eos + 1, counts)
        counts = jnp.where(alive, counts, 0)
        progress = progress + counts
        done = alive & (any_eos | (progress >= limit))
        new_len = start + counts
        tcache = tcache._replace(lengths=new_len)
        nxt = jnp.take_along_axis(
            out, jnp.maximum(counts - 1, 0)[:, None], axis=1
        )[:, 0]
        nxt = jnp.where(counts > 0, nxt, cur)
        return (tcache, out, counts, accepted, nxt, alive & ~done,
                progress, new_len)

    def _prompt_lookup_block(self, tparams, tcache, history, ids, active,
                             temps, top_k, seeds, progress, eos, limit):
        """One sync of PROMPT-LOOKUP speculative decoding: drafts come
        from the sequence's own token history instead of a draft model —
        the last ``lookup_ngram`` tokens are matched against every
        earlier position in (prompt + generated so far) and the K tokens
        following the most recent match are proposed, then verified with
        the shared ``_verify_accept`` machinery. No trained draft
        weights are needed, and drafting costs VPU comparisons instead
        of a model forward — the win on repetition-heavy workloads
        (doc-QA, code editing, summarization-with-quotes) where the
        output restates spans of the prompt. Net-new vs the reference
        (no decoders there at all — SURVEY.md section 5.7); technique:
        prompt-lookup / n-gram speculative decoding (PAPERS.md).

        ``history`` int32 [S, max_len] carries prompt + emitted tokens
        per slot ON DEVICE and is maintained inside the block (cur is
        written at position ``lengths``, committed tokens behind it), so
        the only host-side maintenance is seeding the prompt rows at
        admission. Packed layout extends ``_speculative_block``'s with a
        found-flag column — [blocks, S, K+4] — and dispatch/consume stay
        shared (consume keys column roles off speculate_k, not width)."""
        k = self.speculate_k
        n = self._lookup_ngram
        s = ids.shape[0]
        t = history.shape[1]

        def one_block(carry, _):
            tcache, history, cur, alive, progress = carry
            start = tcache.lengths
            rows = jnp.arange(s)
            # cur is the last emitted-but-unconsumed token: it lives at
            # position start (cache rows 0..start-1 hold consumed tokens)
            pos_cur = jnp.clip(start, 0, t - 1)
            history = history.at[rows, pos_cur].set(
                jnp.where(alive, cur, history[rows, pos_cur])
            )
            len_h = start + 1
            drafts, found = _ngram_drafts(history, len_h, k, n)
            drafts = jnp.where(
                (found & alive)[:, None], drafts, 0
            )
            (tcache, out, counts, accepted, nxt, alive_next, progress,
             new_len) = self._verify_accept(
                tparams, tcache, cur, drafts, alive, temps, top_k, seeds,
                progress, eos, limit,
            )
            # write the committed tokens into the history so the NEXT
            # block (and future lookups) see them: out[j] is the token
            # at absolute position start+1+j for j < counts
            pos = jnp.clip(start[:, None] + 1 + jnp.arange(k + 1)[None, :],
                           0, t - 1)
            emit = (jnp.arange(k + 1)[None, :] < counts[:, None]) \
                & alive[:, None]
            history = history.at[rows[:, None], pos].set(
                jnp.where(emit, out, history[rows[:, None], pos])
            )
            # lookup packs ONE extra column vs the model-draft path: the
            # per-slot found flag, so the host counts drafted tokens only
            # for blocks where an n-gram match actually proposed tokens
            # (a no-match block verifies an all-zero draft and would
            # otherwise deflate draft_acceptance_ratio — ADVICE r4)
            packed = jnp.concatenate(
                [out, counts[:, None], jnp.where(alive, accepted, 0)[:, None],
                 (found & alive).astype(jnp.int32)[:, None]],
                axis=1,
            )
            return (tcache, history, nxt, alive_next, progress), packed

        (tcache, history, nxt, alive, progress), packed = jax.lax.scan(
            one_block,
            (tcache, history, ids, active, progress),
            None,
            length=self.steps_per_sync,
        )
        return tcache, history, packed, nxt, progress, alive

    def _speculative_block(self, tparams, dparams, tcache, dcache, ids,
                           active, temps, top_k, seeds, progress, eos,
                           limit):
        """One sync of speculative decoding: ``steps_per_sync`` blocks of
        draft-K-then-verify chained on device; each block commits 1..K+1
        tokens per greedy slot. Returns (tcache, dcache, packed) where
        packed int32 [blocks, S, K+3] carries the emitted-token window in
        columns 0..K, the per-slot commit count in column K+1, and the
        pre-clamp accepted-draft count in column K+2 (packed so the host
        pays ONE fetch per sync — the axon-tunnel rule, see CLAUDE.md).

        DEVICE-SIDE COMPLETION (VERDICT r2 item 6, mirroring
        ``_decode_and_sample``): the commit count is clamped ON DEVICE to
        the slot's remaining budget and to the first EOS inside the
        window, and a finished slot flips its ``alive`` bit so later
        blocks (including overlapped ones chained off this carry) stop
        drafting, verifying and advancing its caches. Cache lengths
        therefore never pass prompt+max_new, and the only capacity
        overshoot is the verify window's uncommitted rows — admission
        headroom is exactly K, not depth x steps x (K+1) - 1."""
        k = self.speculate_k
        s = ids.shape[0]

        def one_block(carry, _):
            tcache, dcache, cur, alive, progress = carry

            # draft K tokens greedily with the small model. K+1 steps:
            # the extra step's OUTPUT is discarded, but it writes d_K's
            # KV into the draft cache — on full acceptance the next
            # block's input lands at start+K+1, so the draft must have
            # consumed d_K or its cache would hold a garbage hole at
            # start+K that poisons every later draft.
            def draft_body(j, c):
                dcache, tok, toks = c
                dcache, logits = decode_step(
                    self.draft_spec, dparams, dcache, tok, alive, self.dtype
                )
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return dcache, nxt, toks.at[j].set(nxt)

            toks0 = jnp.zeros((k + 1, s), jnp.int32)
            dcache, _, drafts = jax.lax.fori_loop(
                0, k + 1, draft_body, (dcache, cur, toks0)
            )
            drafts = drafts[:k].T                                 # [S, K]
            (tcache, out, counts, accepted, nxt, alive_next, progress,
             new_len) = self._verify_accept(
                tparams, tcache, cur, drafts, alive, temps, top_k, seeds,
                progress, eos, limit,
            )
            # the draft cache holds valid KV exactly up to the last
            # accepted token; the next block re-feeds the bonus token at
            # position new_len, so both caches commit to the same length
            dcache = dcache._replace(
                lengths=jnp.where(alive, new_len, dcache.lengths)
            )
            # pre-clamp accepted count rides along so the host's
            # acceptance-rate counter measures DRAFT quality, not
            # budget/EOS truncation
            packed = jnp.concatenate(
                [out, counts[:, None], jnp.where(alive, accepted, 0)[:, None]],
                axis=1,
            )
            return (tcache, dcache, nxt, alive_next, progress), packed

        (tcache, dcache, nxt, alive, progress), packed = jax.lax.scan(
            one_block,
            (tcache, dcache, ids, active, progress),
            None,
            length=self.steps_per_sync,
        )
        # nxt/progress/alive stay on device so an overlapped block N+1
        # can be dispatched before the host fetches this block's tokens
        return tcache, dcache, self._rep_for_host(packed), nxt, progress, alive

    def _decode_and_sample(self, params, cache, ids, active, temps, top_k,
                           seeds, progress, eos, limit):
        """temps f32 [S] (0 = greedy), top_k int32 [S] (0 = off), seeds
        uint32 [S], progress int32 [S] = tokens already emitted per slot,
        eos int32 [S] (-1 = none), limit int32 [S] = max_new_tokens.
        The PRNG key folds (seed, absolute token position), so a request
        samples the same tokens regardless of how the engine interleaved
        it with other requests. Sampling happens on device; greedy slots
        take the argmax branch via where, so mixed batches stay one
        compiled program.

        DEVICE-SIDE COMPLETION: a slot whose sampled token hits its eos
        or exhausts its budget flips its own ``alive`` bit ON DEVICE, so
        every later step (and every overlapped block chained off this
        carry) stops advancing its cache — a completed request no longer
        invalidates the dispatch pipeline, only admissions and
        cancellations do. Frozen slots repeat their last id in the token
        block; the host's exactly-once commit loop already stops at the
        finish condition, so emissions are unchanged."""
        steps = self.steps_per_sync
        s = ids.shape[0]

        def body(i, carry):
            cache, ids, alive, prog, tokens = carry
            cache, logits = self._step_fn(params, cache, ids, alive)
            step_keys = jax.vmap(
                lambda sd, pg: jax.random.fold_in(jax.random.PRNGKey(sd), pg)
            )(seeds, prog)
            nxt = _sample_tokens(logits, temps, top_k, step_keys)
            nxt = jnp.where(alive, nxt, ids)
            prog = prog + alive.astype(jnp.int32)
            done = alive & ((nxt == eos) | (prog >= limit))
            return cache, nxt, alive & ~done, prog, tokens.at[i].set(nxt)

        tokens0 = jnp.zeros((steps, s), jnp.int32)
        cache, nxt, alive, prog, tokens = jax.lax.fori_loop(
            0, steps, body, (cache, ids, active, progress, tokens0)
        )
        # device carry for overlapped dispatch: next ids, per-slot
        # progress and the device-resident alive mask
        return cache, self._rep_for_host(tokens), nxt, prog, alive

    def _prefill_many_fn(self, params, cache, ids_b, lengths, slots):
        """N same-bucket prefills chained in ONE program. ids_b int32
        [N, bucket]; lengths/slots int32 [N]. Returns (cache,
        logits [N, V]) — numerics identical to N sequential prefills
        (each iteration is exactly the single-prefill body)."""
        n = ids_b.shape[0]

        def body(i, carry):
            cache, out = carry
            cache, logits = self._prefill_raw(
                params, cache, ids_b[i], lengths[i], slots[i]
            )
            return cache, out.at[i].set(logits.astype(out.dtype))

        out0 = jnp.zeros((n, self.spec.vocab), jnp.float32)
        cache, out = jax.lax.fori_loop(0, n, body, (cache, out0))
        return cache, self._rep_for_host(out)

    def _bucket_for(self, length: int) -> int:
        for b in self.prefill_buckets:
            if b >= length:
                return b
        raise ValueError(
            f"prompt length {length} exceeds largest prefill bucket "
            f"{self.prefill_buckets[-1]}"
        )

    # -- public API --------------------------------------------------------

    def submit(self, request: GenerationRequest) -> GenerationRequest:
        request.submitted_at = now_s()
        # EOS/budget are enforced ON DEVICE on both paths (the alive
        # carry in _decode_and_sample / _speculative_block): cache
        # lengths never pass prompt+max_new. The speculative verify
        # window still WRITES its K uncommitted rows past the final
        # length before acceptance is known, so only those rows need
        # buffer headroom.
        headroom = (
            self.speculate_k
            if (self._draft_params is not None or self._lookup_ngram)
            else 0
        )
        if len(request.prompt_ids) + request.max_new_tokens + headroom > self.max_len:
            raise ValueError(
                f"prompt({len(request.prompt_ids)}) + max_new_tokens"
                f"({request.max_new_tokens}) + sync headroom({headroom}) "
                f"exceeds max context {self.max_len}"
            )
        if not self.prefill_chunk and (
            len(request.prompt_ids) > self.prefill_buckets[-1]
        ):
            # fail at the door (INVALID_ARGUMENT), not inside the engine
            # loop where it would take down unrelated requests
            raise ValueError(
                f"prompt length {len(request.prompt_ids)} exceeds largest "
                f"prefill bucket {self.prefill_buckets[-1]} and chunked "
                f"prefill is disabled (set prefill_chunk)"
            )
        with self._work:
            self._pending.append(request)
            self._work.notify()
        return request

    def generate(
        self,
        prompt_ids: np.ndarray,
        max_new_tokens: int = 32,
        eos_id: Optional[int] = None,
        timeout: float = 300.0,
    ) -> List[int]:
        req = GenerationRequest(
            prompt_ids=np.asarray(prompt_ids, np.int32),
            max_new_tokens=max_new_tokens,
            eos_id=eos_id,
        )
        self.submit(req)
        return req.result(timeout=timeout)

    def start(self) -> None:
        if not self._fetch_pool.alive:  # restarted after stop()
            self._fetch_pool = _FetchPool()
        self._stop.clear()
        self._thread = threading.Thread(
            target=self._loop, name="generation-engine", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        self._stop.set()
        with self._work:
            self._work.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=30.0)
        # Never wait on fetch workers (a wedged device fetch would hang
        # stop() forever). Drain only once the loop thread has provably
        # exited — if it is still delivering, leave the workers running
        # so its drain-then-stop submissions still complete.
        loop_done = self._thread is None or not self._thread.is_alive()
        self._fetch_pool.shutdown(drain=loop_done)

    def active_count(self) -> int:
        with self._lock:
            return sum(s is not None for s in self._slots)

    def draft_acceptance_rate(self) -> float:
        """Fraction of drafted tokens the target model accepted (0 when
        not speculating)."""
        return self.accepted_drafts / max(1, self.drafted_tokens)

    # -- engine loop -------------------------------------------------------

    def _loop(self) -> None:
        log = get_logger()
        try:
            t = self.loop_timers  # cumulative phase seconds (profiling)
            while not self._stop.is_set():
                t0 = now_s()
                admitted = self._admit_pending()
                t1 = now_s()
                stepped = self._step_active()
                t2 = now_s()
                # finish prefills whose completion a consumed decode
                # block has proven; when no decode is in flight there is
                # nothing to overlap with, so force the (then-stalling)
                # fetch rather than spin
                landed = self._land_prefills(force=not stepped)
                t3 = now_s()
                t["admit"] += t1 - t0
                t["step"] += t2 - t1
                t["land"] += t3 - t2
                if not admitted and not stepped and not landed:
                    with self._work:
                        if not self._pending and not self._stop.is_set():
                            self._work.wait(timeout=0.05)
            while self._inflight:
                # deliver every overlapped block's tokens before exiting
                # so a drain-then-stop shutdown loses nothing
                self._consume_block(self._inflight.popleft())
            self._land_prefills(force=True)
        except BaseException as exc:  # noqa: BLE001 - fail all open requests
            log.error("generation engine failed: %s", exc)
            self._inflight.clear()
            with self._lock:
                failures = [s.request for s in self._slots if s is not None]
                failures.extend(self._pending)
                failures.extend(l.request for l in self._landings)
                self._landings.clear()
                self._reserved.clear()
                if self._prefilling is not None:
                    failures.append(self._prefilling.request)
                    self._prefilling = None
                self._pending.clear()
                self._slots = [None] * self.num_slots
            for req in failures:
                req.error = exc
                req.done.set()

    def _admit_pending(self) -> bool:
        # an in-flight chunked prefill advances exactly one chunk per loop
        # iteration; the decode block for active slots runs in between
        if self._prefilling is not None:
            self._advance_chunk(self._prefilling)
            return True
        # simple (bucketed, non-prefix, non-chunked) admissions collect
        # here and flush as BATCHED prefill programs on every exit path
        batch: List[tuple] = []
        try:
            return self._admit_pending_inner(batch)
        finally:
            self._flush_prefill_batch(batch)

    def _admit_pending_inner(self, batch: List[tuple]) -> bool:
        admitted = False
        while True:
            with self._lock:
                free = next(
                    (
                        i
                        for i, s in enumerate(self._slots)
                        if s is None and i not in self._reserved
                    ),
                    None,
                )
                if free is None or not self._pending:
                    return admitted
                request = self._pending.popleft()
            if request.cancel_flag.is_set():
                # dropped before ever touching a slot
                request.finished_at = now_s()
                request.done.set()
                continue
            prompt = np.asarray(request.prompt_ids, np.int32)
            # the slot's retained rows are about to be overwritten; its
            # prompt index entry is only valid again at prefill completion
            stale_prompt = self._slot_prompts[free]
            self._slot_prompts[free] = None
            hit = self._find_prefix(prompt, free, stale_prompt)
            if self.kv_page_size:
                # paged prefix reuse is PAGE-GRANULAR and zero-copy: the
                # new slot's table points at the hit's whole pages
                shared: List[int] = []
                src_slot = -1
                if hit is not None:
                    src_slot, l_star = hit
                    n_shared = l_star // self.kv_page_size
                    if n_shared == 0:
                        hit = None
                    else:
                        hit = (src_slot, n_shared * self.kv_page_size)
                        shared = self._slot_pages[src_slot][:n_shared]
                if not self._grant_pages(free, request, shared, src_slot):
                    # pool exhausted: requeue at the FRONT (FIFO order
                    # holds) and stop admitting until a release frees
                    # pages
                    self._slot_prompts[free] = stale_prompt
                    with self._lock:
                        self._pending.appendleft(request)
                    return admitted
            admitted = True
            self._reserved.add(free)  # until the prefill lands (or aborts)
            if self._lookup_ngram:
                # seed the slot's token history with the prompt (one
                # tiny program per admission; the block fn maintains the
                # generated tail on device). Stale tokens past the
                # prompt are masked by len_h in the lookup.
                row = np.zeros((self.max_len,), np.int32)
                row[: len(prompt)] = prompt
                self._history = self._seed_history(
                    self._history, jnp.asarray(row), jnp.int32(free)
                )
            try:
                if hit is not None:
                    src, l_star = hit
                    if src != free and not self.kv_page_size:
                        self.cache = self._copy_prefix(
                            self.cache, jnp.int32(src), jnp.int32(free)
                        )
                    if src != free and self._draft_params is not None:
                        # the draft cache is dense in every mode
                        self._draft_cache = self._copy_prefix(
                            self._draft_cache, jnp.int32(src),
                            jnp.int32(free),
                        )
                    self.prefix_hits += 1
                    self.prefix_tokens_reused += l_star
                    if self._metrics is not None:
                        self._metrics.prefix_cache_hits_total.inc()
                        self._metrics.prefix_tokens_reused_total.inc(l_star)
                    self._prefilling = _PrefillProgress(
                        request=request, slot=free, prompt=prompt,
                        offset=l_star,
                    )
                    self._advance_chunk(self._prefilling)
                    return True
                if self.prefill_chunk and (
                    len(prompt) > self.prefill_chunk
                    or len(prompt) > self.prefill_buckets[-1]
                ):
                    self._prefilling = _PrefillProgress(
                        request=request, slot=free, prompt=prompt
                    )
                    self._advance_chunk(self._prefilling)
                    return True
                if (
                    self._prefill_many is None
                    or self._draft_params is not None
                ):
                    self._prefill_into(free, request)
                else:
                    # bucket validation must raise INSIDE this
                    # per-request containment, not at flush time
                    batch.append(
                        (self._bucket_for(len(prompt)), free, request,
                         prompt)
                    )
            except BaseException as exc:  # noqa: BLE001
                # the request is out of _pending and not yet in a slot: fail
                # it here or its done event is never set. Per-request
                # validation errors (ValueError) are contained — the engine
                # keeps serving; anything else still aborts the engine.
                self._prefilling = None
                self._reserved.discard(free)
                self._free_slot_pages(free)
                request.error = exc
                request.done.set()
                if not isinstance(exc, ValueError):
                    raise

    def _grant_pages(
        self,
        slot: int,
        request: GenerationRequest,
        shared=(),
        src_slot: int = -1,
    ) -> bool:
        """Paged mode: reserve pool pages sized to THIS request
        (prompt + max_new + sync headroom), install the slot's table row
        (dispatched before the prefill that reads it — ordering via the
        cache chain). ``shared`` page ids (a prefix hit's whole pages,
        owned by ``src_slot``) head the table with their refcount bumped
        — zero-copy prefix reuse. Returns False when the pool is
        exhausted even after reclaiming retained grants."""
        page = self.kv_page_size
        # device-side completion on both paths: the only overshoot is
        # the speculative verify window's K uncommitted rows (see
        # submit())
        headroom = (
            self.speculate_k
            if (self._draft_params is not None or self._lookup_ngram)
            else 0
        )
        need_tokens = (
            len(request.prompt_ids) + request.max_new_tokens + headroom
        )
        need = -(-need_tokens // page)
        shared = list(shared)
        own_needed = need - len(shared)
        if len(self._free_pages) < own_needed:
            # reclaim RETAINED grants (released slots kept alive only
            # for prefix hits) before refusing admission. Never evict
            # the hit's source slot or this slot mid-grant.
            for victim in [
                v for v in list(self._retained)
                if v not in (slot, src_slot)
            ]:
                self._evict_retained(victim)
                if len(self._free_pages) >= own_needed:
                    break
        if len(self._free_pages) < own_needed and slot in self._retained:
            self._evict_retained(slot)
        if len(self._free_pages) < own_needed:
            if self._metrics is not None and hasattr(
                self._metrics, "kv_pool_exhausted_total"
            ):
                self._metrics.kv_pool_exhausted_total.inc()
            return False
        old = self._slot_pages[slot]  # retained leftovers being replaced
        for p in shared:
            self._page_refs[p] += 1
        own = [self._free_pages.pop() for _ in range(own_needed)]
        for p in own:
            self._page_refs[p] = 1
        self._retained.discard(slot)
        if old:
            self._decref_pages(old)
        pages = shared + own
        self._slot_pages[slot] = pages
        row = np.zeros((self.max_len // page,), np.int32)
        row[: len(pages)] = pages
        self.cache = self._set_table_row(
            self.cache, jnp.int32(slot), jnp.asarray(row)
        )
        if self._metrics is not None and hasattr(
            self._metrics, "kv_pool_free_pages"
        ):
            self._metrics.kv_pool_free_pages.set(len(self._free_pages))
        return True

    def _decref_pages(self, pages) -> None:
        for p in pages:
            self._page_refs[p] -= 1
            if self._page_refs[p] == 0:
                self._free_pages.append(p)

    def _evict_retained(self, slot: int) -> None:
        """Drop a released slot's retained grant: its prompt leaves the
        prefix index and its pages decref (shared pages stay alive under
        other slots' refs)."""
        self._retained.discard(slot)
        self._slot_prompts[slot] = None
        self._decref_pages(self._slot_pages[slot])
        self._slot_pages[slot] = []

    def _free_slot_pages(self, slot: int, retain: bool = False) -> None:
        if not self.kv_page_size or not self._slot_pages[slot]:
            return
        if retain and self.prefix_cache:
            # keep the grant alive so the slot's rows stay valid for
            # prefix hits (the dense path gets this for free — rows
            # persist until overwritten; paged pages must be pinned)
            self._retained.add(slot)
            return
        self._retained.discard(slot)
        self._decref_pages(self._slot_pages[slot])
        self._slot_pages[slot] = []
        if self._metrics is not None and hasattr(
            self._metrics, "kv_pool_free_pages"
        ):
            self._metrics.kv_pool_free_pages.set(len(self._free_pages))

    def _find_prefix(self, prompt, free, stale_prompt):
        """Longest usable cached prefix of ``prompt``: scan the retained
        per-slot prompt index (completed prefills only — in-flight slots
        hold None). Returns (src_slot, prefix_len) or None. Capped at
        len(prompt)-1 so the tail prefill always scores >= 1 row (the
        first-token logits)."""
        if not self.prefix_cache:
            return None
        best = None
        candidates = list(enumerate(self._slot_prompts))
        if stale_prompt is not None:
            candidates.append((free, stale_prompt))  # in-place reuse
        for i, stored in candidates:
            if stored is None:
                continue
            n = min(len(stored), len(prompt) - 1)
            if n <= 0:
                continue
            neq = stored[:n] != prompt[:n]
            l = int(neq.argmax()) if neq.any() else n
            if l >= self.prefix_cache_min and (best is None or l > best[1]):
                best = (i, l)
        return best

    def _advance_chunk(self, pf: _PrefillProgress) -> None:
        if pf.request.cancel_flag.is_set():
            # abort the in-flight prefill: zero the slot's cache length
            # (rows written so far are never attended) and free it —
            # the slot was reserved but never activated
            self._prefilling = None
            self._reserved.discard(pf.slot)
            self._free_slot_pages(pf.slot)
            self.cache = self.cache._replace(
                lengths=self.cache.lengths.at[pf.slot].set(0)
            )
            if self._draft_params is not None:
                self._draft_cache = self._draft_cache._replace(
                    lengths=self._draft_cache.lengths.at[pf.slot].set(0)
                )
            pf.request.finished_at = now_s()
            pf.request.done.set()
            return
        c = self.prefill_chunk
        chunk = pf.prompt[pf.offset : pf.offset + c]
        valid = len(chunk)
        padded = np.zeros((c,), np.int32)
        padded[:valid] = chunk
        self.cache, logits = self._prefill_chunk_fn(
            self.params,
            self.cache,
            jnp.asarray(padded),
            jnp.int32(pf.offset),
            jnp.int32(valid),
            jnp.int32(pf.slot),
        )
        if self._draft_params is not None:
            self._draft_cache, _ = self._draft_prefill_chunk(
                self._draft_params,
                self._draft_cache,
                jnp.asarray(padded),
                jnp.int32(pf.offset),
                jnp.int32(valid),
                jnp.int32(pf.slot),
            )
        pf.offset += valid
        if pf.offset >= len(pf.prompt):
            self._prefilling = None
            self._dispatch_seq += 1
            self._prefetch(logits)
            self._landings.append(
                _PrefillLanding(
                    request=pf.request, slot=pf.slot, logits=logits,
                    seq=self._dispatch_seq,
                    fetch=self._fetch_pool.submit(np.asarray, logits),
                )
            )

    def _flush_prefill_batch(self, batch) -> None:
        """Dispatch collected same-loop admissions as batched prefill
        programs (power-of-two group sizes per bucket bound the
        executable count; singletons take the per-request path)."""
        if not batch:
            return
        groups: dict = {}
        for bucket, slot, request, prompt in batch:
            groups.setdefault(bucket, []).append((slot, request, prompt))
        for bucket, items in groups.items():
            i = 0
            while i < len(items):
                n = 1
                while n * 2 <= len(items) - i and n * 2 <= 16:
                    n *= 2
                chunk = items[i:i + n]
                i += n
                if n == 1:
                    self._prefill_into(chunk[0][0], chunk[0][1])
                    continue
                ids_b = np.zeros((n, bucket), np.int32)
                lengths = np.zeros((n,), np.int32)
                slots = np.zeros((n,), np.int32)
                for j, (slot, request, prompt) in enumerate(chunk):
                    ids_b[j, : len(prompt)] = prompt
                    lengths[j] = len(prompt)
                    slots[j] = slot
                try:
                    self.cache, logits_all = self._prefill_many(
                        self.params, self.cache, jnp.asarray(ids_b),
                        jnp.asarray(lengths), jnp.asarray(slots),
                    )
                except BaseException as exc:  # noqa: BLE001
                    # mirror _prefill_into's per-request containment:
                    # these requests are out of _pending and not in
                    # _landings yet — fail them here or their done
                    # events never set
                    for slot, request, prompt in chunk:
                        self._reserved.discard(slot)
                        self._free_slot_pages(slot)
                        request.error = exc
                        request.done.set()
                    if not isinstance(exc, ValueError):
                        raise
                    continue
                self._dispatch_seq += 1
                self._prefetch(logits_all)
                fut = self._fetch_pool.submit(np.asarray, logits_all)
                for j, (slot, request, prompt) in enumerate(chunk):
                    self._landings.append(
                        _PrefillLanding(
                            request=request, slot=slot, logits=logits_all,
                            seq=self._dispatch_seq, fetch=fut, row=j,
                        )
                    )

    def _prefill_into(self, slot: int, request: GenerationRequest) -> None:
        prompt = np.asarray(request.prompt_ids, np.int32)
        bucket = self._bucket_for(len(prompt))
        padded = np.zeros((bucket,), np.int32)
        padded[: len(prompt)] = prompt
        self.cache, logits = self._prefill(
            self.params,
            self.cache,
            jnp.asarray(padded),
            jnp.int32(len(prompt)),
            jnp.int32(slot),
        )
        if self._draft_params is not None:
            # the draft needs the prompt in ITS cache before it can draft
            self._draft_cache, _ = self._draft_prefill(
                self._draft_params,
                self._draft_cache,
                jnp.asarray(padded),
                jnp.int32(len(prompt)),
                jnp.int32(slot),
            )
        # async: the logits stay on device; the landing finishes once a
        # later-dispatched decode block is consumed (or immediately when
        # there is no decode to overlap with)
        self._dispatch_seq += 1
        self._prefetch(logits)
        self._landings.append(
            _PrefillLanding(
                request=request, slot=slot, logits=logits,
                seq=self._dispatch_seq,
                fetch=self._fetch_pool.submit(np.asarray, logits),
            )
        )

    def _land_prefills(self, force: bool = False) -> bool:
        """Finish dispatched prefills whose device completion is proven
        (a decode block dispatched after them has been consumed — the
        device runs programs in dispatch order, so the logits fetch
        cannot stall). ``force`` lands unconditionally (idle engine,
        drain). Returns True if any landed."""
        landed = False
        while self._landings:
            if not force and self._consumed_seq <= self._landings[0].seq:
                break
            # peek, don't pop: if the logits fetch below raises (fetch
            # watchdog), the landing must still be in the deque so the
            # loop's failure path fails ITS request too
            landing = self._landings[0]
            if not landing.request.cancel_flag.is_set():
                fetched = self._fetch_result(landing.fetch, landing.logits)
                if landing.row >= 0:  # batched prefill: shared [N, V]
                    fetched = fetched[landing.row]
            self._landings.popleft()
            self._reserved.discard(landing.slot)
            if landing.request.cancel_flag.is_set():
                # cancelled between dispatch and landing: the slot was
                # reserved but never activated — zero its rows and free
                self._free_slot_pages(landing.slot)
                self.cache = self.cache._replace(
                    lengths=self.cache.lengths.at[landing.slot].set(0)
                )
                if self._draft_params is not None:
                    self._draft_cache = self._draft_cache._replace(
                        lengths=self._draft_cache.lengths.at[landing.slot].set(0)
                    )
                landing.request.finished_at = now_s()
                landing.request.done.set()
            else:
                self._finish_prefill(landing.slot, landing.request, fetched)
            landed = True
        return landed

    def _finish_prefill(
        self, slot: int, request: GenerationRequest, logits: np.ndarray
    ) -> None:
        if self.prefix_cache:
            # the slot now holds this prompt's rows [0, len) — index it
            # for prefix reuse (valid until the slot is next admitted)
            self._slot_prompts[slot] = np.asarray(
                request.prompt_ids, np.int32
            )
        self._membership_dirty = True  # overlap carry is stale now
        first = self._sample_first(logits, request)
        request.first_token_at = now_s()
        m = self._metrics
        if m is not None:
            m.generation_ttft.observe(
                (request.first_token_at - request.submitted_at) * 1e3
            )
        self._emit(request, first)
        state = _SlotState(request=request, last_token=first, emitted=1)
        with self._lock:
            self._slots[slot] = state
            if m is not None:
                m.generation_active_slots.set(
                    sum(s is not None for s in self._slots)
                )
                m.generation_pending.set(len(self._pending))
        if self._finished(state):
            self._release(slot)

    @staticmethod
    def _sample_first(logits: np.ndarray, request: GenerationRequest) -> int:
        """Sample the prefill's first token on host (single vector)."""
        if request.temperature <= 0:
            return int(logits.argmax())
        rng = np.random.default_rng(request.seed)
        scaled = logits.astype(np.float64) / max(request.temperature, 1e-6)
        if request.top_k > 0:
            kth = np.sort(scaled)[-min(request.top_k, len(scaled))]
            scaled = np.where(scaled < kth, -np.inf, scaled)
        p = np.exp(scaled - scaled.max())
        p /= p.sum()
        return int(rng.choice(len(p), p=p))

    def _snapshot_active(self):
        """Host snapshot of the active slots: per-slot input ids and
        sampling parameters, plus the exact _SlotState references the
        block was dispatched for (a consumed block only emits to a slot
        whose state is STILL the dispatched one — overlapped blocks may
        outlive a release/re-admit of their slot)."""
        with self._lock:
            if not any(s is not None for s in self._slots):
                return None
            snap = {
                "ids": np.zeros((self.num_slots,), np.int32),
                "active": np.zeros((self.num_slots,), bool),
                "temps": np.zeros((self.num_slots,), np.float32),
                "top_k": np.zeros((self.num_slots,), np.int32),
                "seeds": np.zeros((self.num_slots,), np.uint32),
                "progress": np.zeros((self.num_slots,), np.int32),
                "eos": np.full((self.num_slots,), -1, np.int32),
                "limit": np.zeros((self.num_slots,), np.int32),
                "states": list(self._slots),
            }
            for i, s in enumerate(self._slots):
                if s is not None:
                    snap["ids"][i] = s.last_token
                    snap["active"][i] = True
                    snap["temps"][i] = s.request.temperature
                    snap["top_k"][i] = s.request.top_k
                    snap["seeds"][i] = s.request.seed & 0xFFFFFFFF
                    snap["progress"][i] = s.emitted
                    if s.request.eos_id is not None:
                        snap["eos"][i] = s.request.eos_id
                    snap["limit"][i] = s.request.max_new_tokens
        # the sampling params are constant for this membership epoch:
        # upload once and reuse across every block dispatched under this
        # snapshot (each upload is a host->device round trip — 4 per
        # block adds up over the axon tunnel)
        snap["active_dev"] = jnp.asarray(snap["active"])
        snap["temps_dev"] = jnp.asarray(snap["temps"])
        snap["top_k_dev"] = jnp.asarray(snap["top_k"])
        snap["seeds_dev"] = jnp.asarray(snap["seeds"])
        snap["eos_dev"] = jnp.asarray(snap["eos"])
        snap["limit_dev"] = jnp.asarray(snap["limit"])
        return snap

    @staticmethod
    def _prefetch(arr) -> None:
        """Enqueue the device->host copy NOW, behind the program that
        produces ``arr`` (in-order execution). Over the axon tunnel this
        is the difference between ~1 wire RTT per consumed block and ~1
        RTT total per pipeline: measured 8 queued scalar fetches resolve
        in 189 ms fetched sequentially, 41 ms via the thread pool alone,
        29 ms with copy_to_host_async (the whole pipeline's transfers
        ride one round trip). The pooled np.asarray in _fetch_result
        then just waits for data already in flight (and keeps the
        watchdog)."""
        try:
            arr.copy_to_host_async()
        except AttributeError:  # non-jax.Array (tests, fallbacks)
            pass

    def _dispatch_block(self, ids, progress, snap, alive=None):
        """Dispatch one decode block (async — no fetch). ``ids``,
        ``progress`` and ``alive`` are either fresh host arrays or the
        previous block's device-resident carry (overlap steady state) —
        ``alive`` is the device-side completion mask that lets finished
        slots freeze without invalidating the pipeline."""
        active = snap["active_dev"]
        temps = snap["temps_dev"]
        top_k = snap["top_k_dev"]
        seeds = snap["seeds_dev"]
        self._dispatch_seq += 1
        if self._lookup_ngram:
            (self.cache, self._history, packed, nxt, prog,
             alive_out) = self._lookup_decode(
                self.params, self.cache, self._history, ids,
                active if alive is None else alive,
                temps, top_k, seeds, progress,
                snap["eos_dev"], snap["limit_dev"],
            )
            self._prefetch(packed)
            return {"packed": packed, "nxt": nxt, "prog": prog,
                    "snap": snap, "alive": alive_out,
                    "seq": self._dispatch_seq,
                    "fetch": self._fetch_pool.submit(np.asarray, packed)}
        if self._draft_params is not None:
            (self.cache, self._draft_cache, packed, nxt, prog,
             alive_out) = self._spec_decode(
                self.params, self._draft_params, self.cache,
                self._draft_cache, ids,
                active if alive is None else alive,
                temps, top_k, seeds, progress,
                snap["eos_dev"], snap["limit_dev"],
            )
            self._prefetch(packed)
            return {"packed": packed, "nxt": nxt, "prog": prog,
                    "snap": snap, "alive": alive_out,
                    "seq": self._dispatch_seq,
                    "fetch": self._fetch_pool.submit(np.asarray, packed)}
        self.cache, block, nxt, prog, alive_out = self._decode(
            self.params, self.cache, ids,
            active if alive is None else alive,
            temps, top_k, seeds, progress,
            snap["eos_dev"], snap["limit_dev"],
        )
        self._prefetch(block)
        return {"block": block, "nxt": nxt, "prog": prog, "snap": snap,
                "alive": alive_out, "seq": self._dispatch_seq,
                "fetch": self._fetch_pool.submit(np.asarray, block)}

    def _fetch_result(self, fut, arr) -> np.ndarray:
        """Resolve an async token/logits fetch with a WATCHDOG. The
        experimental tunneled transport this repo is benchmarked over
        can sporadically wedge a device->host fetch forever (observed
        even for plain sequential np.asarray); an engine that blocks
        indefinitely turns one lost fetch into a hung server. Every
        fetch therefore runs on the pool and is bounded by
        ``fetch_timeout_s``: on expiry the engine raises, the loop's
        failure path fails all open requests with a real error, and the
        server stays responsive. On healthy transports (and real local
        TPU) the timeout never fires."""
        if fut is None:
            fut = self._fetch_pool.submit(np.asarray, arr)
        try:
            return fut.result(timeout=self.fetch_timeout_s)
        except concurrent.futures.TimeoutError:
            if self._metrics is not None and hasattr(
                self._metrics, "fetch_timeouts_total"
            ):
                self._metrics.fetch_timeouts_total.inc()
            raise RuntimeError(
                f"device fetch did not complete within "
                f"{self.fetch_timeout_s:.0f}s — transport wedged; failing "
                "open requests"
            ) from None

    def _consume_block(self, rec) -> None:
        """Fetch a dispatched block's tokens (the sync point) and commit
        them to the slots they were dispatched for."""
        snap = rec["snap"]
        active = snap["active"]
        # fetching this block fences every program dispatched before it
        # (in-order device execution): earlier prefill landings are ready
        self._consumed_seq = max(self._consumed_seq, rec["seq"])
        if "packed" in rec:
            # [blocks, S, K+3] (model draft) or [blocks, S, K+4]
            # (prompt-lookup, extra found-flag column): one fetch,
            # started at dispatch time
            packed = self._fetch_result(rec["fetch"], rec["packed"])
            k1 = self.speculate_k + 1
            tokens = packed[:, :, :k1]           # [blocks, S, K+1]
            counts = packed[:, :, k1]            # [blocks, S]
            raw_accepted = packed[:, :, k1 + 1]  # [blocks, S] pre-clamp
            # drafts happen only while the slot is device-alive, and an
            # alive greedy slot always commits >= 1 token — so counts>0
            # marks exactly the (block, slot) pairs that drafted
            greedy = active & (snap["temps"] == 0)
            drafted_mask = counts[:, greedy] > 0
            if packed.shape[2] > k1 + 2:
                # prompt-lookup: count only blocks with an n-gram match
                drafted_mask &= packed[:, greedy, k1 + 2] > 0
            self.drafted_tokens += self.speculate_k * int(drafted_mask.sum())
            self.accepted_drafts += int(
                raw_accepted[:, greedy][drafted_mask].sum()
            )
            if self._metrics is not None and self.drafted_tokens:
                self._metrics.draft_acceptance_ratio.set(
                    self.accepted_drafts / self.drafted_tokens
                )
        else:
            # [steps, S] -> [steps, S, 1] with one committed token per block
            tokens = self._fetch_result(rec["fetch"], rec["block"])[:, :, None]
            counts = np.ones(tokens.shape[:2], np.int32)
        self.steps += tokens.shape[0]
        if (
            self._metrics is not None
            and self.steps % 64 < tokens.shape[0]
            and hasattr(self._metrics, "generation_loop_seconds")
        ):
            for phase, secs in self.loop_timers.items():
                self._metrics.generation_loop_seconds.labels(
                    phase=phase
                ).set(secs)

        finished = set()
        spec_mode = "packed" in rec
        steps_n = tokens.shape[0]
        for i in range(self.num_slots):
            if not active[i]:
                continue
            with self._lock:
                state = self._slots[i]
            if state is None or state is not snap["states"][i]:
                continue  # slot released (and possibly re-admitted)
            req = state.request
            if req.cancel_flag.is_set():
                finished.add(i)
                continue
            if spec_mode:
                # variable commits per block: walk the counts
                for b in range(steps_n):
                    for j in range(int(counts[b, i])):
                        token = int(tokens[b, i, j])
                        state.last_token = token
                        state.emitted += 1
                        self._emit(req, token)
                        if self._finished(state):
                            finished.add(i)
                            break
                    if i in finished:
                        break
                continue
            # plain path: exactly one token per step and EOS/budget are
            # already enforced ON DEVICE — commit the slot's column in
            # bulk instead of 8 locked per-token Python iterations (the
            # commit scan is on the engine loop's critical path)
            col = tokens[:, i, 0]
            n = int(min(steps_n, max(req.max_new_tokens - state.emitted, 0)))
            eos = req.eos_id
            if eos is not None and n > 0:
                hits = np.nonzero(col[:n] == eos)[0]
                if hits.size:
                    n = int(hits[0]) + 1
            if n <= 0:
                finished.add(i)
                continue
            take = col[:n].tolist()
            req.tokens.extend(take)
            if req.on_token is not None:
                for t in take:
                    req.on_token(t)
            state.emitted += n
            state.last_token = take[-1]
            self.generated_tokens += n
            if self._metrics is not None:
                self._metrics.generated_tokens_total.inc(n)
            if state.emitted >= req.max_new_tokens or (
                eos is not None and take[-1] == eos
            ):
                finished.add(i)
        for i in finished:
            # non-speculative completions already froze their slot ON
            # DEVICE (the alive carry) — the in-flight pipeline stays
            # valid; only cancellations (host-initiated, device-unaware)
            # and the speculative path need the carry invalidated.
            state = snap["states"][i]
            invalidate = (
                "alive" not in rec
                or (state is not None and state.request.cancel_flag.is_set())
            )
            self._release(i, invalidate_carry=invalidate)
        if finished:
            with self._lock:
                live = any(s is not None for s in self._slots)
            if not live:
                # nothing left alive: stop pumping dead blocks; the
                # next snapshot (on admission) restarts the pipeline
                self._membership_dirty = True

    def _step_active(self) -> bool:
        t_start = now_s()
        if not self._inflight:
            snap = self._snapshot_active()
            if snap is None:
                return False
            self._membership_dirty = False
            self._inflight.append(
                self._dispatch_block(
                    jnp.asarray(snap["ids"]), jnp.asarray(snap["progress"]),
                    snap,
                )
            )
        # pump: chain blocks off the newest carry until the pipeline is
        # full — the device computes queued blocks back to back while
        # the host fetches/emits/streams the oldest
        while (
            self.decode_overlap
            and not self._membership_dirty
            and len(self._inflight) < self.pipeline_depth
        ):
            last = self._inflight[-1]
            self._inflight.append(
                self._dispatch_block(last["nxt"], last["prog"],
                                     last["snap"], last.get("alive"))
            )
        self.loop_timers["dispatch"] += now_s() - t_start
        t0 = now_s()
        self._consume_block(self._inflight.popleft())  # may set dirty
        self.loop_timers["consume"] += now_s() - t0
        return True

    def _emit(self, request: GenerationRequest, token: int) -> None:
        request.tokens.append(token)
        self.generated_tokens += 1
        if self._metrics is not None:
            self._metrics.generated_tokens_total.inc()
        if request.on_token is not None:
            request.on_token(token)

    def _finished(self, state: _SlotState) -> bool:
        req = state.request
        if req.cancel_flag.is_set():
            return True
        if state.emitted >= req.max_new_tokens:
            return True
        return req.eos_id is not None and state.request.tokens[-1] == req.eos_id

    def _release(self, slot: int, invalidate_carry: bool = True) -> None:
        if invalidate_carry:
            self._membership_dirty = True  # overlap carry is stale now
        with self._lock:
            state = self._slots[slot]
            self._slots[slot] = None
            if self._metrics is not None:
                self._metrics.generation_active_slots.set(
                    sum(s is not None for s in self._slots)
                )
        if state is not None:
            state.request.finished_at = now_s()
            state.request.done.set()
            if self._metrics is not None:
                self._metrics.generation_tokens_per_request.observe(
                    state.emitted
                )
        # paged mode: return the slot's pages to the pool (safe now —
        # any in-flight block's accesses execute before a re-grant's
        # overwrite, see the allocator comment). Under prefix_cache the
        # grant is RETAINED instead so the rows stay valid for hits.
        self._free_slot_pages(slot, retain=True)
        # zero the slot length so the next prefill starts clean
        self.cache = self.cache._replace(
            lengths=self.cache.lengths.at[slot].set(0)
        )
        if self._draft_params is not None:
            self._draft_cache = self._draft_cache._replace(
                lengths=self._draft_cache.lengths.at[slot].set(0)
            )
