"""Device-side completion (serving/generation.py _decode_and_sample):
the alive carry must freeze a slot exactly at its EOS/budget on device
— no cache-length advancement, no sampling-progress drift — and the
fetch watchdog must fail requests instead of hanging when a fetch never
resolves."""

import concurrent.futures
import threading

import numpy as np
import pytest

import jax.numpy as jnp

from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine,
    GenerationRequest,
)

TINY = {"layers": 1, "hidden": 64, "q_heads": 2, "kv_heads": 1,
        "intermediate": 64, "vocab": 32}


@pytest.fixture(scope="module")
def setup():
    spec = get_spec("llama-tiny", TINY)
    params = init_params(spec, np.random.default_rng(0))
    return spec, params


def test_budget_freezes_slot_mid_block(setup):
    """limit hit at step 2 of a 4-step block: the slot's cache length
    advances exactly 2 rows and its progress stops at the limit, while
    a budget-free neighbor advances all 4."""
    spec, params = setup
    eng = GenerationEngine(spec, params, dtype=jnp.float32, num_slots=2,
                           max_len=32, prefill_buckets=[4],
                           steps_per_sync=4)
    cache = eng.cache._replace(lengths=jnp.asarray([4, 4], jnp.int32))
    ids = jnp.asarray([1, 2], jnp.int32)
    active = jnp.asarray([True, True])
    zeros = jnp.zeros((2,), jnp.float32)
    izeros = jnp.zeros((2,), jnp.int32)
    seeds = jnp.zeros((2,), jnp.uint32)
    progress = jnp.asarray([3, 0], jnp.int32)   # slot 0 already emitted 3
    eos = jnp.asarray([-1, -1], jnp.int32)
    limit = jnp.asarray([5, 100], jnp.int32)    # slot 0 may emit 2 more

    cache2, tokens, nxt, prog, alive = eng._decode_and_sample(
        eng.params, cache, ids, active, zeros, izeros, seeds, progress,
        eos, limit,
    )
    lengths = np.asarray(cache2.lengths)
    assert lengths[0] == 4 + 2          # froze after its 2 budgeted steps
    assert lengths[1] == 4 + 4
    prog = np.asarray(prog)
    assert prog[0] == 5 and prog[1] == 4
    alive = np.asarray(alive)
    assert not alive[0] and alive[1]
    # frozen slot repeats its last token in the remaining steps
    toks = np.asarray(tokens)
    assert toks[2, 0] == toks[1, 0] and toks[3, 0] == toks[1, 0]


def test_eos_freezes_slot_on_device(setup):
    """A slot whose sampled token equals its eos freezes from the next
    step on (the EOS token itself is still recorded)."""
    spec, params = setup
    eng = GenerationEngine(spec, params, dtype=jnp.float32, num_slots=1,
                           max_len=32, prefill_buckets=[4],
                           steps_per_sync=6)
    cache = eng.cache._replace(lengths=jnp.asarray([4], jnp.int32))
    args = dict(
        ids=jnp.asarray([1], jnp.int32),
        active=jnp.asarray([True]),
        temps=jnp.zeros((1,), jnp.float32),
        top_k=jnp.zeros((1,), jnp.int32),
        seeds=jnp.zeros((1,), jnp.uint32),
        progress=jnp.zeros((1,), jnp.int32),
    )
    # free-run first to find which token the model emits at step 2
    _, tokens, _, _, _ = eng._decode_and_sample(
        eng.params, cache, args["ids"], args["active"], args["temps"],
        args["top_k"], args["seeds"], args["progress"],
        jnp.asarray([-1], jnp.int32), jnp.asarray([100], jnp.int32),
    )
    probe = np.asarray(tokens)[:, 0].tolist()
    eos = probe[2]
    stop = probe.index(eos)  # first occurrence (may be < 2)

    cache = eng.cache._replace(lengths=jnp.asarray([4], jnp.int32))
    cache2, tokens2, _, prog, alive = eng._decode_and_sample(
        eng.params, cache, args["ids"], args["active"], args["temps"],
        args["top_k"], args["seeds"], args["progress"],
        jnp.asarray([eos], jnp.int32), jnp.asarray([100], jnp.int32),
    )
    toks2 = np.asarray(tokens2)[:, 0].tolist()
    assert toks2[: stop + 1] == probe[: stop + 1]
    assert not bool(np.asarray(alive)[0])
    assert int(np.asarray(prog)[0]) == stop + 1
    assert int(np.asarray(cache2.lengths)[0]) == 4 + stop + 1


class _NeverPool:
    """submit() returns a future that never resolves."""

    alive = True

    def submit(self, fn, *a, **kw):
        return concurrent.futures.Future()

    def shutdown(self, drain=True):
        pass


def test_fetch_watchdog_fails_requests_not_hangs(setup):
    spec, params = setup
    eng = GenerationEngine(spec, params, dtype=jnp.float32, num_slots=1,
                           max_len=32, prefill_buckets=[4],
                           steps_per_sync=2, fetch_timeout_s=0.5)
    eng._fetch_pool = _NeverPool()
    eng.start()
    try:
        req = GenerationRequest(prompt_ids=np.asarray([1, 2], np.int32),
                                max_new_tokens=4)
        eng.submit(req)
        with pytest.raises(RuntimeError, match="transport wedged"):
            req.result(timeout=60)
    finally:
        eng.stop()


def test_stop_returns_with_wedged_fetch_in_flight(setup):
    """ADVICE round-2 medium: stop() must never join a wedged device
    fetch. A _FetchPool worker stuck forever inside np.asarray (the
    tunnel failure mode) must not block stop() or pool shutdown."""
    import threading
    import time

    from starpu_inference_server_tpu.serving.generation import _FetchPool

    pool = _FetchPool(workers=2, name="test-fetch")
    release = threading.Event()
    pool.submit(release.wait)  # wedges worker 0 "forever"
    ok = pool.submit(lambda: 42)
    assert ok.result(timeout=10) == 42  # other workers still serve
    t0 = time.monotonic()
    pool.shutdown(drain=True)  # must not wait on the wedged worker
    assert time.monotonic() - t0 < 1.0
    assert not pool.alive
    release.set()

    # engine-level: stop() with a wedged pool returns promptly and a
    # restart gets a fresh, working pool
    spec, params = setup
    eng = GenerationEngine(spec, params, dtype=jnp.float32, num_slots=1,
                           max_len=32, prefill_buckets=[4],
                           steps_per_sync=2, fetch_timeout_s=0.5)
    wedge = threading.Event()
    eng._fetch_pool.submit(wedge.wait)
    eng.start()
    t0 = time.monotonic()
    eng.stop()
    assert time.monotonic() - t0 < 35.0
    wedge.set()
    eng.start()
    assert eng._fetch_pool.alive
    toks = eng.generate(np.asarray([1, 2], np.int32), max_new_tokens=3,
                        timeout=120)
    assert len(toks) == 3
    eng.stop()
