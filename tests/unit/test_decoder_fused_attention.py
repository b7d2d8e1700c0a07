"""decode_step with the fused Pallas attention path (interpret mode)
must produce the same greedy tokens as the jnp path."""

import jax.numpy as jnp
import numpy as np
import pytest

from starpu_inference_server_tpu.models.decoder import (
    decode_step,
    get_spec,
    init_cache,
    init_params,
    prefill,
)
from starpu_inference_server_tpu.ops import nn
from starpu_inference_server_tpu.ops import decode_attention as da


@pytest.fixture
def fused_interpret():
    da.set_interpret(True)
    nn.set_use_pallas(True)
    yield
    nn.set_use_pallas(False)
    da.set_interpret(False)


def test_fused_path_matches_jnp(fused_interpret):
    # head_dim 64 and max_len 128 satisfy the fused-kernel gate
    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 256, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    assert spec.head_dim == 64
    params = init_params(spec, np.random.default_rng(0))
    prompt = np.random.default_rng(1).integers(0, 128, (5,), np.int32)

    def run(use_fused):
        nn.set_use_pallas(use_fused)
        cache = init_cache(spec, 2, 128)
        cache, logits = prefill(
            spec, params, cache, jnp.asarray(prompt), jnp.int32(len(prompt)),
            jnp.int32(0), jnp.float32,
        )
        toks = [int(jnp.argmax(logits))]
        active = jnp.asarray([True, False])
        for _ in range(4):
            ids = jnp.asarray([toks[-1], 0], jnp.int32)
            cache, logits = decode_step(
                spec, params, cache, ids, active, jnp.float32
            )
            toks.append(int(jnp.argmax(logits[0])))
        return toks

    assert run(True) == run(False)
