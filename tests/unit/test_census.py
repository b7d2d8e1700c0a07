"""parallel/census.py: collective classification by spanned mesh axes —
the audit tool for 'collectives ride ICI, not DCN' on the two-tier
v5e-16 mesh (data over hosts x model within a host)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from starpu_inference_server_tpu.parallel.census import (
    _parse_groups,
    collectives_by_axis,
)
from starpu_inference_server_tpu.parallel.mesh import (
    MeshAxes,
    make_device_mesh,
)


def test_parse_explicit_groups():
    assert _parse_groups("{{0,1},{2,3}}") == [[0, 1], [2, 3]]


def test_parse_iota_groups():
    # [2,2]<=[4]: iota 0..3 chunked into 2 groups of 2
    assert _parse_groups("[2,2]<=[4]") == [[0, 1], [2, 3]]
    # transpose form: devices = arange(4).reshape(2,2).T.flatten()
    assert _parse_groups("[2,2]<=[2,2]T(1,0)") == [[0, 2], [1, 3]]


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_tp_allreduce_spans_model_axis_only():
    """A psum over 'model' must census as model-axis-only: nothing
    crosses the data (host/DCN) tier."""
    mesh = make_device_mesh(MeshAxes(data=2, model=2))

    def f(x):
        return jax.lax.psum(x, "model")

    from jax import shard_map

    fn = jax.jit(shard_map(
        f, mesh=mesh, in_specs=P("data", "model"),
        out_specs=P("data", "model"),
    ))
    x = jax.device_put(
        jnp.arange(16.0).reshape(4, 4),
        NamedSharding(mesh, P("data", "model")),
    )
    hlo = fn.lower(x).compile().as_text()
    census = collectives_by_axis(hlo, mesh)
    all_labels = {label for kinds in census.values() for label in kinds}
    assert all_labels, f"no collectives found in:\n{hlo[:2000]}"
    assert all_labels == {"model"}, census


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_dp_psum_spans_data_axis():
    mesh = make_device_mesh(MeshAxes(data=2, model=2))
    from jax import shard_map

    fn = jax.jit(shard_map(
        lambda x: jax.lax.psum(x, "data"), mesh=mesh,
        in_specs=P("data", "model"), out_specs=P("data", "model"),
    ))
    x = jax.device_put(
        jnp.arange(16.0).reshape(4, 4),
        NamedSharding(mesh, P("data", "model")),
    )
    census = collectives_by_axis(fn.lower(x).compile().as_text(), mesh)
    all_labels = {label for kinds in census.values() for label in kinds}
    assert "data" in all_labels, census
    assert "model" not in all_labels, census


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 devices")
def test_decode_block_census_by_axis():
    """The GenerationEngine's decode block under a data x model mesh:
    TP collectives must stay on 'model' (ICI); only the host-read
    all-gather at the program tail may span 'data'."""
    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.serving.generation import (
        GenerationEngine,
    )

    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128,
                                   "q_heads": 4, "kv_heads": 2,
                                   "intermediate": 256, "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    mesh = make_device_mesh(MeshAxes(data=2, model=2))
    eng = GenerationEngine(
        spec, params, dtype=jnp.float32, num_slots=4, max_len=64,
        prefill_buckets=[8], mesh=mesh, family="llama-tiny",
        steps_per_sync=2,
    )
    s = 4
    sh = eng._slot_sharding

    def vec(v):
        return jax.device_put(jnp.asarray(v), sh)

    cache = eng.cache._replace(lengths=vec(np.full((s,), 8, np.int32)))
    lowered = eng._decode.lower(
        eng.params, cache, vec(np.ones((s,), np.int32)),
        vec(np.ones((s,), bool)), vec(np.zeros((s,), np.float32)),
        vec(np.zeros((s,), np.int32)), vec(np.zeros((s,), np.uint32)),
        vec(np.ones((s,), np.int32)), vec(np.full((s,), -1, np.int32)),
        vec(np.full((s,), 1 << 30, np.int32)),
    )
    census = collectives_by_axis(lowered.compile().as_text(), mesh)
    assert census, "decode program lowered with no collectives"
    # TP reductions exist and ride the model axis
    reduce_labels = set(census.get("all-reduce", {}))
    assert reduce_labels and all(
        lab in ("model", "self") for lab in reduce_labels
    ), census
