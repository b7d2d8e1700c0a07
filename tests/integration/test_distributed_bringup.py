"""Two-process jax.distributed bring-up on loopback (VERDICT r2 item 8
/ missing 3): proves the coordination path parallel/mesh.py
``initialize_distributed`` claims — two OS processes form ONE global
mesh over a loopback coordinator, run a sharded forward with a real
cross-process collective, and agree with the single-process reference.

The reference is single-node (SURVEY.md section 2.9), but multi-host
scaling is the BASELINE.json north-star axis; without hardware this is
the honest executable evidence of the coordination layer.
"""

import json
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent.parent

WORKER = r"""
import json, os, sys
import jax

# each process contributes 2 virtual CPU devices -> global mesh of 4
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["SIS_REPO"])
from starpu_inference_server_tpu.parallel.mesh import initialize_distributed

pid = int(sys.argv[1])
initialize_distributed(
    coordinator_address=os.environ["SIS_COORD"],
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4, jax.devices()  # GLOBAL device view

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from starpu_inference_server_tpu.models.decoder import (
    forward_logits, get_spec, init_params,
)
from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree
from starpu_inference_server_tpu.parallel.partition import (
    partition_rules_for, shard_params,
)

spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                               "kv_heads": 2, "intermediate": 256,
                               "vocab": 128})
params = maybe_quantize_tree(init_params(spec, np.random.default_rng(0)), 8)

mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2), ("data", "model"))
params = shard_params(params, mesh, partition_rules_for("llama"))
ids = np.tile(np.arange(1, 9, dtype=np.int32), (4, 1))  # [4, 8]
ids_sharded = jax.device_put(
    jnp.asarray(ids), NamedSharding(mesh, P("data", None))
)

with mesh:
    logits = jax.jit(
        lambda p, x: forward_logits(spec, p, x, jnp.float32),
        out_shardings=NamedSharding(mesh, P()),
    )(params, ids_sharded)

# every process sees the full replicated result
out = np.asarray(logits)
print("RESULT " + json.dumps({
    "pid": pid,
    "shape": list(out.shape),
    "digest": float(np.abs(out).mean()),
    "sample": out[0, -1, :8].tolist(),
}), flush=True)
"""


WORKER_DECODE = r"""
import json, os, sys
import jax

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()
jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.environ["SIS_REPO"])
from starpu_inference_server_tpu.parallel.mesh import initialize_distributed

pid = int(sys.argv[1])
initialize_distributed(
    coordinator_address=os.environ["SIS_COORD"],
    num_processes=2,
    process_id=pid,
)
assert jax.process_count() == 2

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from starpu_inference_server_tpu.models.decoder import get_spec, init_params
from starpu_inference_server_tpu.serving.generation import (
    GenerationEngine, GenerationRequest,
)

spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                               "kv_heads": 2, "intermediate": 256,
                               "vocab": 128})
params = init_params(spec, np.random.default_rng(0))

# data axis SPANS the two processes (each contributes 2 devices);
# KV slots shard over it, weights go tensor-parallel over 'model'
mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2), ("data", "model"))

eng = GenerationEngine(
    spec, params, dtype=jnp.float32, num_slots=4, max_len=64,
    prefill_buckets=[8], mesh=mesh, family="llama-tiny",
    steps_per_sync=2,
)
# SPMD host replication: both processes submit the SAME requests in the
# same order BEFORE the loop starts, so every jitted dispatch carries
# identical args on both hosts and device collectives rendezvous.
prompts = ([3, 7, 11], [5, 2], [9, 1, 4])
reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                          max_new_tokens=6) for p in prompts]
for r in reqs:
    eng.submit(r)
eng.start()
tokens = [r.result(timeout=300) for r in reqs]
eng.stop()
print("RESULT " + json.dumps({"pid": pid, "tokens": tokens}), flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_two_process(tmp_path, worker_src, timeout=300):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(worker_src)
    port = _free_port()
    env = dict(
        __import__("os").environ,
        SIS_REPO=str(REPO),
        SIS_COORD=f"127.0.0.1:{port}",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=tmp_path,
        )
        for i in range(2)
    ]
    results = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed bring-up timed out")
        assert p.returncode == 0, err[-3000:]
        line = next(ln for ln in out.splitlines() if ln.startswith("RESULT "))
        results.append(json.loads(line[len("RESULT "):]))
    return results


def test_two_process_generation_engine_decode(tmp_path):
    """The GenerationEngine itself (prefill + continuous-batching decode
    blocks + commit) over a mesh whose DATA axis spans two OS processes:
    both hosts run the replicated SPMD loop, the decode program's token
    block all-gathers at the tail (``_rep_for_host``) so each host's
    fetch is local, and both hosts commit the same tokens — which must
    equal the plain single-process engine's greedy output. This is the
    most multi-host decode correctness obtainable without a pod slice
    (VERDICT r3 item 7)."""
    results = _run_two_process(tmp_path, WORKER_DECODE)
    assert {r["pid"] for r in results} == {0, 1}
    assert results[0]["tokens"] == results[1]["tokens"]

    # single-process (no jax.distributed) plain-engine reference
    import jax.numpy as jnp
    import numpy as np

    from starpu_inference_server_tpu.models.decoder import (
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.serving.generation import (
        GenerationEngine,
        GenerationRequest,
    )

    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128,
                                   "q_heads": 4, "kv_heads": 2,
                                   "intermediate": 256, "vocab": 128})
    params = init_params(spec, np.random.default_rng(0))
    eng = GenerationEngine(spec, params, dtype=jnp.float32, num_slots=4,
                           max_len=64, prefill_buckets=[8],
                           steps_per_sync=2)
    eng.start()
    try:
        reqs = [GenerationRequest(prompt_ids=np.asarray(p, np.int32),
                                  max_new_tokens=6)
                for p in ([3, 7, 11], [5, 2], [9, 1, 4])]
        for r in reqs:
            eng.submit(r)
        refs = [r.result(timeout=180) for r in reqs]
    finally:
        eng.stop()
    assert results[0]["tokens"] == refs


def test_two_process_global_mesh_forward(tmp_path):
    worker_py = tmp_path / "worker.py"
    worker_py.write_text(WORKER)
    port = _free_port()
    env = dict(
        __import__("os").environ,
        SIS_REPO=str(REPO),
        SIS_COORD=f"127.0.0.1:{port}",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_py), str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env, cwd=tmp_path,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed bring-up timed out")
        assert p.returncode == 0, err[-3000:]
        outs.append(out)

    results = []
    for out in outs:
        line = next(ln for ln in out.splitlines() if ln.startswith("RESULT "))
        results.append(json.loads(line[len("RESULT "):]))
    assert {r["pid"] for r in results} == {0, 1}
    assert results[0]["shape"] == [4, 8, 128]
    # both processes computed the SAME replicated logits
    assert results[0]["sample"] == pytest.approx(results[1]["sample"],
                                                 rel=1e-5)

    # and they match a single-process (no jax.distributed) reference
    import jax
    import jax.numpy as jnp

    from starpu_inference_server_tpu.models.decoder import (
        forward_logits,
        get_spec,
        init_params,
    )
    from starpu_inference_server_tpu.ops.quant import maybe_quantize_tree

    spec = get_spec("llama-tiny", {"layers": 2, "hidden": 128, "q_heads": 4,
                                   "kv_heads": 2, "intermediate": 256,
                                   "vocab": 128})
    params = maybe_quantize_tree(
        init_params(spec, np.random.default_rng(0)), 8
    )
    ids = np.tile(np.arange(1, 9, dtype=np.int32), (4, 1))
    ref = np.asarray(
        jax.jit(lambda p, x: forward_logits(spec, p, x, jnp.float32))(
            jax.device_put(params), jnp.asarray(ids)
        )
    )
    assert results[0]["sample"] == pytest.approx(
        ref[0, -1, :8].tolist(), rel=1e-4, abs=1e-4
    )
