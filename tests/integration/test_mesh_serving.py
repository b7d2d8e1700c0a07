"""Mesh-mode serving: the full pipeline executing over a (data, model)
mesh of virtual CPU devices — the TaskRunner path the multi-host
deployment uses (one logical executor, sharded params, batch sharded
over the data axis)."""

import numpy as np
import pytest

from starpu_inference_server_tpu.core.engine import ModelEngine
from starpu_inference_server_tpu.models import build_model
from starpu_inference_server_tpu.serving.queue import InferenceQueue
from starpu_inference_server_tpu.serving.runner import TaskRunner
from starpu_inference_server_tpu.utils.config import parse_config
from tests.integration.test_pipeline import Collector

pytestmark = pytest.mark.slow



def mesh_cfg(data=2, model=4):
    return parse_config({
        "name": "bert_mesh",
        "model": {
            "family": "bert-base-uncased",
            "compute_dtype": "FP32",
            "quantization": "int8",
            "options": {"seq_len": 8, "vocab_size": 256},
        },
        "inputs": [
            {"name": "input_ids", "dims": [8], "dtype": "INT64"},
            {"name": "attention_mask", "dims": [8], "dtype": "INT64"},
        ],
        "outputs": [
            {"name": "last_hidden_state", "dims": [8, 768], "dtype": "FP32"},
        ],
        "pool_size": 2,
        "max_batch_size": 4,
        "batch_coalesce_timeout_ms": 5.0,
        "batching_strategy": "fixed",
        "fixed_batching": {"batch_size": 4},
        "max_queue_size": 64,
        "max_inflight_tasks": 4,
        "congestion": {"enabled": False},
        "metrics_enabled": False,
        "devices": {"mesh": {"data": data, "model": model}},
    })


@pytest.fixture(scope="module")
def runner():
    cfg = mesh_cfg()
    model = build_model(cfg.model, seed=cfg.seed)
    engine = ModelEngine(cfg, model)
    queue = InferenceQueue(cfg.max_queue_size)
    r = TaskRunner(cfg, engine, queue)
    r.start()
    yield r, queue, model
    r.stop(drain=False)


def test_engine_is_single_logical_executor(runner):
    r, _, _ = runner
    assert r.engine.num_devices() == 1
    assert len(r.lanes) == 1
    assert r.engine.mesh is not None
    assert "mesh" in r.lanes[0].name()


def test_mesh_pipeline_matches_unsharded(runner):
    r, queue, model = runner
    rng = np.random.default_rng(0)
    c = Collector(4)
    jobs = []
    for i in range(4):
        ids = rng.integers(0, 256, (1, 8)).astype(np.int64)
        mask = np.ones((1, 8), np.int64)
        from starpu_inference_server_tpu.core.job import InferenceJob

        job = InferenceJob(
            {"input_ids": ids, "attention_mask": mask},
            request_id=f"m{i}", completion=c,
        )
        job.timing.stamp("enqueued_at")
        queue.push(job)
        jobs.append((job, ids, mask))
    assert c.done.wait(timeout=120)
    assert not c.errors
    import jax.numpy as jnp

    for job, ids, mask in jobs:
        ref = model.apply({
            "input_ids": jnp.asarray(ids),
            "attention_mask": jnp.asarray(mask),
        })["last_hidden_state"]
        got = c.results[job.request_id]["last_hidden_state"]
        np.testing.assert_allclose(
            got, np.asarray(ref), rtol=5e-4, atol=5e-4
        )


def test_bucket_granularity_respects_data_axis(runner):
    r, _, _ = runner
    # data axis = 2: bucket 1 must round up to 2
    assert r.engine.effective_bucket(1) == 2
    assert r.engine.effective_bucket(4) == 4
    assert 1 not in r.engine.buckets
