"""Test bootstrap: force JAX onto a virtual 8-device CPU platform.

This is the TPU analogue of the reference's fake-StarPU test seam
(STARPU_TESTING=1 + link-time overrides; reference: tests/CMakeLists.txt:17,
tests/support/starpu_task_submit_override.hpp): all device-topology
behavior (lanes, meshes, shardings) is exercised against virtual CPU
devices, no TPU required.

Must run before any jax import, hence the env mutation at module import
time in conftest (pytest imports conftest first).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # override the ambient TPU platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The TPU PJRT plugin in this environment force-registers itself and
# overrides JAX_PLATFORMS at import; counter-override via jax.config so
# tests always run on the virtual 8-device CPU platform.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# Individually slow tests (>4 s on the 2-CPU dev box) excluded from the
# fast feedback loop (`pytest -m "not slow"`); whole slow MODULES carry
# a module-level pytestmark instead. Keep this list in sync with
# `--durations` output when tests are added.
_SLOW_TESTS = {
    "test_sharded_forward_int8_quantized",
    "test_sharded_forward_matches_single_device",
    "test_prefill_paths_match_with_kernels_enabled",
    "test_concurrent_generations_match_solo",
    "test_single_generation",
    "test_verify_step_matches_with_kernel_enabled",
    "test_paged_decode_step_fused_matches_fallback",
    "test_bert_mask_changes_output",
    "test_bert_forward_shape",
    "test_bert_w8a8_close_to_weight_only",
    "test_resnet_forward_shape[wide_resnet50_2]",
    "test_resnet_forward_shape[resnet50]",
    "test_prefill_then_decode_matches_full_forward",
    "test_moe_forward_and_decode_parity",
    "test_moe_expert_parallel_matches_unsharded",
    "test_moe_quantized_experts_close_to_dense",
    "test_fused_path_matches_jnp",
    "test_verify_step_matches_sequential_decode",
    "test_speculative_pipelined_matches_plain[pipe2]",
    "test_speculative_pipelined_matches_plain[pipe2xtp2]",
    "test_overlap_slot_churn_matches_solo",
    "test_vit_forward_shape",
    "test_data_parallel_resnet",
    "test_sharded_params_placement",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
