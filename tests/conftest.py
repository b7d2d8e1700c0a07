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
