"""Native data-plane tests. Skipped when libsis_runtime.so has not been
built (the Python fallbacks are covered by the rest of the suite)."""

import numpy as np
import pytest

from starpu_inference_server_tpu import native_bindings as nb

pytestmark = pytest.mark.skipif(
    not nb.available(), reason="native library not built"
)


def test_aligned_buffer_alignment_and_zeroing():
    buf = nb.aligned_buffer((64, 128), np.float32)
    assert buf.ctypes.data % 4096 == 0
    assert buf.shape == (64, 128)
    assert not buf.any()
    buf[:] = 1.0
    assert buf.sum() == 64 * 128


def test_parallel_copy_correctness():
    rng = np.random.default_rng(0)
    srcs = [rng.standard_normal((100, 300)).astype(np.float32) for _ in range(7)]
    dst = nb.aligned_buffer((700, 300), np.float32)
    nb.parallel_copy([dst[i * 100 : (i + 1) * 100] for i in range(7)], srcs)
    for i in range(7):
        np.testing.assert_array_equal(dst[i * 100 : (i + 1) * 100], srcs[i])


def test_parallel_copy_small_inline_path():
    src = np.arange(10, dtype=np.int32).reshape(1, 10)
    dst = np.zeros((1, 10), np.int32)
    nb.parallel_copy([dst], [src])
    np.testing.assert_array_equal(dst, src)


def test_parallel_copy_noncontiguous_fallback():
    src = np.arange(20, dtype=np.int32).reshape(4, 5)[:, ::2]  # strided
    dst = np.zeros_like(src)
    nb.parallel_copy([dst], [src])
    np.testing.assert_array_equal(dst, src)
