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


class TestNativeTokenQueue:
    def test_fifo(self):
        q = nb.NativeTokenQueue(8)
        for i in range(5):
            assert q.push(i) == q.PUSH_OK
        got = [q.pop(0.1)[1] for _ in range(5)]
        assert got == [0, 1, 2, 3, 4]

    def test_full_and_closed(self):
        q = nb.NativeTokenQueue(2)
        q.push(1)
        q.push(2)
        assert q.push(3) == q.PUSH_FULL
        q.close_for_push()
        assert q.push(4) == q.PUSH_CLOSED
        assert q.size() == 2

    def test_pop_timeout(self):
        q = nb.NativeTokenQueue(2)
        rc, _ = q.pop(0.05)
        assert rc == q.POP_TIMEOUT

    def test_shutdown_wakes(self):
        import threading

        q = nb.NativeTokenQueue(2)
        results = []

        def consumer():
            results.append(q.pop(5.0)[0])

        t = threading.Thread(target=consumer)
        t.start()
        q.shutdown()
        t.join(timeout=2.0)
        assert not t.is_alive()
        assert results == [q.POP_SHUTDOWN]

    def test_concurrent_producers_consumers(self):
        import threading

        q = nb.NativeTokenQueue(64)
        seen = []
        lock = threading.Lock()

        def producer(base):
            for i in range(100):
                while q.push(base + i) != q.PUSH_OK:
                    pass

        def consumer():
            while True:
                rc, v = q.pop(0.5)
                if rc != q.POP_OK:
                    return
                with lock:
                    seen.append(v)

        producers = [threading.Thread(target=producer, args=(k * 1000,))
                     for k in range(3)]
        consumers = [threading.Thread(target=consumer) for _ in range(2)]
        for t in producers + consumers:
            t.start()
        for t in producers:
            t.join()
        import time
        time.sleep(0.2)
        q.shutdown()
        for t in consumers:
            t.join()
        assert sorted(seen) == sorted(
            k * 1000 + i for k in range(3) for i in range(100)
        )
