// Native-runtime sanity driver, built standalone so it can run under
// ASan/UBSan/TSan without dragging a Python interpreter into the
// sanitized process (the reference runs its test binaries the same
// way: /root/reference CMakeLists.txt:19-51 ENABLE_SANITIZERS /
// ENABLE_TSAN build modes over the C++ test tree).
//
// Exercises every exported sis_* entry point: aligned allocation,
// the parallel copy pool, and the MPMC token queue under concurrent
// producers/consumers with close-for-push and shutdown.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {
void* sis_alloc_aligned(size_t bytes, size_t alignment);
void sis_free_aligned(void* ptr);
void sis_copy_pool_init(int workers);
void sis_parallel_copy(void** dsts, const void** srcs, const size_t* sizes,
                       int count);
void* sis_queue_create(size_t capacity);
void sis_queue_destroy(void* q);
int sis_queue_push(void* q, uint64_t token);
int sis_queue_pop(void* q, uint64_t* token, int64_t timeout_us);
void sis_queue_close_for_push(void* q);
void sis_queue_shutdown(void* q);
}

#define CHECK(cond)                                                      \
  do {                                                                   \
    if (!(cond)) {                                                       \
      std::fprintf(stderr, "FAILED: %s at %s:%d\n", #cond, __FILE__,     \
                   __LINE__);                                            \
      return 1;                                                          \
    }                                                                    \
  } while (0)

static int test_aligned_alloc() {
  for (size_t align : {64u, 128u, 4096u}) {
    void* p = sis_alloc_aligned(1 << 20, align);
    CHECK(p != nullptr);
    CHECK(reinterpret_cast<uintptr_t>(p) % align == 0);
    std::memset(p, 0xAB, 1 << 20);
    sis_free_aligned(p);
  }
  return 0;
}

static int test_parallel_copy() {
  sis_copy_pool_init(4);
  constexpr int kN = 8;
  constexpr size_t kBytes = 256 * 1024;
  std::vector<std::vector<uint8_t>> src(kN), dst(kN);
  std::vector<void*> dsts(kN);
  std::vector<const void*> srcs(kN);
  std::vector<size_t> sizes(kN);
  for (int i = 0; i < kN; ++i) {
    src[i].assign(kBytes, static_cast<uint8_t>(i + 1));
    dst[i].assign(kBytes, 0);
    dsts[i] = dst[i].data();
    srcs[i] = src[i].data();
    sizes[i] = kBytes;
  }
  sis_parallel_copy(dsts.data(), srcs.data(), sizes.data(), kN);
  for (int i = 0; i < kN; ++i) {
    CHECK(std::memcmp(dst[i].data(), src[i].data(), kBytes) == 0);
  }
  return 0;
}

static int test_queue_concurrent() {
  void* q = sis_queue_create(64);
  constexpr int kProducers = 4, kConsumers = 4, kPerProducer = 2000;
  std::atomic<long> popped{0}, sum{0};
  std::vector<std::thread> threads;
  for (int p = 0; p < kProducers; ++p) {
    threads.emplace_back([&, p] {
      for (int i = 0; i < kPerProducer; ++i) {
        while (sis_queue_push(q, static_cast<uint64_t>(i) + 1) != 0) {
          std::this_thread::yield();  // full: retry (fail-fast contract)
        }
      }
    });
  }
  for (int c = 0; c < kConsumers; ++c) {
    threads.emplace_back([&] {
      uint64_t tok = 0;
      while (sis_queue_pop(q, &tok, 50'000) == 0) {
        popped.fetch_add(1);
        sum.fetch_add(static_cast<long>(tok));
      }
    });
  }
  for (int p = 0; p < kProducers; ++p) threads[p].join();
  sis_queue_close_for_push(q);
  CHECK(sis_queue_push(q, 99) != 0);  // closed for push
  for (int c = 0; c < kConsumers; ++c) threads[kProducers + c].join();
  CHECK(popped.load() == kProducers * kPerProducer);
  long expect = static_cast<long>(kProducers) * kPerProducer *
                (kPerProducer + 1) / 2;
  CHECK(sum.load() == expect);
  sis_queue_shutdown(q);
  sis_queue_destroy(q);
  return 0;
}

static int test_queue_shutdown_unblocks() {
  void* q = sis_queue_create(4);
  std::thread waiter([&] {
    uint64_t tok;
    (void)sis_queue_pop(q, &tok, -1);  // block until shutdown
  });
  std::this_thread::sleep_for(std::chrono::milliseconds(20));
  sis_queue_shutdown(q);
  waiter.join();
  sis_queue_destroy(q);
  return 0;
}

int main() {
  int rc = 0;
  rc |= test_aligned_alloc();
  rc |= test_parallel_copy();
  rc |= test_queue_concurrent();
  rc |= test_queue_shutdown_unblocks();
  if (rc == 0) std::puts("native runtime tests: OK");
  return rc;
}
