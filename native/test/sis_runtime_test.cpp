// Native-runtime sanity driver, built standalone so it can run under
// ASan/UBSan/TSan without dragging a Python interpreter into the
// sanitized process (the reference runs its test binaries the same
// way: /root/reference CMakeLists.txt:19-51 ENABLE_SANITIZERS /
// ENABLE_TSAN build modes over the C++ test tree).
//
// Exercises every exported sis_* entry point: aligned allocation and
// the parallel copy pool.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {
void* sis_alloc_aligned(size_t bytes, size_t alignment);
void sis_free_aligned(void* ptr);
void sis_copy_pool_init(int workers);
void sis_parallel_copy(void** dsts, const void** srcs, const size_t* sizes,
                       int count);
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

int main() {
  int rc = 0;
  rc |= test_aligned_alloc();
  rc |= test_parallel_copy();
  if (rc == 0) std::puts("native runtime tests: OK");
  return rc;
}
