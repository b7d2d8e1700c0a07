// Native data-plane runtime: aligned staging buffers + parallel batch
// assembly.
//
// Reference counterpart: the C++ slot pools and SlotManager staging copy
// (src/core/input_slot_pool.cpp, src/starpu_task_worker/
// slot_manager_component.cpp:392-515 — pinned host buffers, batched
// cudaMemcpyAsync or std::execution::par memcpy). On TPU there is no
// cudaHostAlloc; the equivalents are cache-line/page-aligned host
// buffers (fast numpy views + efficient PJRT host-to-device DMA) and a
// persistent thread pool fanning out the per-request memcpys that
// assemble a padded batch.
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this
// environment). All functions are GIL-free; Python releases the GIL for
// the duration of ctypes calls into this library.

#include <atomic>
#include <condition_variable>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// Aligned buffer allocation (slot-pool backing store)
// ---------------------------------------------------------------------------

void* sis_alloc_aligned(size_t bytes, size_t alignment) {
  if (alignment < sizeof(void*)) alignment = sizeof(void*);
  void* ptr = nullptr;
  if (posix_memalign(&ptr, alignment, bytes) != 0) return nullptr;
  // touch pages so first-use latency does not land on the hot path
  std::memset(ptr, 0, bytes);
  return ptr;
}

void sis_free_aligned(void* ptr) { std::free(ptr); }

// ---------------------------------------------------------------------------
// Persistent copy pool: parallel scatter of request buffers into batch
// offsets
// ---------------------------------------------------------------------------

namespace {

struct CopyTask {
  void* dst;
  const void* src;
  size_t bytes;
};

class CopyPool {
 public:
  explicit CopyPool(int workers) : stop_(false), pending_(0) {
    for (int i = 0; i < workers; ++i) {
      threads_.emplace_back([this] { WorkerLoop(); });
    }
  }

  ~CopyPool() {
    {
      std::lock_guard<std::mutex> lock(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : threads_) t.join();
  }

  void Run(const CopyTask* tasks, int n) {
    if (n <= 0) return;
    {
      std::lock_guard<std::mutex> lock(mu_);
      for (int i = 0; i < n; ++i) queue_.push_back(tasks[i]);
      pending_.fetch_add(n, std::memory_order_relaxed);
    }
    cv_.notify_all();
    // caller participates in draining instead of idling
    DrainOne();
    std::unique_lock<std::mutex> lock(done_mu_);
    done_cv_.wait(lock, [this] {
      return pending_.load(std::memory_order_acquire) == 0;
    });
  }

 private:
  void DrainOne() {
    for (;;) {
      CopyTask task;
      {
        std::lock_guard<std::mutex> lock(mu_);
        if (queue_.empty()) return;
        task = queue_.back();
        queue_.pop_back();
      }
      std::memcpy(task.dst, task.src, task.bytes);
      if (pending_.fetch_sub(1, std::memory_order_acq_rel) == 1) {
        done_cv_.notify_all();
      }
    }
  }

  void WorkerLoop() {
    for (;;) {
      CopyTask task;
      {
        std::unique_lock<std::mutex> lock(mu_);
        cv_.wait(lock, [this] { return stop_ || !queue_.empty(); });
        if (stop_ && queue_.empty()) return;
        task = queue_.back();
        queue_.pop_back();
      }
      std::memcpy(task.dst, task.src, task.bytes);
      if (pending_.fetch_sub(1, std::memory_order_acq_rel) == 1) {
        done_cv_.notify_all();
      }
    }
  }

  std::vector<std::thread> threads_;
  std::vector<CopyTask> queue_;
  std::mutex mu_;
  std::condition_variable cv_;
  std::mutex done_mu_;
  std::condition_variable done_cv_;
  std::atomic<bool> stop_;
  std::atomic<int> pending_;
};

CopyPool* g_pool = nullptr;
std::mutex g_pool_mu;

}  // namespace

void sis_copy_pool_init(int workers) {
  std::lock_guard<std::mutex> lock(g_pool_mu);
  if (g_pool == nullptr) {
    if (workers <= 0) {
      workers = static_cast<int>(std::thread::hardware_concurrency());
      if (workers > 8) workers = 8;
      if (workers < 1) workers = 1;
    }
    g_pool = new CopyPool(workers);
  }
}

// Scatter n copies (dsts[i] <- srcs[i], sizes[i] bytes) across the pool.
// Small total volumes are copied inline: thread handoff costs more than
// the memcpy below ~256 KiB.
void sis_parallel_copy(void** dsts, const void** srcs, const size_t* sizes,
                       int n) {
  size_t total = 0;
  for (int i = 0; i < n; ++i) total += sizes[i];
  if (g_pool == nullptr || total < (256u << 10) || n == 1) {
    for (int i = 0; i < n; ++i) {
      if (sizes[i] > 0) std::memcpy(dsts[i], srcs[i], sizes[i]);
    }
    return;
  }
  // split large segments so the pool load-balances
  std::vector<CopyTask> tasks;
  tasks.reserve(n * 2);
  const size_t kChunk = 1u << 20;  // 1 MiB
  for (int i = 0; i < n; ++i) {
    if (sizes[i] == 0) continue;
    auto* dst = static_cast<char*>(dsts[i]);
    const auto* src = static_cast<const char*>(srcs[i]);
    size_t left = sizes[i];
    while (left > 0) {
      size_t step = left > kChunk ? kChunk : left;
      tasks.push_back({dst, src, step});
      dst += step;
      src += step;
      left -= step;
    }
  }
  g_pool->Run(tasks.data(), static_cast<int>(tasks.size()));
}

}  // extern "C"
