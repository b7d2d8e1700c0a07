#!/usr/bin/env bash
# Build the native data-plane library (libsis_runtime.so) + test driver.
#
#   scripts/build_native.sh           release build into native_lib/
#   scripts/build_native.sh --asan    ASan+UBSan build (build-asan/) and
#                                     run the native test driver under it
#   scripts/build_native.sh --tsan    same with ThreadSanitizer
set -euo pipefail
cd "$(dirname "$0")/../native"

mode="${1:-release}"
case "$mode" in
  --asan)
    cmake -S . -B build-asan -G Ninja -DENABLE_SANITIZERS=ON >/dev/null
    cmake --build build-asan >/dev/null
    ./build-asan/sis_runtime_test
    ;;
  --tsan)
    cmake -S . -B build-tsan -G Ninja -DENABLE_TSAN=ON >/dev/null
    cmake --build build-tsan >/dev/null
    ./build-tsan/sis_runtime_test
    ;;
  *)
    cmake -S . -B build -G Ninja >/dev/null
    cmake --build build >/dev/null
    ./build/sis_runtime_test
    echo "built: $(ls ../starpu_inference_server_tpu/native_lib/libsis_runtime.so)"
    ;;
esac
