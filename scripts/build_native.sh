#!/usr/bin/env bash
# Build the native data-plane library (libsis_runtime.so).
set -euo pipefail
cd "$(dirname "$0")/../native"
cmake -S . -B build -G Ninja >/dev/null
cmake --build build >/dev/null
echo "built: $(ls ../starpu_inference_server_tpu/native_lib/libsis_runtime.so)"
