#!/usr/bin/env bash
# Serve several models: one process per model (the reference's
# deployment model — exactly one model per server process;
# docs/server_guide.md:74 of the reference). Each config must use a
# distinct server.address / metrics_port.
#
# Usage: scripts/serve_multi.sh configs/resnet18.yml configs/bert.yml ...
set -euo pipefail
cd "$(dirname "$0")/.."

PIDS=()
cleanup() {
  for pid in "${PIDS[@]}"; do kill -INT "$pid" 2>/dev/null || true; done
  wait || true
}
trap cleanup EXIT INT TERM

for cfg in "$@"; do
  echo "starting $cfg"
  python -m starpu_inference_server_tpu.grpc.server --config "$cfg" &
  PIDS+=($!)
done
wait
