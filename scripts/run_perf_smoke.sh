#!/usr/bin/env bash
# Perf smoke: start the server, replay the CI schedule, gate the summary.
#
# Reference counterpart: the perf job in .github/workflows/ci.yml:625-724
# (server + client_example schedule replay + check_perf_summary.py).
#
# Usage: scripts/run_perf_smoke.sh [config] [schedule] [expected_requests]
set -euo pipefail
cd "$(dirname "$0")/.."

CONFIG="${1:-ci/perf/resnet152_ci_perf.yml}"
SCHEDULE="${2:-ci/perf/ci_perf_resnet_smoke.csv}"
EXPECTED="${3:-64}"
SUMMARY="${SUMMARY:-/tmp/perf_summary.json}"
TARGET="${TARGET:-127.0.0.1:8001}"

python -m starpu_inference_server_tpu.grpc.server --config "$CONFIG" &
SERVER_PID=$!
trap 'kill $SERVER_PID 2>/dev/null || true' EXIT

python -m starpu_inference_server_tpu.clients.client \
  --target "$TARGET" \
  --model "$(python -c "import yaml,sys; print(yaml.safe_load(open('$CONFIG'))['name'])")" \
  --input input:3x224x224:FP32 \
  --schedule "$SCHEDULE" \
  --ready-timeout-s "${READY_TIMEOUT_S:-900}" \
  --summary-json "$SUMMARY" \
  --validate

kill -INT $SERVER_PID
wait $SERVER_PID || true

python scripts/check_perf_summary.py \
  --summary "$SUMMARY" \
  --latency-metric server_overall \
  --max-latency-p95-ms "${MAX_P95_MS:-500}" \
  --min-throughput-rps "${MIN_RPS:-10}" \
  --max-rejected 0 \
  --expected-requests "$EXPECTED"
