# TPU serving image (reference parity: the reference ships a CUDA 11.8
# devel image with StarPU+LibTorch built from source; TPU hosts instead
# need the libtpu-bundled jax wheel and this repo).
FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        build-essential cmake ninja-build \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /app
COPY pyproject.toml README.md ./
COPY starpu_inference_server_tpu ./starpu_inference_server_tpu
COPY native ./native
COPY scripts ./scripts
COPY configs ./configs

# TPU runtime: jax[tpu] pulls libtpu; grpcio/pyyaml/prometheus-client for
# the serving stack
RUN pip install --no-cache-dir \
        "jax[tpu]" -f https://storage.googleapis.com/jax-releases/libtpu_releases.html \
        grpcio pyyaml prometheus-client numpy \
    && pip install --no-cache-dir -e . \
    && scripts/build_native.sh

EXPOSE 8001 9090
ENTRYPOINT ["python", "-m", "starpu_inference_server_tpu.grpc.server"]
CMD ["--config", "configs/resnet18.yml"]
