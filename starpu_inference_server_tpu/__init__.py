"""TPU-native inference serving framework.

A from-scratch re-design of the capability surface of
daxmawal/StarPU-Inference-Server (C++/StarPU/LibTorch/CUDA) for TPU:

- compute path: JAX / XLA / Pallas (``jax.jit`` model graphs, INT8
  weight-only quantization with Pallas dequant-matmul kernels)
- scheduling: async per-device execution lanes fed by a batching layer
  (disabled / fixed / adaptive strategies) with congestion detection
- distribution: ``jax.sharding.Mesh`` + NamedSharding over ICI/DCN
  (the reference is single-node; see SURVEY.md section 2.9)
- front door: KServe-v2 style gRPC ``ModelInfer`` with per-phase
  server-side timing extensions (reference: src/proto/grpc_service.proto)

Nothing here is a port: the reference defines *what* (features, RPCs,
batching semantics, observability contract), this package defines *how*
in TPU-idiomatic terms (static shapes, batch-size buckets instead of
buffer resize, jit-cache priming instead of GPU warmup, shardings
instead of replica cloning).
"""

__version__ = "0.1.0"
