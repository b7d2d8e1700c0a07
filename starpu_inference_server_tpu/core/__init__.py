"""Core runtime: jobs, timing, staging pools, the bucketed jit engine,
execution lanes and warmup.

Reference counterpart: src/core (StarPUSetup + codelets, InferenceJob,
slot pools, TensorBuilder, model loader, warmup; SURVEY.md section 2.1).
The StarPU codelet + worker-scheduler pair becomes: per-device execution
lanes draining prepared batches into ``jax.jit``-compiled model calls,
with batch sizes padded to a fixed bucket set so XLA compiles once per
bucket instead of resizing buffers per request.
"""
