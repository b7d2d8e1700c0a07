"""Serving pipeline: bounded queue -> batch collector (3 strategies) ->
lane scheduler -> execution lanes -> result dispatcher.

Reference counterpart: src/starpu_task_worker (InferenceQueue,
BatchCollector + strategies/policies, StarPUTaskRunner, SlotManager,
ResultDispatcher; SURVEY.md section 2.2). The StarPU scheduler that
picked a CPU/CUDA worker per task becomes an explicit lane scheduler
(round-robin / least-loaded / EWMA-latency policies) over per-device
execution lanes.
"""
