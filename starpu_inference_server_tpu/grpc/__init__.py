"""KServe-v2 gRPC front door.

Reference counterpart: src/proto (protocol) + src/grpc/server (async
completion-queue server, ModelInfer handling, I/O validation). The
protocol is restated compactly in kserve_v2.proto with wire-compatible
field numbers, including the reference's per-phase timing extension
(request field 8, response fields 7-19).

grpc_health / grpc_reflection are not available in this environment; the
v2 ServerLive/ServerReady RPCs provide the health surface instead.
"""
