"""Server bootstrap: config -> engine -> warmup -> pipeline -> gRPC.

Reference counterpart: src/grpc/server/server_main.cpp + the five
server_main_*.hpp runtime headers. Lifecycle preserved:

  parse --config (the only flag)            server_main_bootstrap.hpp:48-104
  build observability (tracer + metrics)    server_main.cpp:234-245
  build engine (the StarPUSetup analogue)
  load model + warmup                       server_main_bootstrap.hpp:169-209
  create bounded queue
  start pipeline + congestion monitor + gRPC server
  on SIGINT/SIGTERM: close queue for push -> stop accepting -> drain
  until completed >= pushed (30 s timeout) -> stop monitor -> flush
  traces                                     server_main_shutdown_runtime.hpp:254-290
"""

from __future__ import annotations

import argparse
import asyncio
import signal
from typing import Optional

import grpc

from ..core.engine import ModelEngine
from ..models import build_model
from ..monitoring.congestion import CongestionMonitor
from ..monitoring.observability import RuntimeObservability, create_observability
from ..serving.queue import InferenceQueue
from ..serving.runner import TaskRunner
from ..utils.clock import StopWatch
from ..utils.config import RuntimeConfig, apply_xla_env, load_config
from ..utils.logger import get_logger, set_global_verbosity
from .service import InferenceServicer, add_inference_service


def _enable_compilation_cache() -> None:
    """Persist compiled executables across server restarts so warmup
    (one executable per device/bucket) is a cache hit after the first
    boot. Set SIS_NO_COMPILE_CACHE=1 to disable."""
    import os

    if os.environ.get("SIS_NO_COMPILE_CACHE"):
        return
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/sis_jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        pass


class InferenceServer:
    """Owns the whole serving stack for one model (the reference serves
    exactly one model per process; docs/server_guide.md:74)."""

    def __init__(
        self,
        cfg: RuntimeConfig,
        observability: Optional[RuntimeObservability] = None,
        expose_metrics: bool = True,
    ):
        self.cfg = cfg
        log = get_logger()
        set_global_verbosity(cfg.verbosity)
        apply_xla_env(cfg)
        _enable_compilation_cache()
        if cfg.distributed.coordinator_address:
            # multi-host pod-slice bring-up: after this, jax.devices()
            # spans the slice and the (data, model) mesh can cross hosts
            from ..parallel.mesh import initialize_distributed

            initialize_distributed(
                coordinator_address=cfg.distributed.coordinator_address,
                num_processes=cfg.distributed.num_processes or None,
                process_id=(
                    cfg.distributed.process_id
                    if cfg.distributed.process_id >= 0
                    else None
                ),
            )

        self.observability = (
            observability
            if observability is not None
            else create_observability(cfg, expose_metrics=expose_metrics)
        )

        watch = StopWatch()
        model = build_model(cfg.model, seed=cfg.seed)
        self.engine = ModelEngine(cfg, model)
        log.info(
            "model %s built on %d %s device(s) (quant=%s) in %.1f ms",
            cfg.model.family,
            self.engine.num_devices(),
            self.engine.platform,
            cfg.model.quantization.value,
            watch.elapsed_ms(),
        )

        self.queue = InferenceQueue(
            cfg.max_queue_size, on_size_change=self.observability.on_queue_size
        )
        self.congestion = CongestionMonitor(
            cfg.congestion,
            queue_probe=lambda: (self.queue.size(), self.queue.capacity),
            on_state_change=lambda c, s: self.observability.on_congestion_snapshot(s),
        )
        self.generation_engine = None
        self.runner = None
        serve_logits = bool(cfg.model.options.get("serve_logits", False))
        if self.engine.model.definition.supports_generation and not serve_logits:
            # decoder family: continuous-batching generation replaces the
            # batch pipeline (no reference counterpart; BASELINE configs
            # 4-5). options.serve_logits=true opts OUT: the decoder then
            # serves teacher-forcing logits through the ordinary batch
            # pipeline (scoring/perplexity service; also the surface the
            # pipeline-parallel forward serves on, devices.mesh.pipe > 1).
            import jax.numpy as jnp

            from ..models.decoder import get_spec
            from ..serving.generation import GenerationEngine

            opts = cfg.model.options
            spec = get_spec(cfg.model.family, opts)
            # speculative decoding: options.draft_variant names a smaller
            # decoder family whose greedy drafts the target verifies in
            # windows of speculate_k (+1 bonus) tokens per forward
            draft_spec = None
            draft_params = None
            draft_variant = opts.get("draft_variant", "")
            if draft_variant:
                import numpy as _np

                from ..models.registry import get_family, load_params
                from ..ops.quant import maybe_quantize_tree
                from ..utils.config import QuantMode

                draft_opts = dict(opts.get("draft_options", {}))
                draft_opts.setdefault("vocab", spec.vocab)
                draft_spec = get_spec(draft_variant, draft_opts)
                draft_src = opts.get("draft_params", "random")
                if draft_src == "random":
                    draft_def = get_family(draft_variant, draft_opts)
                    draft_params = draft_def.init_params(
                        _np.random.default_rng(cfg.seed + 1)
                    )
                else:
                    draft_params = load_params(draft_src)
                bits = {
                    QuantMode.NONE: None,
                    QuantMode.INT8: 8,
                    QuantMode.INT4: 4,
                    QuantMode.W8A8: 8,
                    QuantMode.W4A8: 4,
                }[cfg.model.quantization]
                draft_params = maybe_quantize_tree(draft_params, bits)
            # pipelined mesh mode: hand the ModelEngine's already
            # stacked+placed params over instead of re-placing (halves
            # startup HBM); GenerationEngine detects the stacked tree
            gen_params = (
                self.engine.placed_params()
                if self.engine.pipelined
                else model.params
            )
            self.generation_engine = GenerationEngine(
                spec,
                gen_params,
                dtype=jnp.bfloat16 if cfg.model.compute_dtype == "BF16" else jnp.float32,
                num_slots=int(opts.get("num_slots", 8)),
                max_len=int(opts.get("max_len", 512)),
                prefill_buckets=list(opts.get("prefill_buckets", [32, 64, 128, 256])),
                steps_per_sync=int(opts.get("steps_per_sync", 1)),
                prefill_chunk=int(opts.get("prefill_chunk", 0)),
                mesh=self.engine.mesh,  # None = single-device decoding
                family=cfg.model.family,
                draft_spec=draft_spec,
                draft_params=draft_params,
                speculate_k=int(opts.get("speculate_k", 4)),
                # prompt-lookup speculation: n-gram drafts from the
                # sequence's own history, no draft model needed
                prompt_lookup_ngram=int(opts.get("prompt_lookup_ngram", 0)),
                pipe_microgroups=int(opts.get("pipe_microgroups", 0)),
                prefix_cache=bool(opts.get("prefix_cache", False)),
                prefix_cache_min=int(opts.get("prefix_cache_min", 16)),
                # overlapped dispatch (block N+1 in flight while block N's
                # tokens stream out) is a pure throughput win at steady
                # state; device-side completion makes it headroom-free
                decode_overlap=bool(opts.get("decode_overlap", True)),
                pipeline_depth=int(opts.get("decode_pipeline_depth", 2)),
                # paged KV cache: kv_page_size > 0 switches the dense
                # [S, max_len] cache for a page pool + per-slot table
                # (models/paged_decoder.py); kv_pool_pages sizes the pool
                kv_page_size=int(opts.get("kv_page_size", 0)),
                kv_pool_pages=int(opts.get("kv_pool_pages", 0)),
                # opt-in cache entry/exit layout pinning (+36% dispatch
                # at dense-128; off by default — the axon remote-compile
                # cache can return stale unpinned executables, see
                # generation.py _pin)
                pin_cache_layouts=bool(opts.get("pin_cache_layouts",
                                                False)),
                # FLAT cache layout: lane-aligned [S, T, Hkv*D] leaves
                # kill the per-block whole-cache layout conversion
                # structurally (the robust form of the pinning fix)
                kv_cache_layout=str(opts.get("kv_cache_layout",
                                             "standard")),
                # tunneled transports wedge fetches; serving default 120s
                fetch_timeout_s=float(opts.get("fetch_timeout_s", 120.0)),
                metrics=getattr(self.observability, "metrics", None),
            )
        else:
            self.runner = TaskRunner(
                cfg,
                self.engine,
                self.queue,
                observability=self.observability,
                congestion_monitor=self.congestion,
            )
        self.servicer = InferenceServicer(
            cfg,
            self.queue,
            observability=self.observability,
            congestion_monitor=self.congestion,
            generation_engine=self.generation_engine,
            # hot weight reload (RepositoryModelLoad) re-reads the model
            # source and swaps the placed tree; the generation engine
            # holds decode state against its params, so reload is
            # load/unload-gating only there
            reload_model=self._reload_model if self.runner is not None else None,
        )
        if self.runner is not None:
            self.servicer.batch_stats_source = self.runner.dispatcher
        mrec = getattr(self.observability, "metrics", None)
        if mrec is not None and hasattr(mrec, "model_load_duration"):
            mrec.model_load_duration.observe(watch.elapsed_ms())
            mrec.models_loaded.set(1)
            mrec.max_inflight.set(cfg.max_inflight_tasks)
        self._grpc_server: Optional[grpc.aio.Server] = None

    # -- repository ----------------------------------------------------------

    def _reload_model(self) -> None:
        """RepositoryModelLoad hook: rebuild the model from its source
        (fresh weight read) and hot-swap the engine's placed params."""
        model = build_model(self.cfg.model, seed=self.cfg.seed)
        self.engine.reload(model)

    # -- lifecycle ---------------------------------------------------------

    def start_pipeline(self, warmup: bool = True) -> None:
        log = get_logger()
        if self.cfg.profiler_port > 0:
            # XLA/TPU trace tier (replaces StarPU FXT + NVTX; attach
            # TensorBoard to this port to capture device timelines)
            import jax

            try:
                jax.profiler.start_server(self.cfg.profiler_port)
                log.info("jax profiler server on :%d", self.cfg.profiler_port)
            except Exception as exc:  # noqa: BLE001
                log.warn("profiler server failed: %s", exc)
        if self.generation_engine is not None:
            self.generation_engine.start()
            if warmup:
                import numpy as np

                watch = StopWatch()
                # prime each prefill bucket + the decode step (a prompt of
                # exactly ``bucket`` tokens compiles that bucket)
                # remote-compile backends take 30-60 s per executable
                # and one warmup generation compiles several (prefill
                # bucket + decode block); size the wait accordingly
                warmup_timeout = 1800.0
                for bucket in self.generation_engine.prefill_buckets:
                    if bucket + 2 <= self.generation_engine.max_len:
                        self.generation_engine.generate(
                            np.ones((bucket,), np.int32), max_new_tokens=2,
                            timeout=warmup_timeout,
                        )
                chunk = self.generation_engine.prefill_chunk
                if chunk and chunk + 3 <= self.generation_engine.max_len:
                    # a prompt one token past the chunk size forces the
                    # chunked-prefill executable to compile
                    self.generation_engine.generate(
                        np.ones((chunk + 1,), np.int32), max_new_tokens=2,
                        timeout=warmup_timeout,
                    )
                log.info("decoder warmup in %.1f ms", watch.elapsed_ms())
        else:
            # lane inventory (reference: server_main_worker_inventory.hpp
            # logs every StarPU worker with type/device/affinity)
            for lane in self.runner.lanes:
                log.info(
                    "lane %d: %s (buckets %s)",
                    lane.lane_id,
                    lane.name(),
                    list(self.engine.buckets),
                )
            if warmup:
                watch = StopWatch()
                n = self.runner.warmup()
                log.info("warmup: %d pinned jobs in %.1f ms", n, watch.elapsed_ms())
            else:
                self.runner.start()
        self.congestion.start()
        mrec = getattr(self.observability, "metrics", None)
        if mrec is not None and hasattr(mrec, "start_sampler"):
            mrec.start_sampler()
            mrec.server_health.set(1)
        self.servicer.ready.set()

    async def serve(self, warmup: bool = True, ready_event=None) -> None:
        log = get_logger()
        self.start_pipeline(warmup=warmup)
        server = grpc.aio.server(
            options=[
                ("grpc.max_receive_message_length", self.cfg.resolved_max_message_bytes),
                ("grpc.max_send_message_length", self.cfg.resolved_max_message_bytes),
            ]
        )
        add_inference_service(server, self.servicer)
        port = server.add_insecure_port(self.cfg.server.address)
        self.bound_port = port
        await server.start()
        self._grpc_server = server
        log.info("serving %s on %s (port %d)", self.cfg.name,
                 self.cfg.server.address, port)
        if ready_event is not None:
            ready_event.set()

        stop = asyncio.Event()
        loop = asyncio.get_running_loop()
        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                loop.add_signal_handler(sig, stop.set)
            except (NotImplementedError, RuntimeError):
                pass
        self._stop_event = stop
        await stop.wait()
        await self.shutdown()

    async def shutdown(self) -> None:
        """reference: run_shutdown_sequence,
        server_main_shutdown_runtime.hpp:254-290."""
        log = get_logger()
        log.info("shutdown: closing queue for push")
        self.queue.close_for_push()
        self.servicer.ready.clear()
        if self._grpc_server is not None:
            await self._grpc_server.stop(grace=5.0)
        if self.runner is not None:
            self.runner.stop(drain=True)
        if self.generation_engine is not None:
            self.generation_engine.stop()
        self.congestion.stop()
        mrec = getattr(self.observability, "metrics", None)
        if mrec is not None and hasattr(mrec, "stop_sampler"):
            mrec.stop_sampler()
            mrec.server_health.set(0)
        self.observability.flush()
        self._run_trace_plots()
        if self.runner is not None:
            from ..utils.perf_observer import global_perf_observer

            perf = global_perf_observer()
            log.info(
                "shutdown complete: completed=%d failed=%d "
                "throughput_window=%.1f inf/s over %.1f s",
                self.runner.dispatcher.completed_jobs,
                self.runner.dispatcher.failed_jobs,
                perf.throughput(),
                perf.window_s(),
            )
        else:
            log.info(
                "shutdown complete: generated_tokens=%d steps=%d",
                self.generation_engine.generated_tokens,
                self.generation_engine.steps,
            )

    def _run_trace_plots(self) -> None:
        """Fork the plot script over the trace artifacts at shutdown
        (reference: server_main_trace_plot_runtime.hpp:1-70 forks python
        scripts/plot_batch_summary.py)."""
        if not self.cfg.trace_enabled or not self.cfg.trace_output:
            return
        import subprocess
        import sys

        script = __file__.rsplit("/starpu_inference_server_tpu/", 1)[0] + \
            "/scripts/plot_batch_summary.py"
        try:
            subprocess.Popen(
                [sys.executable, script, self.cfg.trace_output],
                stdout=subprocess.DEVNULL,
                stderr=subprocess.DEVNULL,
            )
        except OSError:
            pass

    def request_stop(self) -> None:
        if hasattr(self, "_stop_event"):
            self._stop_event.set()


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        description="TPU-native inference server (KServe v2 gRPC)"
    )
    # --config is the ONLY flag (reference: server_main_bootstrap.hpp:65-82)
    parser.add_argument("--config", required=True, help="YAML config file")
    args = parser.parse_args(argv)
    cfg = load_config(args.config)
    server = InferenceServer(cfg)
    asyncio.run(server.serve())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
