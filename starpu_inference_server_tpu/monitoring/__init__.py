"""Observability: Prometheus metrics, congestion detection, tracing.

Reference counterpart: src/monitoring (MetricsRegistry/MetricsRecorder,
congestion::Monitor) and src/utils/batching_trace_logger.
"""
