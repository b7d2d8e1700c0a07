"""Batching-strategy unit tests (reference:
tests/unit/starpu/unit_batching_strategy*.cpp behaviors: disabled always
1/0ms; fixed returns config; adaptive steps up under pressure, jumps to
max under congestion, decays after sustained low pressure, keeps a
minimum coalesce window when congested)."""

from starpu_inference_server_tpu.serving.strategies import (
    AdaptiveBatchingStrategy,
    BatchingDecision,
    DisabledBatchingStrategy,
    FixedBatchingStrategy,
    StrategyInput,
    make_batching_strategy,
)
from starpu_inference_server_tpu.utils.config import (
    BatchingStrategyKind,
    parse_config,
)


def adaptive_cfg(**over):
    raw = {
        "name": "t",
        "model": "identity",
        "inputs": [{"name": "x", "dims": [4], "dtype": "FP32"}],
        "outputs": [{"name": "y", "dims": [4], "dtype": "FP32"}],
        "pool_size": 2,
        "max_batch_size": 16,
        "batch_coalesce_timeout_ms": 2.0,
        "batching_strategy": "adaptive",
        "max_queue_size": 64,
        "max_inflight_tasks": 8,
    }
    raw.update(over)
    return parse_config(raw)


def sample(tick, queue=0, congested=False, fill=None, inflight=0, prepared=0):
    return StrategyInput(
        queue_size=queue,
        queue_capacity=64,
        prepared_depth=prepared,
        inflight=inflight,
        max_inflight=8,
        congested=congested,
        ewma_queue_fill=fill,
        monitor_tick=tick,
    )


def test_disabled_always_one():
    s = DisabledBatchingStrategy()
    d = s.decide(sample(0, queue=100, congested=True))
    assert d == BatchingDecision(1, 0.0)


def test_fixed_returns_config():
    cfg = adaptive_cfg(batching_strategy="fixed", fixed_batching={"batch_size": 8})
    s = FixedBatchingStrategy(cfg)
    d = s.decide(sample(0))
    assert d.target_batch_limit == 8
    assert d.coalesce_timeout_ms == 2.0


def test_factory_dispatch():
    assert isinstance(
        make_batching_strategy(adaptive_cfg()), AdaptiveBatchingStrategy
    )
    cfg = adaptive_cfg(batching_strategy="disabled")
    assert cfg.batching_strategy is BatchingStrategyKind.DISABLED
    assert isinstance(make_batching_strategy(cfg), DisabledBatchingStrategy)


def test_adaptive_steps_up_under_pressure():
    s = AdaptiveBatchingStrategy(adaptive_cfg())
    limits = []
    for tick in range(1, 10):
        d = s.decide(sample(tick, fill=0.9))
        limits.append(d.target_batch_limit)
    assert limits[-1] > limits[0]
    assert limits == sorted(limits)


def test_adaptive_congestion_jumps_to_max():
    cfg = adaptive_cfg()
    s = AdaptiveBatchingStrategy(cfg)
    d = s.decide(sample(1, congested=True))
    assert d.target_batch_limit == cfg.max_batch_size


def test_adaptive_min_coalesce_window_under_congestion():
    cfg = adaptive_cfg(batch_coalesce_timeout_ms=0)
    s = AdaptiveBatchingStrategy(cfg)
    d = s.decide(sample(1, congested=True))
    assert d.coalesce_timeout_ms >= cfg.adaptive_batching.min_congested_coalesce_ms


def test_adaptive_decays_after_sustained_low_pressure():
    cfg = adaptive_cfg()
    s = AdaptiveBatchingStrategy(cfg)
    tick = 0
    for _ in range(6):
        tick += 1
        s.decide(sample(tick, fill=0.95))
    high = s.current_limit
    assert high > 1
    for _ in range(cfg.adaptive_batching.exit_horizon_ticks * high + 5):
        tick += 1
        s.decide(sample(tick, fill=0.0))
    assert s.current_limit < high


def test_adaptive_refresh_once_per_tick():
    s = AdaptiveBatchingStrategy(adaptive_cfg())
    d1 = s.decide(sample(1, fill=0.95))
    # same tick: limit must not move again
    d2 = s.decide(sample(1, fill=0.95))
    assert d1.target_batch_limit == d2.target_batch_limit
    d3 = s.decide(sample(2, fill=0.95))
    assert d3.target_batch_limit >= d2.target_batch_limit


def test_adaptive_limit_snapped_to_bucket():
    cfg = adaptive_cfg(batch_bucket_sizes=[1, 4, 16])
    s = AdaptiveBatchingStrategy(cfg)
    for tick in range(1, 20):
        d = s.decide(sample(tick, fill=0.9))
        assert d.target_batch_limit in (1, 4, 16)
