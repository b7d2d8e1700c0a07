"""Congestion-monitor unit tests: deterministic ticks exercise the entry/
exit hysteresis, rejection fast path and EWMA smoothing (reference:
tests/unit/monitoring congestion tests; formulas
docs/congestion_detection.md:27-196)."""

from starpu_inference_server_tpu.monitoring.congestion import CongestionMonitor
from starpu_inference_server_tpu.utils.config import CongestionSettings


def make_monitor(queue_state, **over):
    cfg = CongestionSettings(
        enabled=True,
        tick_interval_ms=100,
        ewma_alpha=1.0,  # no smoothing -> deterministic tests
        rho_high=1.1,
        fill_high=0.7,
        latency_slo_ms=150.0,
        entry_horizon_ticks=2,
        exit_horizon_ticks=2,
        **over,
    )
    return CongestionMonitor(cfg, lambda: tuple(queue_state))


def test_idle_not_congested():
    state = [0, 64]
    m = make_monitor(state)
    for _ in range(5):
        snap = m.tick(0.1)
    assert not snap.congested
    assert snap.ewma_lambda == 0


def test_overload_enters_after_horizon():
    state = [0, 64]
    m = make_monitor(state)
    # arrivals >> completions => rho > rho_high
    flags = []
    for _ in range(3):
        for _ in range(20):
            m.record_arrival()
        for _ in range(2):
            m.record_completion(10.0)
        flags.append(m.tick(0.1).congested)
    # entry after the condition holds entry_horizon (=2) consecutive ticks
    assert flags == [False, True, True]


def test_latency_slo_triggers_entry():
    state = [0, 64]
    m = make_monitor(state)
    for _ in range(3):
        for _ in range(5):
            m.record_arrival()
            m.record_completion(145.0)  # > 0.9 * 150
        m.tick(0.1)
    assert m.congested


def test_rejection_immediate_congestion():
    state = [0, 64]
    m = make_monitor(state)
    assert not m.tick(0.1).congested
    m.record_rejection()
    assert m.tick(0.1).congested


def test_exit_hysteresis():
    state = [60, 64]
    m = make_monitor(state)
    m.record_rejection()
    m.tick(0.1)
    assert m.congested
    state[0] = 0  # queue drains
    # healthy ticks: balanced load, low latency
    results = []
    for _ in range(4):
        m.record_arrival()
        m.record_completion(5.0)
        results.append(m.tick(0.1).congested)
    assert results[0] is True          # needs exit_horizon sustained ticks
    assert results[-1] is False


def test_fill_with_growth_triggers():
    state = [50, 64]
    m = make_monitor(state)
    flags = []
    for i in range(4):
        state[0] = 50 + i * 5  # growing queue above fill_high
        m.record_arrival()
        m.record_completion(1.0)
        flags.append(m.tick(0.1).congested)
    assert flags[-1] is True


def test_state_change_callback():
    state = [0, 64]
    changes = []
    cfg_monitor = make_monitor(state)
    m = CongestionMonitor(
        cfg_monitor._cfg, lambda: tuple(state),
        on_state_change=lambda c, s: changes.append(c),
    )
    m.record_rejection()
    m.tick(0.1)
    for _ in range(3):
        m.record_arrival()
        m.record_completion(1.0)
        m.tick(0.1)
    assert changes == [True, False]


def test_snapshot_tick_monotonic():
    m = make_monitor([0, 64])
    t1 = m.tick(0.1).tick
    t2 = m.tick(0.1).tick
    assert t2 == t1 + 1
