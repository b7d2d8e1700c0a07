"""Divisor-tile selection: aligned weights must get padding-free tiles
within the VMEM budget."""

from starpu_inference_server_tpu.ops.pallas_kernels import (
    _W_TILE_BUDGET,
    _divisor_tile,
)


def test_exact_divisors_preferred():
    assert _divisor_tile(2048, 512, 8192) == 512
    assert _divisor_tile(2048, 1024, 1024) == 1024


def test_prime_multiple_of_128():
    # 5504 = 43 * 128: only 128 and 5504 divide
    assert _divisor_tile(5504, 512, 8192) == 5504
    assert _divisor_tile(5504, 512, 1024) == 128


def test_lm_head_like():
    # 32000 = 250 * 128
    tile = _divisor_tile(32000, 512, 8192)
    assert tile >= 512 and 32000 % tile == 0


def test_unaligned_returns_zero():
    assert _divisor_tile(1000, 512, 8192) == 0
    assert _divisor_tile(30522, 512, 8192) == 0


def test_budget_respected_in_kernels():
    # representative llama shapes: chosen (tk, tn) must fit the budget
    cases = [(2048, 2048), (2048, 5504), (5504, 2048), (2048, 32000)]
    for k, n in cases:
        tn = _divisor_tile(n, 512, 8192)
        tk = _divisor_tile(k, 1024, 1024)
        if tn and tk and tk * tn > _W_TILE_BUDGET:
            tk = _divisor_tile(k, _W_TILE_BUDGET // tn, _W_TILE_BUDGET // tn) or tk
        assert tn and tk
        assert tk * tn <= _W_TILE_BUDGET, (k, n, tk, tn)
        assert n % tn == 0 and k % tk == 0
