#!/usr/bin/env python3
"""Per-program dispatch cost vs ARGUMENT LEAF COUNT on the tunneled
backend (round 5).

The dense-128 knee decomposition read dispatch-only at 54% of raw:
+54 ms/block of boundary cost where round 3 measured ~7 ms/program
with a 5-leaf cache. The per-layer cache refactor multiplied the
donated-arg count (4 tensors x L layers + lengths = 65 leaves for
llama-1b). This probe times an IDENTITY program (donated in = out)
over synthetic caches with the same total bytes but different leaf
counts, isolating the per-buffer boundary cost from compute.

Usage: python scripts/leafcost_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/scripts/", 1)[0])


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    S, T, H, D, L = 128, 1024, 8, 64, 16
    total = L * S * T * H * D  # int8 elements per tensor family

    def make_case(leaves_per_family: int):
        """leaves_per_family=L -> per-layer; 1 -> one stacked buffer."""
        chunk = L // leaves_per_family
        k = tuple(
            jnp.zeros((chunk, S, T, H, D), jnp.int8)
            for _ in range(leaves_per_family)
        )
        v = tuple(
            jnp.zeros((chunk, S, T, H, D), jnp.int8)
            for _ in range(leaves_per_family)
        )
        ks = tuple(
            jnp.zeros((chunk, S, T, H), jnp.float32)
            for _ in range(leaves_per_family)
        )
        vs = tuple(
            jnp.zeros((chunk, S, T, H), jnp.float32)
            for _ in range(leaves_per_family)
        )
        return (k, v, ks, vs)

    import functools

    @functools.partial(jax.jit, donate_argnums=0)
    def bump(tree):
        # touch ONE element per leaf so donation is real but compute ~0
        return jax.tree.map(
            lambda a: a.at[(0,) * a.ndim].add(1), tree
        )

    for leaves in (1, 2, 4, 8, 16):
        tree = jax.device_put(make_case(leaves))
        n_leaves = 4 * leaves + 0
        out = bump(tree)
        jax.block_until_ready(out)
        # chain calls through the carry; each call is one PROGRAM
        iters = 30
        t0 = time.perf_counter()
        cur = out
        for _ in range(iters):
            cur = bump(cur)
        np.asarray(jax.tree.leaves(cur)[0][(0,) * 5])
        per = (time.perf_counter() - t0) / iters * 1e3
        print(f"leaves/family={leaves:3d} (total args {n_leaves:3d}): "
              f"{per:7.2f} ms/program", flush=True)
        del tree, out, cur
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
