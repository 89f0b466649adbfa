"""Trustworthy device timing on backends with broken block_until_ready.

The axon-tunneled TPU backend acknowledges dispatches before execution
completes, so wall-clocking `f(); block_until_ready()` measures submission
cost, not device time (verified: a 1 GB HBM reduction "completed" in
74 us).  The only reliable sync is a host readback.

`devtime(f, *args)` times two chained runs of different lengths, each
ended by a 1-element host readback, and reports the slope:

    t(n) = setup + n * t_iter + readback   =>   t_iter = (t(n2)-t(n1))/(n2-n1)

Chaining threads a scalar derived from the previous output into the next
call's first argument so the device cannot overlap or elide iterations.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _chain(out, arg0):
    """Mix a scalar from `out` into arg0 without changing its values
    meaningfully: adds (x - x) where x is data-dependent."""
    leaves = jax.tree_util.tree_leaves(out)
    probe = leaves[0].ravel()[0].astype(jnp.int32)
    zero = probe - probe
    return jax.tree_util.tree_map(lambda a: a + zero.astype(a.dtype), arg0)


def devtime(f, *args, n1: int = 3, n2: int = 13):
    """Return per-iteration device seconds of jitted f(*args)."""
    jf = jax.jit(f)

    def run(n):
        a0 = args[0]
        out = None
        t0 = time.perf_counter()
        for _ in range(n):
            out = jf(a0, *args[1:])
            a0 = _chain(out, args[0])
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = jax.device_get(leaf.ravel()[0])     # real sync
        return time.perf_counter() - t0

    run(1)                                      # compile + warm
    t1 = run(n1)
    t2 = run(n2)
    return (t2 - t1) / (n2 - n1)
