"""Shared TPU micro-bench helpers for the scripts/ diagnostics.

The axon tunnel charges ~29 ms for any synchronous host↔device round trip,
so single-shot op timing is meaningless below that. ``slope_bench`` times a
dependency-chained ``fori_loop`` with a TRACED iteration count at two
different counts and reports the slope — the true amortized per-op device
cost, with every fixed cost (dispatch, transfer, sync) cancelled — plus the
intercept (the fixed overhead itself).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def slope_bench(name, op, x, n1=20, n2=120, reps=3, params=None):
    """Print amortized per-op cost of ``op(x)`` / ``op(params, x)``.

    One executable, iteration count traced (no unrolling, no recompile
    between counts). Per-op = (t(n2) - t(n1)) / (n2 - n1) over the min of
    ``reps`` timings; intercept = t(n1) - n1 * per-op.
    """

    def run(p, x0, n):
        def body(i, carry):
            y = op(carry) if p is None else op(p, carry)
            # *1e-30, not *0: XLA folds mul-by-zero and would DCE the op
            return carry + jnp.sum(y).astype(carry.dtype) * 1e-30

        return jax.lax.fori_loop(0, n, body, x0)

    fn = jax.jit(run)
    t0 = time.perf_counter()
    jax.block_until_ready(fn(params, x, n1))
    compile_s = time.perf_counter() - t0

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(params, x, n))
            ts.append(time.perf_counter() - t0)
        return min(ts) * 1000.0  # ms

    t1, t2 = best(n1), best(n2)
    per_us = (t2 - t1) / (n2 - n1) * 1000.0
    fixed_ms = t1 - n1 * (t2 - t1) / (n2 - n1)
    print(
        f"{name:24s} compile {compile_s:6.1f}s   {per_us:9.1f} us/op"
        f"   (+{fixed_ms:.1f} ms fixed)",
        flush=True,
    )
    return per_us
