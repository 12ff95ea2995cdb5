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
        # Carry BOTH the op input and a live accumulator of the op's output.
        # The input is multiplicatively perturbed by the (runtime-unknown)
        # accumulator so the op body is provably loop-variant — a plain
        # ``carry + sum(y)*1e-30`` feedback has been observed getting
        # optimized to a no-op loop by the remote compiler (slope ≈ 0 with
        # no RTT in the intercept), silently voiding the measurement.
        def body(i, carry):
            xc, acc = carry
            y = op(xc) if p is None else op(p, xc)
            acc = acc + jnp.sum(y).astype(jnp.float32)
            xc = xc * (1.0 + jnp.tanh(acc) * 1e-7).astype(xc.dtype)
            return xc, acc

        xf, accf = jax.lax.fori_loop(0, n, body, (x0, jnp.float32(0.0)))
        return accf

    fn = jax.jit(run)

    import numpy as np

    def sync(y):
        # On the axon relay ``block_until_ready`` has been observed to
        # return without waiting for device compute — only an actual
        # device→host transfer is a reliable sync point. Pull the scalar
        # accumulator to host; the ~29 ms transfer RTT lands in the
        # intercept and cancels out of the slope.
        return float(np.asarray(y))

    t0 = time.perf_counter()
    sync(fn(params, x, n1))
    compile_s = time.perf_counter() - t0

    def best(n):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(fn(params, x, n))
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
