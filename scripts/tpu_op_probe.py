"""Probe the device-side cost of individual primitives suspected in the
DSP roofline gap (amortized fori_loop timing, one dispatch).

Usage: python scripts/tpu_op_probe.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


from benchlib import slope_bench


def loop_bench(name, op, x, iters=None):
    # shared slope harness: transfer-forced sync + loop-variant feedback
    # (docs/DEVELOPMENT.md 3b) — the old local version measured nothing
    # once the relay stopped honoring block_until_ready
    slope_bench(name, op, x)


def main():
    rng = np.random.default_rng(0)
    n = 14400
    x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal(16800).astype(np.float32))

    # 1. cumsum at the two sizes used
    loop_bench("cumsum_14k", lambda v: jnp.cumsum(v), x)
    loop_bench("cumsum_2400", lambda v: jnp.cumsum(v[:2400]), x)

    # 2. big gather (interpolation's x[lo] pattern)
    idx = jnp.asarray(rng.integers(0, 31, size=n + 1), jnp.int32)
    small = jnp.asarray(rng.standard_normal(31).astype(np.float32))

    def gather_interp(v):
        xs = v[:31]
        return xs[idx] * 0.5 + xs[jnp.minimum(idx + 1, 30)] * 0.5

    loop_bench("gather_14k_from_31", gather_interp, x)

    # 3. ramp interpolation (gather-free segment upsample)
    ramp = jnp.arange(480, dtype=jnp.float32) / 480.0

    def ramp_interp(v):
        xs = v[:31]
        d = xs[1:] - xs[:-1]
        out = xs[:-1, None] + d[:, None] * ramp[None, :]
        return jnp.concatenate([out.reshape(-1), xs[-1:]])

    loop_bench("ramp_interp_31_to_14k", ramp_interp, x)

    # 4. blocked RMS (reshape-sum) vs cumsum RMS
    def rms_cumsum(v):
        y2 = jnp.pad(v * v, ((960, 960),))
        csum = jnp.cumsum(jnp.concatenate([jnp.zeros((1,), v.dtype), y2]))
        starts = jnp.arange(31) * 480
        return jnp.sqrt((csum[starts + 1920] - csum[starts]) / 1920)

    def rms_block(v):
        y2 = jnp.pad(v * v, ((960, 960),))
        b = y2.reshape(-1, 480).sum(axis=1)  # 34 blocks
        s = b[:-3] + b[1:-2] + b[2:-1] + b[3:]
        return jnp.sqrt(s / 1920)

    loop_bench("rms_cumsum", rms_cumsum, x)
    loop_bench("rms_block", rms_block, x)

    # 5. dynamic_slice with traced offset
    def dslice(v):
        off = jnp.clip(jnp.int32(jnp.abs(v[0]) * 100), 0, 480)
        return jax.lax.dynamic_slice(v, (off,), (16320,))

    loop_bench("dynamic_slice_16k", dslice, x2)

    def sslice(v):
        return v[17 : 17 + 16320]

    loop_bench("static_slice_16k", sslice, x2)

    # 6. argmax over 481
    loop_bench("argmax_481", lambda v: jnp.argmax(v[:481]).astype(jnp.float32)[None], x)

    # 7. the folded SOLA conv alone
    ker = jnp.asarray(rng.standard_normal((1, 12, 160)).astype(np.float32))

    def sola_conv(v):
        xs = jnp.stack([v[160 * a : 160 * a + 640] for a in range(12)])
        return jax.lax.conv_general_dilated(
            xs[None], ker, window_strides=(1,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[0, 0]

    loop_bench("sola_conv_folded", sola_conv, x)


if __name__ == "__main__":
    main()
