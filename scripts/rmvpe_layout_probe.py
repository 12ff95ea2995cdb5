"""A/B the RMVPE U-Net conv layout: NHWC (C minor, current) vs NCHW (W minor).

The U-Net's channel counts are 16..256 over a [T=64, W=128] grid: with C
minor the lane dim is up to 8x padded; with W minor the first levels put a
perfect 128 on the lanes. XLA can often pick internal layouts, but the
dimension_numbers anchor what it starts from.

Measures one encoder-shaped ConvBlockRes chain per level in both layouts.
Usage (TPU): NET_BATCH=32 python scripts/rmvpe_layout_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench

B = int(os.environ.get("NET_BATCH", "32"))
DT = jnp.bfloat16
# (T, W, C_in, C_out, n_convs): encoder levels 1-5 + intermediate, 8 convs
# each (4 ConvBlockRes x 2 convs)
LEVELS = (
    (64, 128, 16, 16, 8),
    (32, 64, 32, 32, 8),
    (16, 32, 64, 64, 8),
    (8, 16, 128, 128, 8),
    (4, 8, 256, 256, 8),
)


def relu(v):
    return jnp.maximum(v, 0.0)


def chain_nhwc(x, ws):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        x = relu(x)
    return x


def chain_nchw(x, ws):
    for w in ws:
        x = jax.lax.conv_general_dilated(
            x, jnp.transpose(w, (3, 2, 0, 1)), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        x = relu(x)
    return x


def main():
    rng = np.random.default_rng(0)
    print(f"B={B}")
    for T, W, ci, co, n in LEVELS:
        ws = [
            jnp.asarray(rng.standard_normal((3, 3, ci if i == 0 else co, co))
                        .astype(np.float32) * 0.05, DT)
            for i in range(n)
        ]
        x = jnp.asarray(rng.standard_normal((B, T, W, ci)).astype(np.float32) * 0.3, DT)
        slope_bench(f"nhwc T{T} W{W} C{co}", lambda p, v: chain_nhwc(v, p).astype(jnp.float32),
                    x, params=ws, n1=4, n2=24)
        xc = jnp.swapaxes(jnp.swapaxes(x, 1, 3), 2, 3)  # [B, C, T, W]
        slope_bench(f"nchw T{T} W{W} C{co}", lambda p, v: chain_nchw(v, p).astype(jnp.float32),
                    xc, params=ws, n1=4, n2=24)


if __name__ == "__main__":
    main()
