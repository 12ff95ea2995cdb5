"""A/B: small-channel resblock bank as-is vs stream-folded grouped convs.

The generator's C=32/64 levels run at 9%/32% MFU because C under-fills the
128-lane dim (4x memory padding on every elementwise pass, N=32 matmuls).
Folding 4 streams into lanes ([B, L, 32] -> [B/4, L, 128], weights tiled on
the output axis with feature_group_count=4) keeps FLOPs identical and makes
every tensor lane-dense — IF XLA lowers static grouped convs well (its
vmap-created grouped convs are pathological, see dsp/sola.py).

Usage (TPU): NET_BATCH=32 python scripts/groupfold_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench

B = int(os.environ.get("NET_BATCH", "32"))
C = int(os.environ.get("CH", "32"))
L = int(os.environ.get("LEN", "14000"))
FOLD = 4
KS = (3, 7, 11)
DIL = (1, 3, 5)
DT = jnp.bfloat16


def lrelu(v):
    return jnp.maximum(v, 0.1 * v)


def make_weights(rng):
    banks = []
    for k in KS:
        steps = []
        for _ in DIL:
            w1 = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05, DT)
            b1 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.01, DT)
            w2 = jnp.asarray(rng.standard_normal((k, C, C)).astype(np.float32) * 0.05, DT)
            b2 = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.01, DT)
            steps.append((w1, b1, w2, b2))
        banks.append(steps)
    return banks


def conv(x, w, b, d, groups=1):
    k = w.shape[0]
    pad = (k * d - d) // 2
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((pad, pad),), rhs_dilation=(d,),
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=groups,
    )
    return y + b


def bank_stack(x, banks, groups=1, tile=1):
    xs = None
    for steps, k in zip(banks, KS):
        xb = x
        for (w1, b1, w2, b2), d in zip(steps, DIL):
            if tile > 1:
                w1, b1 = jnp.tile(w1, (1, 1, tile)), jnp.tile(b1, tile)
                w2, b2 = jnp.tile(w2, (1, 1, tile)), jnp.tile(b2, tile)
            xt = lrelu(xb)
            xt = conv(xt, w1, b1, d, groups)
            xt = lrelu(xt)
            xt = conv(xt, w2, b2, 1, groups)
            xb = xb + xt
        xs = xb if xs is None else xs + xb
    return xs / len(KS)


def main():
    rng = np.random.default_rng(0)
    banks = make_weights(rng)
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32) * 0.3, DT)
    print(f"B={B} L={L} C={C} fold={FOLD}")

    def plain(p, v):
        return bank_stack(v, p).astype(jnp.float32)

    def folded(p, v):
        g = v.reshape(B // FOLD, FOLD, L, C).transpose(0, 2, 1, 3).reshape(B // FOLD, L, FOLD * C)
        y = bank_stack(g, p, groups=FOLD, tile=FOLD)
        return (
            y.reshape(B // FOLD, L, FOLD, C).transpose(0, 2, 1, 3).reshape(B, L, C)
        ).astype(jnp.float32)

    a = np.asarray(jax.jit(plain)(banks, x))
    b = np.asarray(jax.jit(folded)(banks, x))
    err = np.max(np.abs(a - b))
    print("fold parity max|diff|:", float(err))

    slope_bench("resbank_plain", plain, x, params=banks)
    slope_bench("resbank_folded", folded, x, params=banks)


if __name__ == "__main__":
    main()
