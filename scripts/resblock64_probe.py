"""C=64 resblock-bank kernel variants (VERDICT r2 item 3).

The shipped im2col kernel (ops/resblock.py) loses to XLA at the generator's
C=64 level (3.85 vs 3.20 ms at B=32, L=7000): it is tap-traffic-bound at ~3
VMEM passes per tap-element (rotate-read -> patches-write -> MXU re-read).

Variants measured here:

* "pairdot" — tap PAIRS sublane-concatenated to [2C, chunk] for 128-wide
  contraction. DEAD: Mosaic rejects concat of two lane-rotated views whose
  lane offsets differ ("result/input offset mismatch on non-concat
  dimension" — the two taps sit d lanes apart by construction). Kept only
  behind VARIANTS=pairdot for the record.
* "tapdot" — no patches scratch: each tap's shifted window is read once as a
  register value (the lane-rotate read is the only VMEM pass) and consumed
  directly by a [C, C] @ [C, chunk] MXU dot; the k dots accumulate in f32.
  Contraction is only C=64 (half the MXU's 128 depth) but the kernel drops
  from ~3 VMEM passes per tap-element to ~1; wins if the im2col kernel is
  traffic-bound rather than MXU-bound.

Env: NET_BATCH (default 32), L (default 7000), C (default 64), CHUNK
(default 0 = auto), VARIANTS (comma list: xla,im2col,tapdot,pairdot).
Usage (TPU): timeout -s KILL 1800 python scripts/resblock64_probe.py
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from benchlib import slope_bench

B = int(os.environ.get("NET_BATCH", "32"))
L = int(os.environ.get("L", "7000"))
C = int(os.environ.get("C", "64"))
CHUNK = int(os.environ.get("CHUNK", "0"))
DT = jnp.bfloat16

KERNEL_SIZES = (3, 7, 11)
DILATIONS = (1, 3, 5)
PAD = 32
SLOPE = 0.1


def _lrelu(v):
    return jnp.maximum(v, SLOPE * v)


# ---------------------------------------------------------------- pairdot --
def _pair_conv(src, wt_pairs, b, k, d, L, C, chunk, dt, *, lrelu_in):
    """One dilated conv as a sum of pair-dots, returning a VALUE per chunk
    (caller stores). ``wt_pairs``: list of [C, 2C] (last pair zero-padded when
    k is odd); ``src`` halo-padded [C, L+2*PAD] scratch (zero halos)."""
    pad = (k * d - d) // 2
    outs = []
    for c0 in range(0, L, chunk):
        acc = None
        for p in range(0, k, 2):
            v0 = src[:, pl.ds(PAD + c0 + p * d - pad, chunk)]
            if lrelu_in:
                v0 = _lrelu(v0)
            if p + 1 < k:
                v1 = src[:, pl.ds(PAD + c0 + (p + 1) * d - pad, chunk)]
                if lrelu_in:
                    v1 = _lrelu(v1)
            else:
                v1 = jnp.zeros_like(v0)
            pair = jnp.concatenate([v0, v1], axis=0)  # [2C, chunk] sublanes
            y = jnp.dot(wt_pairs[p // 2], pair, preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        outs.append(acc.astype(dt) + b)
    return outs


def _make_pairdot_kernel(kernel_sizes, dilations, L, C, chunk, dt):
    nbanks = len(kernel_sizes)

    def kernel(x_ref, *refs):
        # refs layout: *weights (per bank per step: ceil(k/2) pair mats + bias
        # for conv1, same for conv2), out_ref, scratches a, s
        w_refs = refs[:-3]
        out_ref, a, s = refs[-3], refs[-2], refs[-1]

        for scr in (a, s):
            scr[:, pl.ds(0, PAD)] = jnp.zeros((C, PAD), dt)
            scr[:, pl.ds(PAD + L, PAD)] = jnp.zeros((C, PAD), dt)

        wi = 0

        def take(n):
            nonlocal wi
            out = w_refs[wi : wi + n]
            wi += n
            return out

        for j, k in enumerate(kernel_sizes):
            npair = (k + 1) // 2
            a[:, pl.ds(PAD, L)] = x_ref[0]
            for d in dilations:
                p1 = [r[...] for r in take(npair)]
                (b1,) = take(1)
                p2 = [r[...] for r in take(npair)]
                (b2,) = take(1)
                outs = _pair_conv(a, p1, b1[...], k, d, L, C, chunk, dt, lrelu_in=True)
                for ci, c0 in enumerate(range(0, L, chunk)):
                    s[:, pl.ds(PAD + c0, chunk)] = _lrelu(outs[ci])
                outs = _pair_conv(s, p2, b2[...], k, 1, L, C, chunk, dt, lrelu_in=False)
                for ci, c0 in enumerate(range(0, L, chunk)):
                    sl = pl.ds(PAD + c0, chunk)
                    a[:, sl] = a[:, sl] + outs[ci]
            if j == 0:
                out_ref[0] = a[:, pl.ds(PAD, L)]
            elif j + 1 < nbanks:
                out_ref[0] = out_ref[0] + a[:, pl.ds(PAD, L)]
            else:
                out_ref[0] = (out_ref[0] + a[:, pl.ds(PAD, L)]) / nbanks

    return kernel


def resblock_bank_pairdot(x, bank_params, kernel_sizes, dilations):
    Bn, Ln, Cn = x.shape
    dt = x.dtype
    if CHUNK:
        chunk = CHUNK
    else:
        chunk = max(c for c in range(1, min(Ln, 8192) + 1) if Ln % c == 0)
    S = len(dilations)

    flat_w, in_specs = [], [
        pl.BlockSpec((1, Cn, Ln), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ]

    def add(arr):
        flat_w.append(arr)
        in_specs.append(
            pl.BlockSpec(arr.shape, functools.partial(_zeros, arr.ndim),
                         memory_space=pltpu.VMEM))

    for (w1, b1, w2, b2), k in zip(bank_params, kernel_sizes):
        npair = (k + 1) // 2
        for s_i in range(S):
            for w, b in ((w1, b1), (w2, b2)):
                # [k, Cin, Cout] -> per-pair [Cout, 2*Cin] (tap-major concat)
                wt = jnp.transpose(w[s_i], (2, 0, 1))  # [Cout, k, Cin]
                for p in range(npair):
                    t0 = wt[:, 2 * p]
                    t1 = (wt[:, 2 * p + 1] if 2 * p + 1 < k
                          else jnp.zeros_like(t0))
                    add(jnp.concatenate([t0, t1], axis=1).astype(dt))
                add(b[s_i].astype(dt)[:, None])

    kernel = _make_pairdot_kernel(tuple(kernel_sizes), tuple(dilations), Ln, Cn,
                                  chunk, dt)
    out_t = pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Cn, Ln), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, Cn, Ln), dt),
        scratch_shapes=[
            pltpu.VMEM((Cn, Ln + 2 * PAD), dt),
            pltpu.VMEM((Cn, Ln + 2 * PAD), dt),
        ],
    )(jnp.swapaxes(x, 1, 2), *flat_w)
    return jnp.swapaxes(out_t, 1, 2)


def _zeros(ndim, b):
    return (0,) * ndim


# ----------------------------------------------------------------- tapdot --
def _tap_conv(src, wt_taps, b, k, d, L, C, chunk, dt, *, lrelu_in):
    """One dilated conv as k tap-dots, returning a VALUE per chunk (caller
    stores). ``wt_taps``: list of k [C_out, C_in] tap matrices; ``src``
    halo-padded [C, L+2*PAD] scratch (zero halos)."""
    pad = (k * d - d) // 2
    outs = []
    for c0 in range(0, L, chunk):
        acc = None
        for t in range(k):
            v = src[:, pl.ds(PAD + c0 + t * d - pad, chunk)]
            if lrelu_in:
                v = _lrelu(v)
            y = jnp.dot(wt_taps[t], v, preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        outs.append(acc.astype(dt) + b)
    return outs


def _make_tapdot_kernel(kernel_sizes, dilations, L, C, chunk, dt):
    nbanks = len(kernel_sizes)

    def kernel(x_ref, *refs):
        w_refs = refs[:-3]
        out_ref, a, s = refs[-3], refs[-2], refs[-1]

        for scr in (a, s):
            scr[:, pl.ds(0, PAD)] = jnp.zeros((C, PAD), dt)
            scr[:, pl.ds(PAD + L, PAD)] = jnp.zeros((C, PAD), dt)

        wi = 0

        def take(n):
            nonlocal wi
            out = w_refs[wi : wi + n]
            wi += n
            return out

        for j, k in enumerate(kernel_sizes):
            a[:, pl.ds(PAD, L)] = x_ref[0]
            for d in dilations:
                t1 = [r[...] for r in take(k)]
                (b1,) = take(1)
                t2 = [r[...] for r in take(k)]
                (b2,) = take(1)
                outs = _tap_conv(a, t1, b1[...], k, d, L, C, chunk, dt, lrelu_in=True)
                for ci, c0 in enumerate(range(0, L, chunk)):
                    s[:, pl.ds(PAD + c0, chunk)] = _lrelu(outs[ci])
                outs = _tap_conv(s, t2, b2[...], k, 1, L, C, chunk, dt, lrelu_in=False)
                for ci, c0 in enumerate(range(0, L, chunk)):
                    sl = pl.ds(PAD + c0, chunk)
                    a[:, sl] = a[:, sl] + outs[ci]
            if j == 0:
                out_ref[0] = a[:, pl.ds(PAD, L)]
            elif j + 1 < nbanks:
                out_ref[0] = out_ref[0] + a[:, pl.ds(PAD, L)]
            else:
                out_ref[0] = (out_ref[0] + a[:, pl.ds(PAD, L)]) / nbanks

    return kernel


def resblock_bank_tapdot(x, bank_params, kernel_sizes, dilations):
    Bn, Ln, Cn = x.shape
    dt = x.dtype
    if CHUNK:
        chunk = CHUNK
    else:
        chunk = max(c for c in range(1, min(Ln, 8192) + 1) if Ln % c == 0)
    S = len(dilations)

    flat_w, in_specs = [], [
        pl.BlockSpec((1, Cn, Ln), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)
    ]

    def add(arr):
        flat_w.append(arr)
        in_specs.append(
            pl.BlockSpec(arr.shape, functools.partial(_zeros, arr.ndim),
                         memory_space=pltpu.VMEM))

    for (w1, b1, w2, b2), k in zip(bank_params, kernel_sizes):
        for s_i in range(S):
            for w, b in ((w1, b1), (w2, b2)):
                wt = jnp.transpose(w[s_i], (2, 0, 1))  # [Cout, k, Cin]
                for t in range(k):
                    add(wt[:, t].astype(dt))
                add(b[s_i].astype(dt)[:, None])

    kernel = _make_tapdot_kernel(tuple(kernel_sizes), tuple(dilations), Ln, Cn,
                                 chunk, dt)
    out_t = pl.pallas_call(
        kernel,
        grid=(Bn,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Cn, Ln), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bn, Cn, Ln), dt),
        scratch_shapes=[
            pltpu.VMEM((Cn, Ln + 2 * PAD), dt),
            pltpu.VMEM((Cn, Ln + 2 * PAD), dt),
        ],
    )(jnp.swapaxes(x, 1, 2), *flat_w)
    return jnp.swapaxes(out_t, 1, 2)


# ---------------------------------------------------------------- baselines --
def xla_bank(x, bank_params, kernel_sizes, dilations):
    nk = len(kernel_sizes)
    out = None
    for (w1, b1, w2, b2), k in zip(bank_params, kernel_sizes):
        a = x
        for i, d in enumerate(dilations):
            y = _lrelu(a)
            y = jax.lax.conv_general_dilated(
                y, w1[i], (1,), [((k * d - d) // 2,) * 2], rhs_dilation=(d,),
                dimension_numbers=("NLC", "LIO", "NLC")) + b1[i]
            y = _lrelu(y)
            y = jax.lax.conv_general_dilated(
                y, w2[i], (1,), [((k - 1) // 2,) * 2],
                dimension_numbers=("NLC", "LIO", "NLC")) + b2[i]
            a = a + y
        out = a if out is None else out + a
    return out / nk


def main():
    rng = np.random.default_rng(0)
    variants = os.environ.get("VARIANTS", "xla,im2col,tapdot").split(",")
    print(f"backend={jax.default_backend()} B={B} C={C} L={L} dtype=bf16",
          flush=True)

    bank_params = []
    for k in KERNEL_SIZES:
        S = len(DILATIONS)
        mk = lambda *sh: jnp.asarray(
            (rng.standard_normal(sh) * (0.3 / np.sqrt(k * C))).astype(np.float32))
        bank_params.append((mk(S, k, C, C), mk(S, C) * 0.0, mk(S, k, C, C),
                            mk(S, C) * 0.0))
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32) * 0.3, DT)

    gflop = 2 * sum(2 * len(DILATIONS) * k * C * C for k in KERNEL_SIZES) * L * B / 1e9

    if "xla" in variants:
        bp16 = jax.tree.map(lambda a: a.astype(DT), bank_params)
        us = slope_bench("bank_xla", lambda p, xx: xla_bank(xx, p, KERNEL_SIZES,
                                                            DILATIONS), x, params=bp16)
        print(f"    xla:     {gflop / (us / 1e6):7.1f} GFLOP/s", flush=True)
    if "im2col" in variants:
        from obs_rvc_tpu.ops.resblock import resblock_bank

        us = slope_bench("bank_im2col",
                         lambda p, xx: resblock_bank(xx, p, KERNEL_SIZES, DILATIONS),
                         x, params=bank_params)
        print(f"    im2col:  {gflop / (us / 1e6):7.1f} GFLOP/s", flush=True)
    if "tapdot" in variants:
        # the shipped kernel (graduated from this probe) unless CHUNK is
        # being swept, in which case the local parameterized copy
        if not CHUNK:
            from obs_rvc_tpu.ops.resblock import (
                resblock_bank_tapdot as shipped_tapdot,
            )

            tapdot_fn = shipped_tapdot
        else:
            tapdot_fn = resblock_bank_tapdot
        us = slope_bench("bank_tapdot",
                         lambda p, xx: tapdot_fn(xx, p, KERNEL_SIZES,
                                                 DILATIONS),
                         x, params=bank_params)
        print(f"    tapdot:  {gflop / (us / 1e6):7.1f} GFLOP/s", flush=True)

        # numerics sanity vs the XLA bank (both bf16 compute)
        bp16 = jax.tree.map(lambda a: a.astype(DT), bank_params)
        ref = np.asarray(xla_bank(x[:2], bp16, KERNEL_SIZES, DILATIONS), np.float32)
        got = np.asarray(tapdot_fn(x[:2], bank_params, KERNEL_SIZES,
                                   DILATIONS), np.float32)
        err = np.max(np.abs(ref - got)) / max(1e-6, np.max(np.abs(ref)))
        print(f"    tapdot rel-err vs xla(bf16): {err:.3e}", flush=True)
    if "pairdot" in variants:
        us = slope_bench("bank_pairdot",
                         lambda p, xx: resblock_bank_pairdot(xx, p, KERNEL_SIZES,
                                                             DILATIONS),
                         x, params=bank_params)
        print(f"    pairdot: {gflop / (us / 1e6):7.1f} GFLOP/s", flush=True)


if __name__ == "__main__":
    main()
