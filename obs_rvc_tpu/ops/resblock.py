"""Fused HiFiGAN ResBlock-bank Pallas kernel (the NSF generator's hot tail).

Replaces the flax/XLA execution of one upsample level's full multi-receptive-
field bank — ``xs = (ResBlock1_k3(x) + ResBlock1_k7(x) + ResBlock1_k11(x)) / nk``
(``models/synthesizer.py:ResBlock1``; the reference runs this inside its
vendored ONNX generator) — for the small-channel levels where XLA falls off
the roofline.

Why: at the 40k generator's last two levels (C=64 @ L=7000, C=32 @ L=14000,
B=32) XLA runs 32% / 9% MFU (``scripts/synth_probe.py``): with C=32 minor the
lane dim is 4x-padded, so all ~21 inter-conv elementwise passes (leaky_relu,
residual adds) pay 4x HBM traffic, and every one of the 18 convs round-trips
its output through HBM. One stream's level activation is <1 MB — the whole
bank fits VMEM. (The XLA-level alternative — folding 4 streams into lanes
with feature_group_count=4 grouped convs — measured 1.6x *slower* than the
unfolded baseline: XLA's grouped-conv lowering is pathological, see
``scripts/groupfold_probe.py``.)

Layout: everything inside the kernel is TRANSPOSED — ``[C, L]`` with time on
the lanes. This is load-bearing three ways:
  * activations are lane-dense (a row-major ``[L, 32]`` pads its 32-lane
    minor dim 4x in VMEM — the untransposed kernel variant blew the 16 MB
    scoped-vmem budget on buffers alone);
  * the per-tap shifted reads land on the lane axis, where arbitrary offsets
    are a hardware lane-rotate (sublane-unaligned reads made Mosaic emit
    per-vreg shift/merge code — minutes of compile per conv);
  * the im2col writes land at sublane offsets ``t*C`` (multiples of 8 —
    aligned stores).
The wrapper does the ``[B, L, C] <-> [B, C, L]`` transposes and the weight
reshape ``[k, Cin, Cout] -> [Cout, k*Cin]`` in XLA, where they are cheap
one-off copies.

Kernel structure (grid over B; per stream, two halo-padded VMEM scratches
A/S of shape [C, L + 2*PAD] whose pads stay zero):

  for bank (k, dilations):
    A.data ← x[b]
    for d in dilations:                        # one ResBlock1 step
      S.data ← leaky_relu(conv(leaky_relu(A); k, d) + b1)
      A.data += conv(S; k, 1) + b2             # residual, in place
    out[b] (+)= A.data                         # bank sum, /nk on the last

Each conv is an im2col dot per chunk of lanes: k shifted windows written
into a ``[k*C, chunk]`` patches scratch → ONE MXU dot ``[C, k*C] @
[k*C, chunk]`` with contraction k*C (up to 352) instead of C (32), f32
accumulation. The first leaky_relu is applied to the patch values themselves
(it commutes with the windowing and keeps the zero pads fixed), saving a
third padded scratch.

Numerics match the flax path op-for-op: zero SAME-padding applied after the
leaky_relu exactly as ``nn.Conv`` pads, bias add and elementwise in the
compute dtype, ``max(v, 0.1v)`` == leaky-relu for the positive slopes used.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

PAD = 32  # halo per side; >= max dilation*(kernel-1)/2 = 5*(11-1)/2 = 25
LRELU_SLOPE = 0.1


def chunk_len(L: int, target: int = 8192) -> int:
    """Largest divisor of L that is <= target (im2col lane-block width).

    Bigger chunks mean fewer python-unrolled chunk iterations — Mosaic
    compile time scales with the unrolled op count (and the patches scratch
    at [352, 7000] bf16 is still only ~4.9 MB of VMEM)."""
    best = 1
    for c in range(1, min(L, target) + 1):
        if L % c == 0:
            best = c
    return best


def _lrelu(v):
    # max(v, s*v) == where(v >= 0, v, s*v) for 0 < s < 1, and avoids a bf16
    # cmpf that Mosaic cannot lower
    return jnp.maximum(v, LRELU_SLOPE * v)


def _conv_into(src, dst, patches, wt, b, k: int, d: int, L: int, C: int,
               chunk: int, dt, *, lrelu_in: bool, lrelu_out: bool, accumulate: bool):
    """dst.data ← / += [lrelu](conv([lrelu](src); k, d) + bias), chunk-wise.

    ``src``/``dst`` are distinct padded ``[C, L+2*PAD]`` scratches (reads only
    from ``src``, so in-place accumulation into ``dst`` is safe). ``wt`` is
    the transposed flat kernel ``[C_out, k*C_in]``; ``b`` is ``[C, 1]``.
    """
    pad = (k * d - d) // 2
    for c0 in range(0, L, chunk):
        for t in range(k):
            v = src[:, pl.ds(PAD + c0 + t * d - pad, chunk)]
            if lrelu_in:
                v = _lrelu(v)
            patches[pl.ds(t * C, C), :] = v
        # patches scratch is sized for kmax — only the first k*C rows are
        # valid for this conv
        y = jnp.dot(wt, patches[pl.ds(0, k * C), :], preferred_element_type=jnp.float32)
        y = y.astype(dt) + b
        if lrelu_out:
            y = _lrelu(y)
        if accumulate:
            dst[:, pl.ds(PAD + c0, chunk)] = dst[:, pl.ds(PAD + c0, chunk)] + y
        else:
            dst[:, pl.ds(PAD + c0, chunk)] = y


def _make_kernel(kernel_sizes, dilations, L, C, chunk, dt):
    nbanks = len(kernel_sizes)

    def kernel(x_ref, *refs):
        w_refs = refs[: 4 * nbanks]  # per bank: Wt1 [S,C,k*C], b1 [S,C,1], Wt2, b2
        out_ref = refs[4 * nbanks]
        a, s, patches = refs[4 * nbanks + 1 :]

        # zero the halo pads once (data regions are fully overwritten below)
        for scr in (a, s):
            scr[:, pl.ds(0, PAD)] = jnp.zeros((C, PAD), dt)
            scr[:, pl.ds(PAD + L, PAD)] = jnp.zeros((C, PAD), dt)

        for j, k in enumerate(kernel_sizes):
            w1r, b1r, w2r, b2r = w_refs[4 * j : 4 * j + 4]
            a[:, pl.ds(PAD, L)] = x_ref[0]
            for i, d in enumerate(dilations):
                _conv_into(a, s, patches, w1r[i], b1r[i], k, d, L, C, chunk, dt,
                           lrelu_in=True, lrelu_out=True, accumulate=False)
                _conv_into(s, a, patches, w2r[i], b2r[i], k, 1, L, C, chunk, dt,
                           lrelu_in=False, lrelu_out=False, accumulate=True)
            # bank sum accumulates straight into the out block
            if j == 0:
                out_ref[0] = a[:, pl.ds(PAD, L)]
            elif j + 1 < nbanks:
                out_ref[0] = out_ref[0] + a[:, pl.ds(PAD, L)]
            else:
                out_ref[0] = (out_ref[0] + a[:, pl.ds(PAD, L)]) / nbanks

    return kernel


def resblock_bank(
    x: jnp.ndarray,
    bank_params: list[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    kernel_sizes: tuple[int, ...],
    dilations: tuple[int, ...],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-receptive-field resblock bank.

    Args:
      x: ``[B, L, C]`` level activation (compute dtype).
      bank_params: per bank ``(W1 [S, k, C, C], b1 [S, C], W2 [S, k, C, C],
        b2 [S, C])`` with ``S = len(dilations)`` — conv1 is dilated by
        ``dilations[i]``, conv2 is undilated, kernels in flax ``[k, in, out]``
        layout stacked on a leading step axis.
      kernel_sizes: per-bank kernel size (e.g. ``(3, 7, 11)``).
      dilations: shared per-step conv1 dilations (e.g. ``(1, 3, 5)``).

    Returns ``[B, L, C]``: ``sum_j ResBlock1_j(x) / len(kernel_sizes)``.
    """
    B, L, C = x.shape
    dt = x.dtype
    chunk = chunk_len(L)
    kmax = max(kernel_sizes)
    S = len(dilations)
    assert len(bank_params) == len(kernel_sizes)

    flat_w = []
    in_specs = [pl.BlockSpec((1, C, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]
    for (w1, b1, w2, b2), k in zip(bank_params, kernel_sizes):
        assert w1.shape == (S, k, C, C) and w2.shape == (S, k, C, C)
        assert b1.shape == (S, C) and b2.shape == (S, C)
        # transpose to the kernel's [C_out, k*C_in] / [C, 1] layouts in XLA
        for arr in (
            jnp.transpose(w1, (0, 3, 1, 2)).reshape(S, C, k * C).astype(dt),
            b1.astype(dt)[:, :, None],
            jnp.transpose(w2, (0, 3, 1, 2)).reshape(S, C, k * C).astype(dt),
            b2.astype(dt)[:, :, None],
        ):
            flat_w.append(arr)
            in_specs.append(
                pl.BlockSpec(arr.shape, functools.partial(_zeros, arr.ndim),
                             memory_space=pltpu.VMEM)
            )

    kernel = _make_kernel(tuple(kernel_sizes), tuple(dilations), L, C, chunk, dt)
    out_t = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, L), dt),
        scratch_shapes=[
            pltpu.VMEM((C, L + 2 * PAD), dt),    # A (bank state)
            pltpu.VMEM((C, L + 2 * PAD), dt),    # S (conv1 output)
            pltpu.VMEM((kmax * C, chunk), dt),   # im2col patches
        ],
        interpret=interpret,
    )(jnp.swapaxes(x, 1, 2), *flat_w)
    return jnp.swapaxes(out_t, 1, 2)


def _zeros(ndim, b):
    return (0,) * ndim


# ---------------------------------------------------------------------------
# tapdot variant — the C=64 level's kernel
# ---------------------------------------------------------------------------
#
# The im2col kernel above is ~3 VMEM passes per tap-element (rotate-read →
# patches-write → MXU re-read). At C=32 that is still a big win over XLA
# (the contraction widens from 32 to k*C), but at C=64 XLA's conv already
# gets half the MXU lanes and the patches traffic makes im2col LOSE
# (measured 3.69 vs XLA 3.15 ms at B=32, L=7000, bf16 —
# scripts/resblock64_probe.py). The tapdot variant drops the patches scratch
# entirely: each tap's lane-shifted window is read ONCE as a value and
# consumed directly by a [C, C] @ [C, chunk] MXU dot; the k tap-dots
# accumulate in f32. Contraction is only C (half the MXU's 128 depth at
# C=64) but tap traffic falls to ~1 VMEM pass — measured 2.95 ms, the only
# variant that beats XLA at C=64. (A pair-concatenated [2C, chunk] form that
# would restore 128-deep contraction is unbuildable: Mosaic rejects concats
# of two lane-rotated views whose lane offsets differ — "result/input offset
# mismatch on non-concat dimension" — and staging the pair through a scratch
# is exactly the im2col traffic this variant removes.)


def _tap_conv(src, wt_taps, b, k: int, d: int, L: int, C: int, chunk: int,
              dt, *, lrelu_in: bool):
    """One dilated conv as ``k`` tap-dots, returning a VALUE per lane-chunk
    (the caller stores). ``wt_taps``: k ``[C_out, C_in]`` tap matrices;
    ``src``: halo-padded ``[C, L+2*PAD]`` scratch with zero halos."""
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
                outs = _tap_conv(a, t1, b1[...], k, d, L, C, chunk, dt,
                                 lrelu_in=True)
                for ci, c0 in enumerate(range(0, L, chunk)):
                    s[:, pl.ds(PAD + c0, chunk)] = _lrelu(outs[ci])
                outs = _tap_conv(s, t2, b2[...], k, 1, L, C, chunk, dt,
                                 lrelu_in=False)
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


def resblock_bank_tapdot(
    x: jnp.ndarray,
    bank_params: list[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]],
    kernel_sizes: tuple[int, ...],
    dilations: tuple[int, ...],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused multi-receptive-field resblock bank, tapdot form.

    Same contract as :func:`resblock_bank`; preferred at C=64 (see the
    measured crossover above — at C<=32 the im2col form's wider contraction
    wins, at C>=128 XLA's native conv does).
    """
    B, L, C = x.shape
    dt = x.dtype
    chunk = chunk_len(L)
    S = len(dilations)
    assert len(bank_params) == len(kernel_sizes)

    flat_w = []
    in_specs = [pl.BlockSpec((1, C, L), lambda b: (b, 0, 0), memory_space=pltpu.VMEM)]

    def _add(arr):
        flat_w.append(arr)
        in_specs.append(
            pl.BlockSpec(arr.shape, functools.partial(_zeros, arr.ndim),
                         memory_space=pltpu.VMEM))

    for (w1, b1, w2, b2), k in zip(bank_params, kernel_sizes):
        assert w1.shape == (S, k, C, C) and w2.shape == (S, k, C, C)
        assert b1.shape == (S, C) and b2.shape == (S, C)
        for s_i in range(S):
            for w, b in ((w1, b1), (w2, b2)):
                wt = jnp.transpose(w[s_i], (2, 0, 1))  # [Cout, k, Cin]
                for t in range(k):
                    _add(wt[:, t].astype(dt))
                _add(b[s_i].astype(dt)[:, None])

    kernel = _make_tapdot_kernel(tuple(kernel_sizes), tuple(dilations), L, C,
                                 chunk, dt)
    out_t = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, L), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, L), dt),
        scratch_shapes=[
            pltpu.VMEM((C, L + 2 * PAD), dt),    # A (bank state)
            pltpu.VMEM((C, L + 2 * PAD), dt),    # S (conv1 output)
        ],
        interpret=interpret,
    )(jnp.swapaxes(x, 1, 2), *flat_w)
    return jnp.swapaxes(out_t, 1, 2)
