"""Fused RMVPE U-Net level Pallas kernel (2D analog of ``ops/resblock.py``).

Replaces the flax/XLA execution of one U-Net level's ConvBlockRes chain —
``n_blocks`` x (conv3x3 → BN → relu → conv3x3 → BN → relu → +residual,
first block with a 1x1 shortcut when channels change;
``models/rmvpe.py:ConvBlockRes``, mirroring the published RMVPE ``E2E`` the
reference runs as ``rmvpe.onnx`` via ``mel2hidden``,
``/root/reference/rvc/src/f0/rmvpe.rs:225-241``) — for the small-channel
levels where XLA falls off the roofline (C=16/32 at the largest feature
maps: BENCHMARKS.md measured 18.6 % MFU for RMVPE at B=32, dominated by
lane-padding traffic and per-conv HBM round-trips at C << 128 lanes).

Layout: everything inside the kernel is ``[C, H*W]`` — channels on
sublanes, the FLATTENED spatial grid on lanes. This is load-bearing:

* activations are lane-dense (row-major NHWC with C=16 minor pads the lane
  dim 8x in VMEM);
* a 3x3 tap shift (dh, dw) is ONE lane offset ``dh*W + dw`` — a hardware
  rotate (the lanes-for-shifts rule from ``ops/resblock.py``);
* H-border zero padding falls out of a zeroed one-row halo on each side of
  the flattened axis; W-border wraps (a ``dw`` shift pulling the adjacent
  row's edge column) are killed by an arithmetic mask computed from a lane
  iota — ``min(col & (W-1), 1)`` is 0 exactly at ``w == 0`` (W is always a
  power of two here), avoiding bf16 compares Mosaic can't lower.

BatchNorm (inference mode) is folded into the conv weights by the wrapper:
``W' = W * scale/sqrt(var+eps)`` per out-channel, ``b' = bias - mean * s``
— so each conv becomes one im2col MXU dot ``[C, 9*Cin] @ [9*Cin, chunk]``
plus a bias add, and the whole chain (8 convs + shortcut at the default
``n_blocks=4``) runs out of VMEM with zero intermediate HBM traffic.

Kernel structure (grid over B; per stream, halo-padded scratches):

    A0.data ← x[b]                      # chain input [Cin, HW]
    for block i:
      src = A0 if i == 0 else A
      S.data ← relu(conv1(src) + b1)    # im2col dot per lane chunk
      y     = relu(conv2(S) + b2)
      A.data ← (i == 0 ? shortcut(A0) : A.data) + y

Numerics match the flax path op-for-op (same zero SAME-padding, BN eps
1e-5 folded, relu in compute dtype, f32 dot accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wmasks(c0: int, chunk: int, C: int, W: int, dt):
    """Left/right W-border masks for output lanes [c0, c0+chunk).

    ``m_l`` zeroes positions whose ``w == 0`` (a ``dw=-1`` tap would read the
    previous row's last column), ``m_r`` zeroes ``w == W-1``. Arithmetic
    only: ``min(col & (W-1), 1)`` ∈ {0, 1}."""
    col = jax.lax.broadcasted_iota(jnp.int32, (C, chunk), 1) + c0
    m_l = jnp.minimum(col & (W - 1), 1).astype(dt)
    m_r = jnp.minimum((col + 1) & (W - 1), 1).astype(dt)
    return m_l, m_r


def _conv3x3_into(src, dst, patches, wt, b, *, HW: int, W: int, Cin: int, C: int,
                  chunk: int, pad: int, dt, relu_out: bool, residual):
    """dst.data ← [residual +] [relu](conv3x3(src) + b), chunk of lanes at a
    time. ``src`` is a halo-padded ``[Cin, HW + 2*pad]`` scratch whose halos
    are zero; ``wt`` is ``[C, 9*Cin]`` (tap-major: (dh, dw, cin) row-major);
    ``b`` is ``[C, 1]``. ``residual``: None, "acc" (+= into dst), or a
    callable ``chunk_slice -> [C, chunk]`` added to the conv output."""
    for c0 in range(0, HW, chunk):
        m_l, m_r = _wmasks(c0, chunk, Cin, W, dt)
        for t, (dh, dw) in enumerate(
            (dh, dw) for dh in (-1, 0, 1) for dw in (-1, 0, 1)
        ):
            v = src[:, pl.ds(pad + c0 + dh * W + dw, chunk)]
            if dw == -1:
                v = v * m_l
            elif dw == 1:
                v = v * m_r
            patches[pl.ds(t * Cin, Cin), :] = v
        y = jnp.dot(wt[...], patches[pl.ds(0, 9 * Cin), :],
                    preferred_element_type=jnp.float32)
        y = y.astype(dt) + b[...]
        if relu_out:
            y = jnp.maximum(y, 0.0)
        sl = pl.ds(pad + c0, chunk)
        if residual == "acc":
            dst[:, sl] = dst[:, sl] + y
        elif residual is not None:
            dst[:, sl] = residual(c0, chunk) + y
        else:
            dst[:, sl] = y


def _make_kernel(n_blocks: int, HW: int, W: int, Cin0: int, C: int,
                 chunk: int, pad: int, dt, has_shortcut: bool):
    def kernel(x_ref, *refs):
        # per block: wt1 [C, 9*Cin_b], b1 [C,1], wt2 [C, 9*C], b2 [C,1];
        # block 0 extra (when has_shortcut): wsc [C, Cin0], bsc [C,1]
        nw = 4 * n_blocks + (2 if has_shortcut else 0)
        w_refs = refs[:nw]
        out_ref = refs[nw]
        a0, a, s, patches = refs[nw + 1:]

        for scr in (a0, a, s):
            scr[:, pl.ds(0, pad)] = jnp.zeros((scr.shape[0], pad), dt)
            scr[:, pl.ds(pad + HW, pad)] = jnp.zeros((scr.shape[0], pad), dt)
        a0[:, pl.ds(pad, HW)] = x_ref[0]

        wi = 0
        for i in range(n_blocks):
            cin = Cin0 if i == 0 else C
            src = a0 if i == 0 else a
            wt1, b1, wt2, b2 = w_refs[wi: wi + 4]
            wi += 4
            _conv3x3_into(src, s, patches, wt1, b1, HW=HW, W=W, Cin=cin, C=C,
                          chunk=chunk, pad=pad, dt=dt, relu_out=True,
                          residual=None)
            if i == 0:
                if has_shortcut:
                    wsc, bsc = w_refs[wi: wi + 2]
                    wi += 2

                    def sc(c0, ck):
                        v = jnp.dot(wsc[...], a0[:, pl.ds(pad + c0, ck)],
                                    preferred_element_type=jnp.float32)
                        return v.astype(dt) + bsc[...]
                else:
                    def sc(c0, ck):
                        return a0[:, pl.ds(pad + c0, ck)]
                _conv3x3_into(s, a, patches, wt2, b2, HW=HW, W=W, Cin=C, C=C,
                              chunk=chunk, pad=pad, dt=dt, relu_out=True,
                              residual=sc)
            else:
                _conv3x3_into(s, a, patches, wt2, b2, HW=HW, W=W, Cin=C, C=C,
                              chunk=chunk, pad=pad, dt=dt, relu_out=True,
                              residual="acc")
        out_ref[0] = a[:, pl.ds(pad, HW)]

    return kernel


def fold_bn(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """Fold an inference-mode BatchNorm into the preceding bias-free conv:
    returns ``(W', b')`` with ``W' = W * s`` (per out-channel), ``b' = bias
    - mean * s``, ``s = scale / sqrt(var + eps)``."""
    s = scale / jnp.sqrt(var + eps)
    return kernel * s, bias - mean * s


def conv_block_res_chain(
    x: jnp.ndarray,
    blocks: list[tuple],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ConvBlockRes chain (one U-Net level's blocks).

    Args:
      x: ``[B, H, W, Cin]`` level input (compute dtype). W must be a power
        of two (the RMVPE mel width, halved per level); H is arbitrary.
      blocks: per block ``(W1 [3,3,Cin_b,C], b1 [C], W2 [3,3,C,C], b2 [C],
        Wsc, bsc)`` with BN already folded (:func:`fold_bn`); ``Wsc``
        ``[1,1,Cin_b,C]``/``[Cin_b,C]`` + ``bsc [C]`` only on a
        channel-changing block 0 (None otherwise).

    Returns ``[B, H, W, C]``.
    """
    B, H, W, Cin0 = x.shape
    # the border-mask arithmetic needs W to be a power of two (the RMVPE
    # mel width at every level: 128, 64, …); H (time frames) is arbitrary
    assert W & (W - 1) == 0, W
    C = blocks[0][0].shape[-1]
    HW = H * W
    dt = x.dtype
    chunk = HW if HW <= 8192 else max(
        c for c in range(1, 8193) if HW % c == 0
    )
    pad = W + 8  # >= W+1 so every (dh, dw) read offset is in bounds
    has_shortcut = blocks[0][4] is not None
    cin_max = max(Cin0, C)

    flat_w = []
    in_specs = [pl.BlockSpec((1, Cin0, HW), lambda b: (b, 0, 0),
                             memory_space=pltpu.VMEM)]

    def add(arr):
        flat_w.append(arr)
        in_specs.append(pl.BlockSpec(arr.shape, functools.partial(_zeros, arr.ndim),
                                     memory_space=pltpu.VMEM))

    for i, (w1, b1, w2, b2, wsc, bsc) in enumerate(blocks):
        cin = Cin0 if i == 0 else C
        assert w1.shape == (3, 3, cin, C) and w2.shape == (3, 3, C, C)
        # [3,3,Ci,Co] -> [Co, (dh,dw,ci) row-major] matching the patch order
        add(jnp.transpose(w1, (3, 0, 1, 2)).reshape(C, 9 * cin).astype(dt))
        add(b1.astype(dt)[:, None])
        add(jnp.transpose(w2, (3, 0, 1, 2)).reshape(C, 9 * C).astype(dt))
        add(b2.astype(dt)[:, None])
        if i == 0 and has_shortcut:
            add(jnp.transpose(wsc.reshape(cin, C)).astype(dt))
            add(bsc.astype(dt)[:, None])

    kernel = _make_kernel(len(blocks), HW, W, Cin0, C, chunk, pad, dt,
                          has_shortcut)
    out_t = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, C, HW), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C, HW), dt),
        scratch_shapes=[
            pltpu.VMEM((Cin0, HW + 2 * pad), dt),      # A0 (chain input)
            pltpu.VMEM((C, HW + 2 * pad), dt),         # A (chain state)
            pltpu.VMEM((C, HW + 2 * pad), dt),         # S (conv1 output)
            pltpu.VMEM((9 * cin_max, chunk), dt),      # im2col patches
        ],
        interpret=interpret,
    )(jnp.moveaxis(x.reshape(B, HW, Cin0), 1, 2), *flat_w)
    return jnp.moveaxis(out_t, 1, 2).reshape(B, H, W, C)


def _zeros(ndim, b):
    return (0,) * ndim
