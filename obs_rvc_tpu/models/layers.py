"""Shared NN primitives with torch-exact semantics.

RVC / RMVPE / ContentVec checkpoints come from PyTorch; wherever Flax's
conventions differ (transposed convolution padding, weight-norm folding),
these wrappers reproduce the torch arithmetic so converted weights are
bit-compatible. Kernels are stored in JAX layout; the converters in
``weights.py`` perform the documented layout transforms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn


def conv_transpose_torch(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    stride: tuple[int, ...],
    padding: tuple[int, ...],
    output_padding: tuple[int, ...],
) -> jnp.ndarray:
    """``torch.nn.ConvTranspose{1,2}d`` forward on NHWC/NWC inputs.

    ``kernel`` is ``[*spatial, in, out]`` and must already be *spatially
    flipped* relative to torch's ``[in, out, *spatial]`` storage (the
    converter flips once at load time). Implemented as an input-dilated
    convolution: pad ``(k-1-p, k-1-p+op)`` per spatial dim with
    ``lhs_dilation=stride``.
    """
    nd = len(stride)
    pads = tuple(
        (kernel.shape[i] - 1 - padding[i], kernel.shape[i] - 1 - padding[i] + output_padding[i])
        for i in range(nd)
    )
    dn = ("NWC", "WIO", "NWC") if nd == 1 else ("NHWC", "HWIO", "NHWC")
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1,) * nd,
        padding=pads,
        lhs_dilation=stride,
        dimension_numbers=dn,
    )


def conv_transpose_1d_frames(
    x: jnp.ndarray,        # [B, T, Cin]
    kernel: jnp.ndarray,   # [k, Cin, Cout], spatially flipped (same storage
                           # as conv_transpose_torch)
    stride: int,
    padding: int,
) -> jnp.ndarray:
    """ConvTranspose1d as a frame matmul — MXU-dense, no zero-stuffed input.

    Derivation: with torch kernel ``w`` (``= kernel[::-1]``), the full output
    at ``u = s*q + r`` is ``sum_d x[q-d] · w[r + s*d]`` with
    ``D = ceil(k/s)`` taps. So stack D shifted copies of ``x`` →
    ``[T+D-1, D*Cin]`` and hit a ``[D*Cin, s*Cout]`` reorganized kernel:
    one matmul instead of a stride-1 conv over an s-dilated input (s× fewer
    MACs; for the vocoder's 10× upsamplers this is the hot layer).
    Output cropped to ``T*s`` (requires ``2*padding == k - s``, the HiFiGAN
    convention)."""
    B, T, Cin = x.shape
    k, _, Cout = kernel.shape
    s = stride
    D = -(-k // s)
    w = kernel[::-1]  # torch orientation [k, Cin, Cout]
    # W2[d, c, r, o] = w[r + s*d, c, o], zero-padded where r+s*d >= k
    wpad = jnp.pad(w, ((0, D * s - k), (0, 0), (0, 0)))
    w2 = wpad.reshape(D, s, Cin, Cout).transpose(0, 2, 1, 3).reshape(D * Cin, s * Cout)

    # pad left so x[q-d] reads zeros for q<d, right so q up to T+D-2 is valid
    xp = jnp.pad(x, ((0, 0), (D - 1, D - 1), (0, 0)))
    frames = jnp.concatenate(
        [xp[:, D - 1 - d : D - 1 - d + T + D - 1, :] for d in range(D)], axis=-1
    )  # [B, T+D-1, D*Cin] with frames[:, q, d-block] = x[q-d]
    full = jnp.einsum("btc,co->bto", frames, w2).reshape(B, (T + D - 1) * s, Cout)
    return jax.lax.dynamic_slice_in_dim(full, padding, T * s, axis=1)


class ConvTranspose1dTorch(nn.Module):
    """ConvTranspose1d(out, k, stride, padding=(k-stride)//2 by default)."""

    out_channels: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel_size, x.shape[-1], self.out_channels),
        ).astype(self.dtype)
        if (
            self.output_padding == 0
            and 2 * self.padding == self.kernel_size - self.stride
            and self.stride > 1
        ):
            # exact-s× upsampling (HiFiGAN geometry) → frame-matmul path
            y = conv_transpose_1d_frames(x.astype(self.dtype), k, self.stride, self.padding)
        else:
            y = conv_transpose_torch(
                x.astype(self.dtype), k, (self.stride,), (self.padding,), (self.output_padding,)
            )
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b.astype(self.dtype)
        return y


class ConvTranspose2dTorch(nn.Module):
    out_channels: int
    kernel_size: tuple[int, int]
    stride: tuple[int, int]
    padding: tuple[int, int]
    output_padding: tuple[int, int] = (0, 0)
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H, W, C]
        k = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, x.shape[-1], self.out_channels),
        ).astype(self.dtype)
        y = conv_transpose_torch(x.astype(self.dtype), k, self.stride, self.padding, self.output_padding)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            y = y + b.astype(self.dtype)
        return y


def leaky_relu(x: jnp.ndarray, slope: float = 0.1) -> jnp.ndarray:
    """torch LRELU_SLOPE for HiFiGAN is 0.1."""
    return jnp.where(x >= 0, x, slope * x)
