"""Polyphase sample-rate conversion as a strided/dilated convolution.

Replaces the reference's ``rubato::FftFixedInOut`` resamplers
(``/root/reference/obs-rvc/src/lib.rs:236-242,571-578``). Instead of a
stateful host-side FFT resampler, this is a zero-phase windowed-sinc
polyphase filter expressed as ``lax.conv_general_dilated`` — static shapes,
jit-fusable, and lowered by XLA onto the TPU convolution path.

Zero-phase contract: ``y[k]`` estimates ``x(k * down / up)`` with no group
delay. The streaming pipeline supplies left context by feeding overlapping
windows (the reference does the same: a ``sample_frame + 2*zc`` window whose
first 160 output samples are discarded as warmup, ``lib.rs:673-678``).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from obs_rvc_tpu.config import gcd_ratio


@functools.lru_cache(maxsize=16)
def _design_filter(up: int, down: int, taps_per_phase: int, beta: float) -> np.ndarray:
    """Kaiser-windowed sinc lowpass for up/down conversion, odd length,
    gain ``up`` (to undo zero-stuffing attenuation)."""
    m = max(up, down)
    half = taps_per_phase * m
    n = np.arange(-half, half + 1, dtype=np.float64)
    cutoff = 1.0 / m  # normalized to the upsampled Nyquist
    h = cutoff * np.sinc(cutoff * n)
    h *= np.kaiser(2 * half + 1, beta)
    h /= h.sum()  # unity DC gain
    return (h * up).astype(np.float32)


@functools.lru_cache(maxsize=16)
def _phase_bank(up: int, down: int, taps_per_phase: int, beta: float):
    """Decompose the lowpass into ``up`` per-phase kernels over the ORIGINAL
    (non-dilated) signal:

        y[m*up + r] = Σ_s x[m*down + s] · G[r, s],  G[r, s] = h[up*s + pad − r*down]

    i.e. one VALID conv with ``up`` output channels and stride ``down`` —
    no ``lhs_dilation`` (input dilation lowers poorly on some backends) and
    MXU-friendlier shapes. Returns (G [up, 1, W], left_pad, right_margin)."""
    import numpy as np

    h = _design_filter(up, down, taps_per_phase, beta)
    L = h.shape[0]
    pad = (L - 1) // 2
    # s range where any phase has support: 0 <= up*s + pad - r*down < L
    s_min = min(-(-(0 - pad + r * down) // up) for r in range(up))  # ceil div
    s_max = max((L - 1 - pad + r * down) // up for r in range(up))
    W = s_max - s_min + 1
    G = np.zeros((up, 1, W), np.float32)
    for r in range(up):
        for s in range(s_min, s_max + 1):
            t = up * s + pad - r * down
            if 0 <= t < L:
                G[r, 0, s - s_min] = h[t]
    return G, -s_min, s_max


def resample_poly(
    x: jnp.ndarray,
    sr_in: int,
    sr_out: int,
    taps_per_phase: int = 16,
    beta: float = 8.555,
) -> jnp.ndarray:
    """Resample 1-D (or ``[batch, n]``) ``x`` from ``sr_in`` to ``sr_out``.

    Output length is ``ceil(n * up / down)`` — exactly ``n * up / down`` for
    the chunk sizes the pipeline uses (all multiples of both rates' 10 ms
    blocks). Edges are zero-padded; callers needing clean edges supply
    context and crop (see module docstring).

    Implementation: polyphase decomposition as ONE stride-``down`` VALID
    conv with ``up`` output channels (phases), then interleave — identical
    values to the textbook zero-stuff/filter/decimate formulation (gated by
    ``test_resample_phase_bank_matches_dilated_conv``) without input
    dilation, which the TPU conv path lowers poorly.
    """
    up, down = gcd_ratio(sr_in, sr_out)
    if up == 1 and down == 1:
        return x

    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]
    n = x.shape[-1]
    m_out = -(-n // down)  # output phase-groups: ceil(n/down)

    G, left, right = _phase_bank(up, down, taps_per_phase, beta)
    # pad so frame m covers x[m*down - left .. m*down + right]
    need = (m_out - 1) * down + right + 1
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (left, max(0, need - n))))

    out = jax.lax.conv_general_dilated(
        xp[:, None, :],
        jnp.asarray(G),
        window_strides=(down,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # [B, up, m_out]
    y = jnp.swapaxes(out, 1, 2).reshape(x.shape[0], m_out * up)
    y = y[:, : -(-n * up // down)]

    return y[0] if squeeze else y


def resample_poly_dilated(
    x: jnp.ndarray,
    sr_in: int,
    sr_out: int,
    taps_per_phase: int = 16,
    beta: float = 8.555,
) -> jnp.ndarray:
    """Textbook formulation (zero-stuff via ``lhs_dilation`` + stride) —
    kept as the parity oracle for the phase-bank path."""
    up, down = gcd_ratio(sr_in, sr_out)
    if up == 1 and down == 1:
        return x

    h = jnp.asarray(_design_filter(up, down, taps_per_phase, beta))
    L = h.shape[0]
    pad = (L - 1) // 2

    squeeze = x.ndim == 1
    if squeeze:
        x = x[None, :]

    out = jax.lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),
        h[None, None, :],
        window_strides=(down,),
        padding=((pad, pad + up - 1),),
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :]

    return out[0] if squeeze else out


class PolyphaseResampler:
    """Fixed-geometry resampler for one (sr_in, sr_out, chunk) configuration.

    Mirrors the construction sites of the reference's two resamplers
    (``lib.rs:236-242``): a down path ``device_rate → 16k`` over
    ``sample_frame + 2*zc`` windows and an up path ``model_rate →
    device_rate`` over ``model_return_size`` chunks.
    """

    def __init__(self, sr_in: int, sr_out: int, chunk_size_in: int,
                 taps_per_phase: int = 16, beta: float = 8.555):
        self.sr_in = sr_in
        self.sr_out = sr_out
        self.up, self.down = gcd_ratio(sr_in, sr_out)
        self.chunk_size_in = chunk_size_in
        if (chunk_size_in * self.up) % self.down != 0:
            raise ValueError(
                f"chunk {chunk_size_in} not commensurate with {sr_in}->{sr_out}"
            )
        self.chunk_size_out = chunk_size_in * self.up // self.down
        self.taps_per_phase = taps_per_phase
        self.beta = beta

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        assert x.shape[-1] == self.chunk_size_in, (x.shape, self.chunk_size_in)
        return resample_poly(x, self.sr_in, self.sr_out, self.taps_per_phase, self.beta)
