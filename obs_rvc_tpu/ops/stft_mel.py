"""Fused STFT→mel→log Pallas kernel (the RMVPE mel frontend).

The hop-strided framing happens outside the kernel (pure reshape/slice —
``dsp.stft.frame_signal``; a 64×1024 f32 frame matrix is 256 KB, negligible
HBM traffic). The kernel then performs the entire spectral chain in one
VMEM residency, with no intermediate HBM round-trips:

    w     = frames * window                       (VPU)
    re,im = w @ cos, w @ (-sin)                   (MXU, 128-padded bases)
    mag   = sqrt(re² + im²)                       (VPU)
    mel   = mag @ mel_basisᵀ                      (MXU)
    out   = ln(max(mel, clamp))                   (VPU)

vs the XLA path (``obs_rvc_tpu.dsp.mel.MelSpectrogram``) this guarantees the
``[T, 513]`` magnitude never spills to HBM and the three matmuls pipeline on
the MXU back-to-back. Bases are zero-padded 513→640 lanes so every matmul is
128-aligned (alignment is also why framing lives outside: hop=160 dynamic
slices are not lane-aligned and Mosaic rejects them).

Budget at default geometry (T=64, fft=1024): frames 256 KB + bases 5.2 MB +
intermediates ≈ 0.5 MB — comfortably inside one core's VMEM, so the grid
is 1; for longer offline clips the grid tiles over frame blocks.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from obs_rvc_tpu.dsp.mel import mel_filterbank
from obs_rvc_tpu.dsp.stft import dft_matrices, frame_signal
from obs_rvc_tpu.dsp.window import pad_reflect


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=4)
def _constants(fft_size: int, n_mels: int, sample_rate: int, f_min: float, f_max: float):
    n_bins = fft_size // 2 + 1
    bins_pad = _round_up(n_bins, 128)
    cos_b, msin_b = dft_matrices(fft_size)
    cosp = np.zeros((fft_size, bins_pad), np.float32)
    sinp = np.zeros((fft_size, bins_pad), np.float32)
    cosp[:, :n_bins] = cos_b
    sinp[:, :n_bins] = msin_b
    melb = np.zeros((bins_pad, n_mels), np.float32)
    melb[:n_bins, :] = mel_filterbank(sample_rate, fft_size, n_mels, f_min, f_max).T
    # pure-numpy periodic Hann (must not trace under jit)
    i = np.arange(fft_size, dtype=np.float64)
    win = (0.5 * (1.0 - np.cos(2.0 * np.pi * i / fft_size))).astype(np.float32)
    return cosp, sinp, melb, win, bins_pad


def _kernel(frames_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref, *, clamp):
    w = frames_ref[:] * win_ref[:]
    re = jnp.dot(w, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(w, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)  # [T, n_mels]
    out_ref[:] = jnp.log(jnp.maximum(mel, clamp))


def log_mel_pallas(
    signal: jnp.ndarray,
    fft_size: int = 1024,
    hop_length: int = 160,
    n_mels: int = 128,
    sample_rate: int = 16000,
    f_min: float = 30.0,
    f_max: float = 8000.0,
    clamp: float = 1e-5,
    block_t: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """Log-mel ``[n_mels, 1 + L//hop]`` of a 1-D signal with center/reflect
    padding (parity with ``MelSpectrogram()`` at keyshift 0)."""
    L = signal.shape[0]
    T = 1 + L // hop_length
    padded = pad_reflect(signal.astype(jnp.float32), fft_size // 2)

    T_pad = _round_up(T, 8)
    frames = frame_signal(padded, fft_size, hop_length, T_pad)  # [T_pad, fft]

    cosp, sinp, melb, win, bins_pad = _constants(fft_size, n_mels, sample_rate, f_min, f_max)

    block_t = min(_round_up(T_pad, 8), block_t)
    grid = (pl.cdiv(T_pad, block_t),)

    out = pl.pallas_call(
        functools.partial(_kernel, clamp=clamp),
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((T_pad, n_mels), jnp.float32),
        in_specs=[
            pl.BlockSpec((block_t, fft_size), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_size,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_size, bins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((fft_size, bins_pad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bins_pad, n_mels), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_t, n_mels), lambda i: (i, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(frames, jnp.asarray(win), jnp.asarray(cosp), jnp.asarray(sinp), jnp.asarray(melb))

    return out[:T].T
