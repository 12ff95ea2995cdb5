"""Fused STFT→mel→log Pallas kernel (the RMVPE mel frontend).

One kernel computes, entirely in VMEM:

    frames[t] = signal[t*hop : t*hop + fft] * window      (overlapping reads)
    re, im    = frames @ cos, frames @ (-sin)             (MXU, 128-padded)
    mag       = sqrt(re² + im²)
    mel       = mag @ mel_basisᵀ                          (MXU)
    out       = ln(max(mel, clamp))

vs the XLA path (``obs_rvc_tpu.dsp.stft/mel``) this avoids materializing the
``[T, fft]`` frame matrix and the ``[T, n_bins]`` magnitude in HBM — the
whole frontend is one HBM read of the signal and one write of ``[n_mels, T]``.
Bases are zero-padded 513→640 lanes so every matmul is 128-aligned.

Budget at default geometry (T=64, fft=1024): signal 41 KB + bases 5.2 MB +
scratch ≈ 0.6 MB — comfortably inside one core's VMEM, so the grid is 1.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from obs_rvc_tpu.dsp.mel import mel_filterbank
from obs_rvc_tpu.dsp.stft import dft_matrices
from obs_rvc_tpu.dsp.window import hann_window_periodic


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
    win = np.asarray(hann_window_periodic(fft_size))
    return cosp, sinp, melb, win, bins_pad


def _kernel(sig_ref, win_ref, cos_ref, sin_ref, mel_ref, out_ref, frames_ref, *, hop, fft, T):
    # build windowed frames [T, fft] in VMEM scratch
    def body(t, _):
        frames_ref[t, :] = sig_ref[pl.ds(t * hop, fft)] * win_ref[:]
        return 0

    jax.lax.fori_loop(0, T, body, 0)

    frames = frames_ref[:]
    re = jnp.dot(frames, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(frames, sin_ref[:], preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im)
    mel = jnp.dot(mag, mel_ref[:], preferred_element_type=jnp.float32)  # [T, n_mels]
    out_ref[:] = jnp.log(jnp.maximum(mel, 1e-5)).T  # [n_mels, T]


def log_mel_pallas(
    signal: jnp.ndarray,
    fft_size: int = 1024,
    hop_length: int = 160,
    n_mels: int = 128,
    sample_rate: int = 16000,
    f_min: float = 30.0,
    f_max: float = 8000.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """Log-mel ``[n_mels, 1 + L//hop]`` of a 1-D signal (center/reflect
    padding applied here, outside the kernel)."""
    L = signal.shape[0]
    T = 1 + L // hop_length
    padded = jnp.pad(signal.astype(jnp.float32), ((fft_size // 2, fft_size // 2),), mode="reflect")
    # pad tail so the last frame's dynamic slice stays in bounds after
    # rounding T up for tiling (reads beyond T are discarded)
    T_pad = _round_up(T, 8)
    need = (T_pad - 1) * hop_length + fft_size
    if padded.shape[0] < need:
        padded = jnp.pad(padded, ((0, need - padded.shape[0]),))

    cosp, sinp, melb, win, bins_pad = _constants(fft_size, n_mels, sample_rate, f_min, f_max)

    out = pl.pallas_call(
        functools.partial(_kernel, hop=hop_length, fft=fft_size, T=T_pad),
        out_shape=jax.ShapeDtypeStruct((n_mels, T_pad), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # signal
            pl.BlockSpec(memory_space=pltpu.VMEM),  # window
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cos
            pl.BlockSpec(memory_space=pltpu.VMEM),  # -sin
            pl.BlockSpec(memory_space=pltpu.VMEM),  # mel basis
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((T_pad, fft_size), jnp.float32)],
        interpret=interpret,
    )(padded, jnp.asarray(win), jnp.asarray(cosp), jnp.asarray(sinp), jnp.asarray(melb))

    return out[:, :T]
