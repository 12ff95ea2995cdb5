"""Framed STFT magnitude with torch-compatible conventions.

Parity target: ``/root/reference/rvc/src/f0/rmvpe.rs:80-116`` —
``center=True`` reflect padding of ``fft_size/2``, ``T = 1 + L // hop``
frames, periodic-Hann windowing, one-sided magnitude ``|X|``, output shaped
``[n_bins, T]``.

Two compute paths:

- ``method="rfft"``   — ``jnp.fft.rfft`` (XLA FFT).
- ``method="matmul"`` — real DFT as two matmuls against cos/sin bases. On TPU
  this rides the MXU (128-aligned: 1024-point FFT → [T,1024] @ [1024,513]
  per basis) and fuses with the downstream mel matmul; it is the default and
  is what the fused Pallas kernel in ``obs_rvc_tpu.ops`` implements.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp

from obs_rvc_tpu.dsp.window import pad_reflect


def frame_signal(x: jnp.ndarray, frame_length: int, hop_length: int, num_frames: int) -> jnp.ndarray:
    """Slice ``x`` into ``[num_frames, frame_length]`` overlapping frames,
    frame ``i`` starting at ``i*hop_length`` (``rmvpe.rs:103-106``).

    TPU-friendly: built from ``ceil(frame/hop)`` shifted static slices of the
    hop-reshaped signal (pure slicing + concat) instead of a
    ``[T, frame]`` gather, which is slow on the TPU gather unit.
    """
    n_blocks = -(-frame_length // hop_length)
    need = (num_frames + n_blocks - 1) * hop_length
    if x.shape[0] < need:
        x = jnp.pad(x, ((0, need - x.shape[0]),))
    else:
        x = x[:need]
    rows = x.reshape(-1, hop_length)  # [num_frames + n_blocks - 1, hop]
    blocks = [rows[a : a + num_frames] for a in range(n_blocks)]
    return jnp.concatenate(blocks, axis=1)[:, :frame_length]


@functools.lru_cache(maxsize=8)
def dft_matrices(fft_size: int) -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases: returns ``(cos, -sin)`` each ``[fft_size, n_bins]``
    with ``n_bins = fft_size//2 + 1`` such that
    ``X = frames @ cos + 1j * frames @ (-sin)`` equals ``rfft(frames)``."""
    n_bins = fft_size // 2 + 1
    n = np.arange(fft_size, dtype=np.float64)[:, None]
    k = np.arange(n_bins, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / fft_size
    return np.cos(ang).astype(np.float32), (-np.sin(ang)).astype(np.float32)


def stft_magnitude(
    signal: jnp.ndarray,
    fft_size: int,
    hop_length: int,
    window: jnp.ndarray,
    center: bool = True,
    method: str = "matmul",
) -> jnp.ndarray:
    """One-sided STFT magnitude, shape ``[fft_size//2 + 1, T]``.

    ``T = 1 + L // hop`` when ``center`` (reference ``rmvpe.rs:86``); the
    signal length must be static. The window is applied as-is when its length
    equals ``fft_size``; shorter windows are center-embedded
    (``rmvpe.rs:95-101``).
    """
    L = signal.shape[-1]
    n_bins = fft_size // 2 + 1
    if center:
        num_frames = 1 + L // hop_length
        signal = pad_reflect(signal, fft_size // 2)
    else:
        num_frames = 1 + (L - fft_size) // hop_length

    win_length = window.shape[0]
    if win_length < fft_size:
        pad_left = (fft_size - win_length) // 2
        full = jnp.zeros((fft_size,), dtype=window.dtype)
        window = full.at[pad_left : pad_left + win_length].set(window)

    frames = frame_signal(signal, fft_size, hop_length, num_frames) * window[None, :]

    if method == "rfft":
        spec = jnp.fft.rfft(frames, axis=-1)
        mag = jnp.abs(spec).astype(jnp.float32)
    elif method == "matmul":
        cos_b, msin_b = dft_matrices(fft_size)
        re = jnp.dot(frames, jnp.asarray(cos_b), preferred_element_type=jnp.float32)
        im = jnp.dot(frames, jnp.asarray(msin_b), preferred_element_type=jnp.float32)
        mag = jnp.sqrt(re * re + im * im)
    else:
        raise ValueError(f"unknown stft method {method!r}")

    return mag[..., :n_bins].T  # [n_bins, T] as the reference emits (rmvpe.rs:114-115)
