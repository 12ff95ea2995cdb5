"""Mel filterbank and log-mel spectrogram frontend for RMVPE.

Parity targets:

- filterbank: the vendored ``mel_spec`` crate's librosa-compatible
  ``mel::mel(16000, 1024, 128, Some(30), Some(8000), htk=true, norm=true)``
  (``/root/reference/rvc/src/f0/rmvpe.rs:147,220``) — i.e. librosa
  ``filters.mel`` with the HTK mel scale and Slaney area normalization.
- extractor: ``MelSpectrogram::mel_extract`` (``rmvpe.rs:159-205``):
  STFT magnitude → optional keyshift resize/fold → mel matmul →
  ``ln(max(x, clamp))``.

Note: upstream Python RMVPE uses ``torchaudio.transforms.MelSpectrogram``
(HTK scale, ``norm=None``); the reference's ``norm=true`` deviates from what
the published RMVPE weights were trained with. ``norm`` is therefore
configurable — default follows the reference ("slaney"), use ``None`` for
checkpoint-faithful extraction.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax.numpy as jnp

from obs_rvc_tpu.dsp.stft import stft_magnitude
from obs_rvc_tpu.dsp.window import hann_window_periodic


def _hz_to_mel(f: np.ndarray | float, htk: bool) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney scale
    f_min, f_sp = 0.0, 200.0 / 3
    mels = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)


def _mel_to_hz(m: np.ndarray, htk: bool) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(
    sample_rate: int,
    n_fft: int,
    n_mels: int,
    fmin: float,
    fmax: float,
    htk: bool = True,
    norm: Optional[str] = "slaney",
) -> np.ndarray:
    """librosa-compatible triangular mel filterbank, ``[n_mels, n_fft//2+1]``."""
    n_bins = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_bins)

    mel_min = _hz_to_mel(fmin, htk)
    mel_max = _hz_to_mel(fmax, htk)
    mel_pts = _mel_to_hz(np.linspace(mel_min, mel_max, n_mels + 2), htk)

    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fft_freqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    if norm == "slaney":
        enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
        weights *= enorm[:, None]
    elif norm is not None:
        raise ValueError(f"unknown mel norm {norm!r}")

    return weights.astype(np.float32)


class MelSpectrogram:
    """Log-mel frontend with the reference's keyshift mechanism.

    ``keyshift`` scales the analysis FFT/window by ``2^(k/12)`` and folds the
    magnitude back onto the base bins (``rmvpe.rs:170-201``) — the reference
    plumbs a "resonance shift" setting for this but never wires it
    (SURVEY §2.2); here it is a supported static argument.
    """

    def __init__(
        self,
        fft_size: int = 1024,
        sample_rate: int = 16000,
        n_mels: int = 128,
        win_length: int = 1024,
        hop_length: int = 160,
        f_min: float = 30.0,
        f_max: float = 8000.0,
        clamp: float = 1e-5,
        norm: Optional[str] = "slaney",
        htk: bool = True,
    ):
        self.fft_size = fft_size
        self.sample_rate = sample_rate
        self.n_mels = n_mels
        self.win_length = win_length
        self.hop_length = hop_length
        self.clamp = clamp
        self.mel_basis = jnp.asarray(
            mel_filterbank(sample_rate, fft_size, n_mels, f_min, f_max, htk=htk, norm=norm)
        )

    def __call__(
        self,
        signal: jnp.ndarray,
        keyshift: int = 0,
        speed: int = 1,
        center: bool = True,
        method: str = "matmul",
    ) -> jnp.ndarray:
        """Log-mel spectrogram ``[n_mels, T]`` with ``T = 1 + L // (hop*speed)``."""
        factor = 2.0 ** (keyshift / 12.0)
        fft_size_new = int(round(self.fft_size * factor))
        win_length_new = int(round(self.win_length * factor))
        hop_length_new = self.hop_length * speed

        window = hann_window_periodic(win_length_new)
        magnitude = stft_magnitude(
            signal, fft_size_new, hop_length_new, window, center=center, method=method
        ).T  # [T, n_bins_new]

        if keyshift != 0:
            # Truncate/pad to the base bin count and rescale by the window
            # ratio — the upstream Python RVC semantics. (The reference's
            # scaled_add at rmvpe.rs:198-200 shape-mismatches and is
            # unreachable at runtime; we implement the intended behavior.)
            size = self.fft_size // 2 + 1
            resize = magnitude.shape[-1]
            if resize < size:
                magnitude = jnp.pad(magnitude, ((0, 0), (0, size - resize)))
            magnitude = magnitude[:, :size] * (self.win_length / win_length_new)

        mel = jnp.dot(
            magnitude, self.mel_basis.T, preferred_element_type=jnp.float32
        ).T  # [n_mels, T]
        return jnp.log(jnp.maximum(mel, self.clamp))
