"""Pure-JAX DSP parity layer (reference L0).

Every function here reproduces — allclose — the math of the reference's Rust
DSP (``/root/reference/rvc/src/f0/rmvpe.rs``,
``/root/reference/obs-rvc/src/rt_utils.rs``) with static shapes and no
data-dependent control flow, so the whole chain fuses under ``jax.jit``.
"""

from obs_rvc_tpu.dsp.window import (
    hann_window,
    hann_window_periodic,
    fade_windows,
    pad_constant,
    pad_reflect,
)
from obs_rvc_tpu.dsp.stft import frame_signal, stft_magnitude, dft_matrices
from obs_rvc_tpu.dsp.mel import mel_filterbank, MelSpectrogram
from obs_rvc_tpu.dsp.f0 import (
    CENTS_MAPPING,
    to_local_average_cents,
    decode_f0,
    get_f0_post,
    median_filter_f0,
)
from obs_rvc_tpu.dsp.envelope import rms_envelope, linear_interpolate_align_corners, envelope_mixing
from obs_rvc_tpu.dsp.sola import sola_offset, sola_crossfade, phase_vocoder_blend
from obs_rvc_tpu.dsp.resample import PolyphaseResampler, resample_poly

__all__ = [
    "hann_window",
    "hann_window_periodic",
    "fade_windows",
    "pad_constant",
    "pad_reflect",
    "frame_signal",
    "stft_magnitude",
    "dft_matrices",
    "mel_filterbank",
    "MelSpectrogram",
    "CENTS_MAPPING",
    "to_local_average_cents",
    "decode_f0",
    "get_f0_post",
    "median_filter_f0",
    "rms_envelope",
    "linear_interpolate_align_corners",
    "envelope_mixing",
    "sola_offset",
    "sola_crossfade",
    "phase_vocoder_blend",
    "PolyphaseResampler",
    "resample_poly",
]
