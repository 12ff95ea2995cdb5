"""RMS envelope matching ("loudness factor").

Parity target: ``/root/reference/obs-rvc/src/rt_utils.rs:93-132`` —
framewise RMS (frame ``4*zc``, hop ``zc``, zero-pad ``frame/2``),
align-corners linear interpolation to per-sample envelopes, and
``out *= (rms_in / max(rms_out, 1e-3)) ** (1 - mix_rate)``.
"""

from __future__ import annotations

import jax.numpy as jnp


def rms_envelope(y: jnp.ndarray, frame_length: int, hop_length: int) -> jnp.ndarray:
    """Framewise RMS of ``y`` with centered zero-padding (``rt_utils.rs:93-102``).

    Output length is ``len(y) // hop_length + 1`` (hop divides the padded
    span by construction in the streaming pipeline).
    """
    padding = frame_length // 2
    y2 = jnp.pad(y * y, ((padding, padding),))
    n_frames = (y2.shape[0] - frame_length) // hop_length + 1
    # windowed means via prefix sums (gather of 2·n_frames scalars instead of
    # an [n_frames, frame_length] window gather — TPU-friendly)
    csum = jnp.cumsum(jnp.concatenate([jnp.zeros((1,), y2.dtype), y2]))
    starts = jnp.arange(n_frames) * hop_length
    sums = csum[starts + frame_length] - csum[starts]
    return jnp.sqrt(sums / frame_length)


def linear_interpolate_align_corners(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """1-D align-corners linear interpolation to ``size`` points
    (``rt_utils.rs:104-117``; matches
    ``torch.nn.functional.interpolate(mode='linear', align_corners=True)``).

    When the upsample factor is integral (the streaming case: ``n_frames →
    per-sample``, factor = hop), this lowers as a broadcasted segment ramp —
    NO gather. The general-``size`` gather path is kept as fallback, but a
    many-thousand-index gather is pathological for the TPU compiler
    (observed: 500-800 s compiles that also degrade the remote-compile
    session afterwards; the ramp form compiles in <1 s)."""
    n = x.shape[0]
    if n >= 2 and (size - 1) % (n - 1) == 0:
        r = (size - 1) // (n - 1)
        ramp = jnp.arange(r, dtype=jnp.float32) / jnp.float32(r)
        d = x[1:] - x[:-1]
        segs = x[:-1, None] + d[:, None] * ramp[None, :]  # [n-1, r]
        return jnp.concatenate([segs.reshape(-1), x[-1:]])
    step = (n - 1) / (size - 1)
    pos = jnp.arange(size, dtype=jnp.float32) * jnp.float32(step)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
    hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, n - 1)
    frac = pos - lo.astype(jnp.float32)
    return x[lo] * (1.0 - frac) + x[hi] * frac


def envelope_mixing(
    input_wav: jnp.ndarray,
    output_wav: jnp.ndarray,
    sample_rate: int,
    mix_rate: jnp.ndarray | float,
) -> jnp.ndarray:
    """Match ``output_wav``'s loudness envelope to ``input_wav``'s
    (``rt_utils.rs:119-132``). ``mix_rate=1`` leaves the output untouched;
    ``mix_rate=0`` fully imposes the input envelope. Returns the mixed output.

    Unlike the reference (which *skips the call* when ``rms_mix_rate >= 1``,
    ``obs-rvc/src/lib.rs:758``), this is branch-free and jit-safe: at
    ``mix_rate=1`` the exponent is 0 and the gain is exactly 1.
    """
    zc = sample_rate // 100
    out_len = output_wav.shape[0]
    rms1 = rms_envelope(input_wav[:out_len], 4 * zc, zc)
    rms2 = rms_envelope(output_wav, 4 * zc, zc)
    rms1 = linear_interpolate_align_corners(rms1, out_len + 1)
    rms2 = jnp.maximum(linear_interpolate_align_corners(rms2, out_len + 1), 1e-3)
    mix_power = 1.0 - jnp.asarray(mix_rate, dtype=jnp.float32)
    gain = (rms1[:out_len] / rms2[:out_len]) ** mix_power
    return output_wav * gain
