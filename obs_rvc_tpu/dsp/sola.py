"""SOLA (synchronous overlap-add) alignment and crossfade.

Parity targets: ``/root/reference/obs-rvc/src/rt_utils.rs:60-90``
(normalized cross-correlation offset search; verified against the in-tree
fixture ``infer_wav.npy``/``sola_buffer.npy`` → offset 321) and the sin²/cos²
crossfade application at ``/root/reference/obs-rvc/src/lib.rs:768-791``.

TPU-native design: the correlation numerator is an FFT cross-correlation
(batch-native — see ``sola_offset``'s TPU note for why the direct conv
formulations lose) and the winning offset is consumed by
``jax.lax.dynamic_slice`` — the offset never leaves the device, unlike the
reference which round-trips through host argmax.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sola_offset(
    output_wav: jnp.ndarray,
    sola_buffer: jnp.ndarray,
    buffer_frame_size: int,
    search_frame_size: int,
) -> jnp.ndarray:
    """Best alignment offset in ``[0, search_frame_size]`` of ``output_wav``
    against the saved ``sola_buffer`` tail.

    ``cor[k] = <out[k:k+B], sola> / sqrt(sum(out[k:k+B]^2) + 1e-8)``,
    maximized over k (``rt_utils.rs:60-90``; note ndarray_conv's "Valid conv"
    is cross-correlation — no kernel flip — per the reference's own test
    ``obs-rvc/src/tests/sola.rs`` expecting 321).

    TPU note: the numerator is an FFT circular cross-correlation (the
    reference uses FFT convolution too, via ``ndarray_conv``) and the
    denominator uses prefix-sum window energies. Direct formulations all
    lose on TPU (slope-measured, ``scripts/sola_batch_probe.py``): a VALID
    conv with the ~2000-tap kernel hangs the XLA pipeline; a channel-blocked
    conv is fine single-stream (99 µs) but under ``vmap`` the per-stream
    kernel turns it into a grouped conv lowered as a degenerate scalar
    fusion (4.0 ms at B=32, 85% of the whole post stage); identity-kernel
    patches + batched matmul materialize the [B, buffer, search] frames
    (≥3 ms). The FFT path measures at the noise floor single-stream and
    0.10 ms at B=32, with bit-identical argmax on test vectors.
    """
    n_offsets = search_frame_size + 1
    conv_input = output_wav[: buffer_frame_size + search_frame_size]

    n_fft = 1
    while n_fft < buffer_frame_size + search_frame_size + n_offsets:
        n_fft <<= 1
    fx = jnp.fft.rfft(conv_input, n_fft)
    fs = jnp.fft.rfft(sola_buffer, n_fft)
    cor_nom = jnp.fft.irfft(fx * jnp.conj(fs), n_fft)[:n_offsets].astype(jnp.float32)

    csum = jnp.cumsum(jnp.concatenate([jnp.zeros((1,)), conv_input * conv_input]))
    energy = csum[buffer_frame_size:] - csum[:n_offsets]
    cor_den = jnp.sqrt(energy + 1e-8)
    return jnp.argmax(cor_nom / cor_den).astype(jnp.int32)


def phase_vocoder_blend(
    a: jnp.ndarray,
    b: jnp.ndarray,
    fade_out: jnp.ndarray,
    fade_in: jnp.ndarray,
) -> jnp.ndarray:
    """Phase-vocoder crossfade of overlap region ``a``→``b`` (both length n).

    The reference leaves this as ``// TODO: phase vocoder``
    (``obs-rvc/src/lib.rs:778``) and ships the plain sin²/cos² crossfade;
    this is the upstream Python RVC GUI's phase vocoder: blend the windowed
    spectra with phase-difference-corrected sinusoids, removing the comb
    artifacts of amplitude-only crossfades when the two chunks are slightly
    out of phase.
    """
    n = a.shape[0]
    window = jnp.sqrt(fade_out * fade_in)
    fa = jnp.fft.rfft(a * window)
    fb = jnp.fft.rfft(b * window)
    absab = (jnp.abs(fa) + jnp.abs(fb)).astype(jnp.float32)
    if n % 2 == 0:
        absab = absab.at[1:-1].multiply(2.0)
    else:
        absab = absab.at[1:].multiply(2.0)
    phia = jnp.angle(fa)
    phib = jnp.angle(fb)
    deltaphase = phib - phia
    deltaphase = deltaphase - 2 * jnp.pi * jnp.floor(deltaphase / (2 * jnp.pi) + 0.5)
    w = 2 * jnp.pi * jnp.arange(n // 2 + 1, dtype=jnp.float32) + deltaphase
    t = (jnp.arange(n, dtype=jnp.float32) / n)[:, None]
    interp = jnp.sum(absab[None, :] * jnp.cos(w[None, :] * t + phia[None, :]), axis=-1)
    return a * fade_out**2 + b * fade_in**2 + interp * window / n


def sola_crossfade(
    output_wav: jnp.ndarray,
    sola_buffer: jnp.ndarray,
    offset: jnp.ndarray,
    fade_in: jnp.ndarray,
    fade_out: jnp.ndarray,
    sample_frame_size: int,
    phase_vocoder: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Align ``output_wav`` at ``offset``, crossfade its head with the saved
    tail, and return ``(emitted chunk [sample_frame_size], next sola_buffer)``
    (``lib.rs:776-794``). ``phase_vocoder`` upgrades the crossfade to the
    phase-corrected blend (the reference's TODO at ``lib.rs:778``)."""
    buffer_size = sola_buffer.shape[0]
    aligned_len = sample_frame_size + buffer_size
    aligned = jax.lax.dynamic_slice(output_wav, (offset,), (aligned_len,))

    if phase_vocoder:
        head = phase_vocoder_blend(sola_buffer, aligned[:buffer_size], fade_out, fade_in)
    else:
        head = aligned[:buffer_size] * fade_in + sola_buffer * fade_out
    # concat instead of .at[:].set — measurably cheaper downstream of a
    # dynamic slice on TPU
    aligned = jnp.concatenate([head, aligned[buffer_size:]])

    emitted = aligned[:sample_frame_size]
    next_sola = aligned[sample_frame_size : sample_frame_size + buffer_size]
    return emitted, next_sola
