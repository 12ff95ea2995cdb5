"""RMVPE salience decoding and f0 post-processing.

Parity targets:

- ``to_local_average_cents`` / ``decode`` —
  ``/root/reference/rvc/src/f0/rmvpe.rs:118-133,212-215,243-248``.
  The cents map is ``cents[i] = (i-4)*20 + 1997.3794084376191`` over
  ``360 + 2*4`` entries; the decode takes a salience-weighted average of the
  9 bins centered on the per-frame argmax, gated by a confidence threshold,
  then ``f0 = 10 * 2^(cents/1200)`` with unvoiced → 0.

  NOTE: the reference's Rust indexes the *unpadded* salience with padded
  argmax coordinates (``rmvpe.rs:124``), shifting the averaging window by +8
  bins off-center (and able to index out of bounds near bin 360). We
  implement the correct, Python-RMVPE-centered window.

- ``get_f0_post`` — ``/root/reference/rvc/src/f0/mod.rs:7-12``: mel-scale
  quantization of f0 to coarse pitch codes 1..=255.

- pitch shift: ``2**(semitones/12)`` as a *float* power. (The reference uses
  Rust integer division ``pitch_shift / 12`` so only multiples of 12 act —
  ``rvc/src/rvc.rs:121``; SURVEY §7 directs fixing this deliberately.)
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

#: ``(i-4)*20 + 1997.3794084376191`` for i in 0..368 (``rmvpe.rs:212-215``).
CENTS_MAPPING = ((np.arange(360 + 2 * 4, dtype=np.float64) - 4.0) * 20.0 + 1997.3794084376191).astype(
    np.float32
)

F0_MIN = 50.0
F0_MAX = 500.0
#: htk-ish mel of F0_MIN/F0_MAX (``rvc/src/rvc.rs:30-34``): ``1127*ln(1+f/700)``.
F0_MEL_MIN = float(np.log(F0_MIN / 700.0 + 1.0) * 1127.0)
F0_MEL_MAX = float(np.log(F0_MAX / 700.0 + 1.0) * 1127.0)


def to_local_average_cents(
    salience: jnp.ndarray, threshold: float = 0.03
) -> jnp.ndarray:
    """Per-frame weighted-average cents from salience ``[T, 360]``.

    Pads 4 zero bins on each side, finds the per-frame argmax, and averages
    ``cents_mapping`` over the 9 bins centered on it, weighted by salience;
    frames whose peak salience ≤ ``threshold`` decode to 0 cents.
    """
    T = salience.shape[0]
    padded = jnp.pad(salience, ((0, 0), (4, 4)))  # [T, 368]
    center = jnp.argmax(padded, axis=1)  # == raw argmax + 4

    # 9-bin window around the peak, in padded coordinates [center-4, center+5)
    offs = jnp.arange(9)[None, :]  # [1, 9]
    win_idx = center[:, None] - 4 + offs  # [T, 9]
    rows = jnp.arange(T)[:, None]
    todo_salience = padded[rows, win_idx]
    todo_cents = jnp.asarray(CENTS_MAPPING)[(center[:, None] - 4) + offs]

    product_sum = jnp.sum(todo_salience * todo_cents, axis=1)
    weight_sum = jnp.sum(todo_salience, axis=1)
    cents = product_sum / jnp.maximum(weight_sum, 1e-12)

    maxx = jnp.max(salience, axis=1)
    return jnp.where(maxx > threshold, cents, 0.0)


def decode_f0(salience: jnp.ndarray, threshold: float = 0.03) -> jnp.ndarray:
    """Salience ``[T, 360]`` → f0 Hz ``[T]`` (``rmvpe.rs:243-248``)."""
    cents = to_local_average_cents(salience, threshold)
    f0 = 10.0 * jnp.exp2(cents / 1200.0)
    return jnp.where(f0 == 10.0, 0.0, f0)


def get_f0_post(f0: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """f0 Hz → (coarse int32 codes 1..=255, f0 Hz) (``f0/mod.rs:7-12``)."""
    f0_mel = jnp.log(f0 / 700.0 + 1.0) * 1127.0
    scaled = jnp.where(
        f0_mel > 0.0,
        (f0_mel - F0_MEL_MIN) * 254.0 / (F0_MEL_MAX - F0_MEL_MIN) + 1.0,
        f0_mel,
    )
    coarse = jnp.clip(jnp.round(scaled), 1.0, 255.0).astype(jnp.int32)
    return coarse, f0


def apply_pitch_shift(f0: jnp.ndarray, semitones: jnp.ndarray | float) -> jnp.ndarray:
    """Scale f0 by ``2**(semitones/12)`` (float semantics; see module note)."""
    return f0 * jnp.exp2(jnp.asarray(semitones, dtype=jnp.float32) / 12.0)


def median_filter_f0(f0: jnp.ndarray, radius: int = 3) -> jnp.ndarray:
    """Odd-width median filter over the f0 track (edge-replicated) — the
    ``filter_radius`` smoothing of upstream Python RVC; a BASELINE.md parity
    config. No-op for ``radius < 3``."""
    if radius < 3:
        return f0
    if radius % 2 == 0:
        radius += 1
    half = radius // 2
    padded = jnp.pad(f0, ((half, half),), mode="edge")
    idx = jnp.arange(f0.shape[0])[:, None] + jnp.arange(radius)[None, :]
    return jnp.median(padded[idx], axis=1)
