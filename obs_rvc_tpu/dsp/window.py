"""Window functions and 1-D padding.

Parity targets: ``/root/reference/rvc/src/f0/rmvpe.rs:27-68`` (Hann windows,
reflect/constant padding) and the SOLA fade windows of
``/root/reference/obs-rvc/src/lib.rs:231-233``.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def hann_window(window_length: int) -> jnp.ndarray:
    """Symmetric Hann window (reference ``rmvpe.rs:27-31``; unused at runtime
    but part of the API surface)."""
    i = np.arange(window_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / (window_length - 1.0)))
    return jnp.asarray(w, dtype=jnp.float32)


def hann_window_periodic(window_length: int) -> jnp.ndarray:
    """Periodic Hann window — matches ``torch.hann_window(periodic=True)`` and
    the reference's ``get_hann_window_periodic`` (``rmvpe.rs:33-37``):
    ``0.5*(1-cos(2*pi*i/n))``."""
    i = np.arange(window_length, dtype=np.float64)
    w = 0.5 * (1.0 - np.cos(2.0 * np.pi * i / float(window_length)))
    return jnp.asarray(w, dtype=jnp.float32)


def fade_windows(sola_buffer_frame_size: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Equal-power sin²/cos² crossfade windows (``obs-rvc/src/lib.rs:231-233``):
    ``fade_in = sin(linspace(0,1)*pi/2)**2``, ``fade_out = 1 - fade_in``."""
    x = np.linspace(0.0, 1.0, sola_buffer_frame_size, dtype=np.float64)
    fade_in = np.sin(x * 0.5 * np.pi) ** 2
    fade_out = 1.0 - fade_in
    return (
        jnp.asarray(fade_in, dtype=jnp.float32),
        jnp.asarray(fade_out, dtype=jnp.float32),
    )


def pad_constant(x: jnp.ndarray, pad: int, value: float = 0.0) -> jnp.ndarray:
    """Constant-pad both ends (``rmvpe.rs:39-45``)."""
    return jnp.pad(x, ((pad, pad),), mode="constant", constant_values=value)


def pad_reflect(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Reflect-pad both ends without repeating the edge sample
    (``rmvpe.rs:47-68``; same convention as ``np.pad(mode='reflect')`` /
    ``torch.nn.functional.pad(mode='reflect')``)."""
    return jnp.pad(x, ((pad, pad),), mode="reflect")
