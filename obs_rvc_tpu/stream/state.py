"""Explicit streaming state pytree.

Gathers every piece of carry-over the reference keeps in mutable buffers:

- ``input_buffer``      device-rate ring (``obs-rvc/src/lib.rs:121,662-665``)
- ``input_buffer_16k``  16 kHz ring (``lib.rs:122,669-683``)
- ``sola_buffer``       saved crossfade tail (``lib.rs:123,789-791``)
- ``cache_pitchf``      1024-frame sliding f0 cache (``rvc/src/rvc.rs:42,164-182``)

``clear()`` is the reference's ``clear_state`` (``lib.rs:906-913``).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from obs_rvc_tpu.config import ChunkConfig


@struct.dataclass
class StreamState:
    input_buffer: jnp.ndarray      # [input_buffer_size] device rate
    input_buffer_16k: jnp.ndarray  # [input_buffer_16k_size]
    sola_buffer: jnp.ndarray       # [sola_buffer_frame_size]
    cache_pitchf: jnp.ndarray      # [1024] f0 Hz history at 100 Hz

    @staticmethod
    def init(cfg: ChunkConfig) -> "StreamState":
        # host-side zeros (device_put on first use) — jnp.zeros would compile
        # a fill program per shape, which is expensive on remote-compile
        # backends
        import numpy as np

        return StreamState(
            input_buffer=np.zeros((cfg.input_buffer_size,), np.float32),
            input_buffer_16k=np.zeros((cfg.input_buffer_16k_size,), np.float32),
            sola_buffer=np.zeros((cfg.sola_buffer_frame_size,), np.float32),
            cache_pitchf=np.zeros((cfg.pitch_cache_len,), np.float32),
        )

    @staticmethod
    def init_batch(cfg: ChunkConfig, batch: int) -> "StreamState":
        """Batched state for ``batch`` concurrent streams (DP axis)."""
        import jax
        import numpy as np

        return jax.tree.map(
            lambda x: np.broadcast_to(x, (batch,) + x.shape).copy(), StreamState.init(cfg)
        )

    def clear(self) -> "StreamState":
        import jax

        return jax.tree.map(jnp.zeros_like, self)

    # --- snapshot/restore (checkpoint-resume; the reference only zeroes
    # state on restart, lib.rs:906-913 — carrying it over avoids the ~2 s
    # context warm-up glitch after a migration/restart) ---

    def to_bytes(self) -> bytes:
        import numpy as np
        from flax import serialization

        return serialization.msgpack_serialize(
            {k: np.asarray(v) for k, v in self.__dict__.items()}
        )

    @staticmethod
    def from_bytes(data: bytes) -> "StreamState":
        from flax import serialization

        d = serialization.msgpack_restore(data)
        return StreamState(**{k: jnp.asarray(v) for k, v in d.items()})
