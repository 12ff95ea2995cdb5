"""CREPE pitch-salience network in Flax (beyond-reference pitch algorithm).

The Rust reference ships RMVPE only (``/root/reference/rvc/src/f0/``), but
upstream Python RVC also offers torchcrepe's CREPE models for the
``pitch_algorithm`` setting; this is the TPU-native equivalent, selectable
via ``RvcPipeline(pitch_algorithm="crepe")``.

Architecture = torchcrepe's ``Crepe`` (weights convertible 1:1 from its
checkpoints via ``weights.convert_crepe``): six Conv(kernel 512/64) → ReLU →
BatchNorm(eps 1e-3) → MaxPool(2) blocks over 1024-sample 16 kHz frames,
then Linear → sigmoid over the same 360-bin / 20-cent grid RMVPE inherited
from CREPE — so ``dsp.f0.decode_f0`` decodes both.

Frames are hop-aligned with RMVPE's mel frames (hop 160 = 10 ms, centered),
so the pitch-cache geometry of the streaming pipeline is unchanged.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import flax.linen as nn

from obs_rvc_tpu.dsp.stft import frame_signal

WINDOW_SIZE = 1024
N_CLASS = 360

_CAPACITIES = {
    # capacity: (in_channels, out_channels, flattened features)
    "full": ([1, 1024, 128, 128, 128, 256], [1024, 128, 128, 128, 256, 512], 2048),
    "tiny": ([1, 128, 16, 16, 16, 32], [128, 16, 16, 16, 32, 64], 256),
}


@dataclasses.dataclass(frozen=True)
class CrepeConfig:
    capacity: str = "full"
    dtype: jnp.dtype = jnp.float32


class Crepe(nn.Module):
    """Normalized frames ``[N, 1024]`` → salience ``[N, 360]``."""

    config: CrepeConfig = CrepeConfig()

    @nn.compact
    def __call__(self, frames: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        _, out_ch, in_features = _CAPACITIES[cfg.capacity]
        kernels = [512] + [64] * 5
        strides = [4] + [1] * 5
        # torchcrepe's F.pad tuples: (0,0,254,254) on layer 1, (0,0,31,32)
        # after — i.e. time-pad (254,254) then (31,32), asymmetric
        pads = [(254, 254)] + [(31, 32)] * 5

        x = frames.astype(cfg.dtype)[:, :, None]  # [N, H=1024, C=1]
        for i in range(6):
            x = nn.Conv(
                out_ch[i],
                (kernels[i],),
                strides=(strides[i],),
                padding=[pads[i]],
                dtype=cfg.dtype,
                name=f"conv{i + 1}",
            )(x)
            x = nn.relu(x)
            x = nn.BatchNorm(
                use_running_average=True, epsilon=1e-3, dtype=cfg.dtype,
                name=f"bn{i + 1}",
            )(x)
            x = nn.max_pool(x, (2,), strides=(2,))
        # torch: [N, C, H', 1] → permute(0, 2, 1, 3) → [N, H'*C] (time-major)
        x = x.reshape(x.shape[0], -1)
        assert x.shape[-1] == in_features, x.shape
        x = nn.Dense(N_CLASS, dtype=cfg.dtype, name="classifier")(x)
        return jnp.asarray(nn.sigmoid(x), jnp.float32)


def extract_crepe_frames(
    x16: jnp.ndarray, num_frames: int, hop_length: int = 160
) -> jnp.ndarray:
    """16 kHz signal → per-frame-normalized ``[num_frames, 1024]`` windows
    centered at ``t*hop`` (torchcrepe ``preprocess``: pad WINDOW/2 each side,
    unfold, mean-center, divide by the unbiased std clamped at 1e-10)."""
    padded = jnp.pad(x16.astype(jnp.float32), ((WINDOW_SIZE // 2, WINDOW_SIZE // 2),))
    frames = frame_signal(padded, WINDOW_SIZE, hop_length, num_frames)
    mean = jnp.mean(frames, axis=1, keepdims=True)
    centered = frames - mean
    var = jnp.sum(centered * centered, axis=1, keepdims=True) / (WINDOW_SIZE - 1)
    return centered / jnp.maximum(jnp.sqrt(var), 1e-10)
