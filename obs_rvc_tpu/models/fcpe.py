"""FCPE (Fast Context-aware Pitch Estimation) in Flax — beyond-reference.

The Rust reference ships RMVPE only (``/root/reference/rvc/src/f0/``;
``rvc-common/src/enums.rs:26`` declares the ``PitchAlgorithm`` enum with a
single variant), but upstream Python RVC also offers torchfcpe's
``CFNaiveMelPE`` for the ``pitch_algorithm`` setting. This is the TPU-native
equivalent, selectable via ``RvcPipeline(pitch_algorithm="fcpe")``.

Architecture = torchfcpe's ``CFNaiveMelPE`` ("fcpe" capacity: hidden 512,
6 conformer layers, 360 output bins), weights convertible 1:1 from its
checkpoints via ``weights.convert_fcpe``:

- input stack: Conv1d(k3) -> GroupNorm(4) -> LeakyReLU -> Conv1d(k3)
- net: N x conformer-naive encoder layers (``conv_only`` variant — each
  layer is a residual conformer convolution module: LayerNorm -> pointwise
  conv (2x expansion) -> GLU -> depthwise conv (k31) -> SiLU -> pointwise
  conv)
- final LayerNorm -> weight-normalized Linear -> sigmoid over 360 bins

Unlike RMVPE/CREPE, FCPE's 360 bins span a *linspace* cents grid between
``f0_min``/``f0_max`` (~19.8 cents/bin vs their fixed 20) and its local
argmax decode clamps the 9-bin window at the edges instead of zero-padding,
so it carries its own decode (:func:`decode_f0_fcpe`) rather than sharing
``dsp.f0.decode_f0``. Mel frontend: 128 bins, Slaney scale (librosa
default, NOT the HTK scale RMVPE uses), fmin 0.

Frames land on the same hop-160 / 10 ms centered grid as RMVPE's mel, so
the streaming pitch-cache geometry is unchanged.
"""

from __future__ import annotations

import dataclasses
import math

import numpy as np
import jax.numpy as jnp
import flax.linen as nn

N_CLASS = 360
F0_MIN = 32.70
F0_MAX = 1975.5


@dataclasses.dataclass(frozen=True)
class FcpeConfig:
    n_mels: int = 128
    hidden: int = 512
    n_layers: int = 6
    out_dims: int = N_CLASS
    expansion: int = 2
    conv_kernel: int = 31
    dtype: jnp.dtype = jnp.float32


class _WeightNormDense(nn.Module):
    """torch ``weight_norm(nn.Linear)`` (dim=0): kernel = v * g / ||v||,
    with the norm taken over the input dimension per output unit."""

    features: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        v = self.param("v", nn.initializers.lecun_normal(), (in_dim, self.features))
        g = self.param("g", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=0))
        kernel = (v * (g / norm)).astype(self.dtype)
        return x @ kernel + bias.astype(self.dtype)


class _ConformerConvModule(nn.Module):
    """torchfcpe ``ConformerConvModule`` (the BatchNorm-free "naive" form):
    LayerNorm -> pointwise conv to 2*inner -> GLU -> depthwise conv ->
    SiLU -> pointwise conv back to dim. Residual is added by the caller."""

    dim: int
    expansion: int
    kernel: int
    dtype: jnp.dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.dim * self.expansion
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="ln")(x)
        h = nn.Conv(2 * inner, (1,), dtype=self.dtype, name="pw1")(h)
        # torch nn.GLU(dim=1) over channels [B, 2*inner, T]:
        # first half * sigmoid(second half) — channel order is preserved
        # by the [out,in,k] -> [k,in,out] kernel conversion.
        h = h[..., :inner] * nn.sigmoid(h[..., inner:])
        pad = self.kernel // 2
        h = nn.Conv(
            inner,
            (self.kernel,),
            padding=[(pad, pad)],
            feature_group_count=inner,
            dtype=self.dtype,
            name="dw",
        )(h)
        h = nn.silu(h)
        return nn.Conv(self.dim, (1,), dtype=self.dtype, name="pw2")(h)


class Fcpe(nn.Module):
    """Log-mel ``[T, n_mels]`` → salience ``[T, 360]`` (sigmoid probs)."""

    config: FcpeConfig = FcpeConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = mel.astype(cfg.dtype)[None]  # [1, T, C]
        x = nn.Conv(cfg.hidden, (3,), padding=[(1, 1)], dtype=cfg.dtype, name="in_conv1")(x)
        x = nn.GroupNorm(num_groups=4, epsilon=1e-5, dtype=cfg.dtype, name="in_gn")(x)
        x = nn.leaky_relu(x, 0.01)
        x = nn.Conv(cfg.hidden, (3,), padding=[(1, 1)], dtype=cfg.dtype, name="in_conv2")(x)
        for i in range(cfg.n_layers):
            x = x + _ConformerConvModule(
                cfg.hidden, cfg.expansion, cfg.conv_kernel, cfg.dtype, name=f"layer_{i}"
            )(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name="final_norm")(x)
        x = _WeightNormDense(cfg.out_dims, dtype=cfg.dtype, name="output_proj")(x)
        return jnp.asarray(nn.sigmoid(x[0]), jnp.float32)


def fcpe_cent_table(
    out_dims: int = N_CLASS, f0_min: float = F0_MIN, f0_max: float = F0_MAX
) -> np.ndarray:
    """torchfcpe's cent grid: linspace between ``1200*log2(f/10)`` of
    f0_min and f0_max over ``out_dims`` bins (~19.8 cents/bin)."""
    lo = 1200.0 * math.log2(f0_min / 10.0)
    hi = 1200.0 * math.log2(f0_max / 10.0)
    return np.linspace(lo, hi, out_dims, dtype=np.float32)


def decode_f0_fcpe(salience: jnp.ndarray, threshold: float = 0.05) -> jnp.ndarray:
    """Salience ``[T, 360]`` → f0 Hz ``[T]`` (torchfcpe local-argmax decode).

    Weighted average of the cent table over the 9 bins centered on the
    per-frame argmax with *clamped* indices (edge bins repeat — torchfcpe
    semantics, vs RMVPE's zero-padded window); frames whose peak salience
    is ≤ ``threshold`` are unvoiced (0 Hz).
    """
    T = salience.shape[0]
    table = jnp.asarray(fcpe_cent_table())
    center = jnp.argmax(salience, axis=1)
    conf = jnp.max(salience, axis=1)
    idx = jnp.clip(center[:, None] - 4 + jnp.arange(9)[None, :], 0, salience.shape[1] - 1)
    rows = jnp.arange(T)[:, None]
    w = salience[rows, idx]
    cents = jnp.sum(w * table[idx], axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1e-12)
    f0 = 10.0 * jnp.exp2(cents / 1200.0)
    return jnp.where(conf > threshold, f0, 0.0)
