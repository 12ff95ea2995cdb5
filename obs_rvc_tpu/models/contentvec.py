"""ContentVec / HuBERT-style speech feature encoder in Flax.

Replaces the reference's ``contentvec`` ONNX session
(``/root/reference/rvc/src/rvc.rs:81-97``; model selection per version at
``rvc/src/models.rs:52-64``: v1 → ``vec-256-layer-9``, v2 →
``vec-768-layer-12``, see ``rvc-common/src/enums.rs:10-23``).

I/O contract matches the ONNX session: 16 kHz waveform ``[B, L]`` → features
``[B, T, C]`` at 50 Hz with ``T = (L - 400) // 320 + 1``; the engine-side 2×
time-upsampling to 100 Hz (``rvc.rs:99-109``) lives in
:func:`extract_feature`.

Architecture is the wav2vec2/HuBERT *base* encoder (what ContentVec exports
use): 7-layer strided conv frontend (512 ch, 320× downsample, GroupNorm on
the first layer), LayerNorm + 512→768 projection, grouped positional conv
(kernel 128 / 16 groups), then a post-LN transformer stack. v1 taps layer 9
and projects 768→256 ("final_proj"); v2 taps layer 12 unprojected.

TPU notes: all matmuls are kept [T, C]·[C, C'] with C multiples of 128 where
the checkpoint allows; attention over T≈120-240 frames runs dense on the MXU
(no masking needed — chunks are fixed-size and fully valid).
"""

from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp
import flax.linen as nn

# wav2vec2-base conv frontend: (channels, kernel, stride) — 320x total stride,
# receptive field 400 samples (25 ms @ 16 kHz).
CONV_LAYERS: tuple[tuple[int, int, int], ...] = (
    (512, 10, 5),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 3, 2),
    (512, 2, 2),
    (512, 2, 2),
)


def feature_frames(num_samples: int) -> int:
    """50 Hz frame count for a 16 kHz input of ``num_samples``."""
    t = num_samples
    for _, k, s in CONV_LAYERS:
        t = (t - k) // s + 1
    return t


@dataclasses.dataclass(frozen=True)
class ContentVecConfig:
    dim: int = 768
    num_layers: int = 12          # transformer depth actually materialized
    tap_layer: int = 12           # 1-based layer whose output is returned
    num_heads: int = 12
    ffn_dim: int = 3072
    out_dim: int = 768            # 256 for v1 (with final_proj), 768 for v2
    final_proj: bool = False      # v1: project tap output 768→256
    conv_pos_kernel: int = 128
    conv_pos_groups: int = 16
    layer_norm_eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32  # compute dtype (bfloat16 for TPU serving)
    # GELU flavor. fairseq HuBERT uses exact erf-GELU; the tanh approximation
    # is ~2x cheaper on the TPU VPU (erf is a slow transcendental) and its
    # max deviation (~3e-3 abs) is below bfloat16 rounding (eps 7.8e-3), so
    # serving defaults to tanh. Set False for bit-faithful fairseq semantics
    # (the torch-oracle parity tests gate both modes). See PARITY.md.
    gelu_approximate: bool = True

    @staticmethod
    def v1() -> "ContentVecConfig":
        return ContentVecConfig(num_layers=9, tap_layer=9, out_dim=256, final_proj=True)

    @staticmethod
    def v2() -> "ContentVecConfig":
        return ContentVecConfig(num_layers=12, tap_layer=12, out_dim=768, final_proj=False)


class ConvFeatureExtractor(nn.Module):
    """7-layer strided conv frontend; GroupNorm(512) after the first conv,
    GELU after each (wav2vec2 'default' mode, bias-free)."""

    config: ContentVecConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:  # [B, L] -> [B, T, 512]
        cfg = self.config
        x = wav[:, :, None].astype(cfg.dtype)  # NHC with H=time
        for i, (ch, k, s) in enumerate(CONV_LAYERS):
            x = nn.Conv(
                features=ch,
                kernel_size=(k,),
                strides=(s,),
                padding="VALID",
                use_bias=False,
                dtype=cfg.dtype,
                name=f"conv_{i}",
            )(x)
            if i == 0:
                x = nn.GroupNorm(
                    num_groups=512, epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="group_norm"
                )(x)
            x = nn.gelu(x, approximate=cfg.gelu_approximate)
        return x


class PositionalConv(nn.Module):
    """Grouped conv positional embedding (kernel 128, groups 16, SAME-ish
    padding with one trailing element trimmed for even kernels)."""

    config: ContentVecConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        cfg = self.config
        pad = cfg.conv_pos_kernel // 2
        y = nn.Conv(
            features=cfg.dim,
            kernel_size=(cfg.conv_pos_kernel,),
            padding=((pad, pad),),
            feature_group_count=cfg.conv_pos_groups,
            dtype=cfg.dtype,
            name="pos_conv",
        )(x)
        if cfg.conv_pos_kernel % 2 == 0:
            y = y[:, :-1, :]
        return nn.gelu(y, approximate=cfg.gelu_approximate)


class FusedSelfAttention(nn.Module):
    """Self-attention with a single fused QKV projection.

    Numerically identical to ``nn.MultiHeadDotProductAttention`` (q scaled
    by 1/sqrt(D) after bias, same-dtype softmax), but one ``[E, 3·E]``
    matmul instead of three — profiled: flax's per-projection DenseGenerals
    made XLA slice the ``[768, 12, 64]`` weights per head-group at runtime.
    Param layout keeps heads as an explicit axis (``qkv_kernel
    [E, 3, H, D]``) so TP sharding splits heads, never a fused q/k/v mix.
    """

    config: ContentVecConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, E]
        cfg = self.config
        E, H = cfg.dim, cfg.num_heads
        D = E // H
        qkv_k = self.param(
            "qkv_kernel",
            nn.initializers.lecun_normal(in_axis=0, out_axis=(2, 3), batch_axis=(1,)),
            (E, 3, H, D),
        ).astype(cfg.dtype)
        qkv_b = self.param("qkv_bias", nn.initializers.zeros, (3, H, D)).astype(cfg.dtype)
        out_k = self.param(
            "out_kernel",
            nn.initializers.lecun_normal(in_axis=(0, 1), out_axis=2),
            (H, D, E),
        ).astype(cfg.dtype)
        out_b = self.param("out_bias", nn.initializers.zeros, (E,)).astype(cfg.dtype)

        qkv = jnp.einsum("bte,eshd->btshd", x.astype(cfg.dtype), qkv_k) + qkv_b
        q = qkv[:, :, 0] / jnp.asarray(D, cfg.dtype) ** 0.5
        k, v = qkv[:, :, 1], qkv[:, :, 2]                     # [B, T, H, D]
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        w = jax.nn.softmax(scores)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return jnp.einsum("bqhd,hde->bqe", ctx, out_k) + out_b


class TransformerLayer(nn.Module):
    """Post-LN transformer encoder layer (HuBERT base: layer_norm_first=False)."""

    config: ContentVecConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        attn_out = FusedSelfAttention(cfg, name="attn")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="attn_ln")(x + attn_out)

        h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=cfg.gelu_approximate)
        h = nn.Dense(cfg.dim, dtype=cfg.dtype, name="fc2")(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="ffn_ln")(x + h)
        return x


class ContentVec(nn.Module):
    """Full encoder: waveform [B, L] → features [B, T, out_dim] at 50 Hz."""

    config: ContentVecConfig

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        x = ConvFeatureExtractor(cfg, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="post_extract_ln")(x)
        x = nn.Dense(cfg.dim, dtype=cfg.dtype, name="post_extract_proj")(x)

        x = x + PositionalConv(cfg, name="pos_conv")(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=cfg.dtype, name="encoder_ln")(x)

        out = None
        for i in range(cfg.num_layers):
            x = TransformerLayer(cfg, name=f"layer_{i}")(x)
            if i + 1 == cfg.tap_layer:
                out = x
        assert out is not None, "tap_layer exceeds num_layers"

        if cfg.final_proj:
            out = nn.Dense(cfg.out_dim, dtype=cfg.dtype, name="final_proj")(out)
        return out.astype(jnp.float32)


def extract_feature(features_50hz: jnp.ndarray) -> jnp.ndarray:
    """2× time-upsampling 50 Hz → 100 Hz features:
    ``[B, T, C] → [B, 2T+1, C]`` with index ``min(k//2, T-1)``
    (``rvc/src/rvc.rs:99-109``; the hubert fixture's 239 = 2*119+1)."""
    B, T, C = features_50hz.shape
    # repeat-2 along time (+ trailing copy of the last frame) without a
    # gather: [B,T,C] → [B,T,2,C] broadcast → [B,2T,C] → append frame T-1
    doubled = jnp.broadcast_to(features_50hz[:, :, None, :], (B, T, 2, C)).reshape(B, 2 * T, C)
    return jnp.concatenate([doubled, features_50hz[:, T - 1 :, :]], axis=1)
