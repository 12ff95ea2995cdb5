"""RVC synthesizer (SynthesizerTrnMs{256,768}NSFsid) inference graph in Flax.

Replaces the user-supplied RVC ``.onnx`` session of the reference
(``/root/reference/rvc/src/rvc.rs:193-215``): inputs ``phone [B, T, C]``
(100 Hz features), ``pitch [B, T]`` (coarse codes 1..=255), ``pitchf [B, T]``
(f0 Hz) → waveform ``[B, T * sr/100]`` at the model sample rate. The fuller
export signature the reference comments out (``rvc.rs:186-203``: ``ds``
speaker id, ``rnd`` noise) is supported here as explicit arguments.

Stages (inference path of RVC's ``SynthesizerTrnMs768NSFsid.infer``):

1. ``TextEncoder``: phone proj + pitch embedding → ×√192 → LeakyReLU →
   6-layer transformer with windowed relative-position attention
   (window 10) → 1×1 conv → (m_p, logs_p).
2. ``z_p = m_p + exp(logs_p) * rnd * 0.66666``.
3. ``flow⁻¹``: 4 residual coupling layers (mean-only, WN hidden, speaker-
   conditioned) applied in reverse with channel flips.
4. ``GeneratorNSF``: harmonic source from pitchf (SineGen) + transposed-conv
   upsampling stack with per-scale source injection and ResBlock1 banks.

TPU notes: everything is static-shape; T is the chunk's ``return_length``
(35 by default). The generator's transposed convs are input-dilated convs
(MXU-friendly); the sine source cumsum runs at output rate as a single
``jnp.cumsum``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from obs_rvc_tpu.models.layers import ConvTranspose1dTorch, leaky_relu


@dataclasses.dataclass(frozen=True)
class SynthesizerConfig:
    feature_dim: int = 768            # 256 for v1 models
    inter_channels: int = 192
    hidden_channels: int = 192
    filter_channels: int = 768
    n_heads: int = 2
    n_layers: int = 6
    kernel_size: int = 3
    attn_window: int = 10
    resblock_kernel_sizes: tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: tuple[tuple[int, ...], ...] = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    upsample_rates: tuple[int, ...] = (10, 10, 2, 2)          # 40k
    upsample_kernel_sizes: tuple[int, ...] = (16, 16, 4, 4)   # 40k
    upsample_initial_channel: int = 512
    spk_embed_dim: int = 109
    gin_channels: int = 256
    sample_rate: int = 40000
    flow_layers: int = 3
    flow_flows: int = 4
    flow_kernel: int = 5
    temperature: float = 0.66666
    dtype: jnp.dtype = jnp.float32
    # Fuse the small-channel (C<=64) upsample levels' resblock banks into one
    # Pallas kernel each (ops/resblock.py): XLA runs those levels at 9-32%
    # MFU (lane padding on every elementwise pass + per-conv HBM
    # round-trips). Measured at B=32 bf16: C=32 im2col form 6.47 -> 3.09 ms,
    # C=64 tapdot form 3.15 -> 2.95 ms. Enabled by RvcPipeline on TPU
    # backends; on CPU the kernels run in (slow) interpret mode, so tests
    # gate them explicitly instead of defaulting on.
    pallas_resblocks: bool = False

    @property
    def upp(self) -> int:
        out = 1
        for r in self.upsample_rates:
            out *= r
        return out

    @staticmethod
    def for_sample_rate(sr: int, feature_dim: int = 768) -> "SynthesizerConfig":
        """Standard RVC generator geometries per target rate."""
        if sr == 32000:
            rates, kernels = (10, 8, 2, 2), (20, 16, 4, 4)
        elif sr == 40000:
            rates, kernels = (10, 10, 2, 2), (16, 16, 4, 4)
        elif sr == 48000:
            rates, kernels = (12, 10, 2, 2), (24, 20, 4, 4)
        else:
            raise ValueError(f"unsupported model sample rate {sr}")
        return SynthesizerConfig(
            feature_dim=feature_dim,
            upsample_rates=rates,
            upsample_kernel_sizes=kernels,
            sample_rate=sr,
        )


# ---------------------------------------------------------------------------
# Relative-position multi-head attention (VITS attentions.MultiHeadAttention)
# ---------------------------------------------------------------------------


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, 2T-1] relative logits → [B, H, T, T] absolute."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))  # [B,H,T,2T]
    x = x.reshape(B, H, T * 2 * T)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, T - 1)))
    x = x.reshape(B, H, T + 1, 2 * T - 1)
    return x[:, :, :T, T - 1 :]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """[B, H, T, T] attention weights → [B, H, T, 2T-1] relative."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, T - 1)))
    x = x.reshape(B, H, T * (2 * T - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (T, 0)))
    x = x.reshape(B, H, T, 2 * T)
    return x[:, :, :, 1:]


class RelPosAttention(nn.Module):
    channels: int
    n_heads: int
    window_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C]
        C, H = self.channels, self.n_heads
        D = C // H
        T = x.shape[1]

        q = nn.Dense(C, dtype=self.dtype, name="conv_q")(x)
        k = nn.Dense(C, dtype=self.dtype, name="conv_k")(x)
        v = nn.Dense(C, dtype=self.dtype, name="conv_v")(x)

        def split_heads(t):
            return t.reshape(t.shape[0], T, H, D).transpose(0, 2, 1, 3)  # [B,H,T,D]

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scores = jnp.einsum("bhtd,bhsd->bhts", q / math.sqrt(D), k)

        # windowed relative position bias (VITS: only for self-attention)
        W = self.window_size
        emb_rel_k = self.param(
            "emb_rel_k", nn.initializers.normal(D**-0.5), (1, 2 * W + 1, D)
        )
        emb_rel_v = self.param(
            "emb_rel_v", nn.initializers.normal(D**-0.5), (1, 2 * W + 1, D)
        )

        def rel_embeddings(emb):
            # center-crop/pad stored window to 2T-1 entries
            pad_len = max(T - (W + 1), 0)
            start = max((W + 1) - T, 0)
            emb = jnp.pad(emb, ((0, 0), (pad_len, pad_len), (0, 0)))
            return emb[:, start : start + 2 * T - 1]

        rel_k = rel_embeddings(emb_rel_k.astype(self.dtype))  # [1, 2T-1, D]
        rel_logits = jnp.einsum("bhtd,xrd->bhtr", q / math.sqrt(D), rel_k)
        scores = scores + _relative_to_absolute(rel_logits)

        p = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhts,bhsd->bhtd", p, v)

        rel_v = rel_embeddings(emb_rel_v.astype(self.dtype))
        rel_w = _absolute_to_relative(p)
        out = out + jnp.einsum("bhtr,xrd->bhtd", rel_w, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(x.shape[0], T, C)
        return nn.Dense(C, dtype=self.dtype, name="conv_o")(out)


class EncoderFFN(nn.Module):
    filter_channels: int
    out_channels: int
    kernel_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pad = self.kernel_size // 2
        h = nn.Conv(self.filter_channels, (self.kernel_size,), padding=((pad, pad),),
                    dtype=self.dtype, name="conv_1")(x)
        h = nn.relu(h)
        return nn.Conv(self.out_channels, (self.kernel_size,), padding=((pad, pad),),
                       dtype=self.dtype, name="conv_2")(h)


class TextEncoder(nn.Module):
    """RVC TextEncoder{256,768}: features+pitch → (m_p, logs_p), [B, T, 192] each."""

    config: SynthesizerConfig

    @nn.compact
    def __call__(self, phone: jnp.ndarray, pitch: jnp.ndarray):
        cfg = self.config
        Ch = cfg.hidden_channels
        x = nn.Dense(Ch, dtype=cfg.dtype, name="emb_phone")(phone.astype(cfg.dtype))
        pitch_emb = nn.Embed(256, Ch, dtype=cfg.dtype, name="emb_pitch")(pitch)
        x = (x + pitch_emb) * math.sqrt(Ch)
        x = leaky_relu(x, 0.1)

        for i in range(cfg.n_layers):
            y = RelPosAttention(Ch, cfg.n_heads, cfg.attn_window, cfg.dtype,
                                name=f"attn_{i}")(x)
            # VITS modules.LayerNorm uses eps 1e-5 (flax default is 1e-6)
            x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name=f"norm1_{i}")(x + y)
            y = EncoderFFN(cfg.filter_channels, Ch, cfg.kernel_size, cfg.dtype,
                           name=f"ffn_{i}")(x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=cfg.dtype, name=f"norm2_{i}")(x + y)

        stats = nn.Dense(cfg.inter_channels * 2, dtype=cfg.dtype, name="proj")(x)
        m, logs = jnp.split(stats, 2, axis=-1)
        return m, logs


# ---------------------------------------------------------------------------
# Flow: residual coupling block with WaveNet hidden nets
# ---------------------------------------------------------------------------


class WN(nn.Module):
    """Gated dilated-conv stack (modules.WN) with speaker conditioning."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:  # [B,T,H], [B,gin]
        H = self.hidden_channels
        # one conv producing all layers' conditioning at once (torch cond_layer)
        g_all = nn.Dense(2 * H * self.n_layers, dtype=self.dtype, name="cond_layer")(
            g.astype(self.dtype)
        )  # [B, 2H*L]

        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            pad = (self.kernel_size * dilation - dilation) // 2
            x_in = nn.Conv(
                2 * H, (self.kernel_size,), kernel_dilation=(dilation,),
                padding=((pad, pad),), dtype=self.dtype, name=f"in_{i}",
            )(x)
            g_l = g_all[:, None, i * 2 * H : (i + 1) * 2 * H]
            acts = x_in + g_l
            t_act = jnp.tanh(acts[..., :H])
            s_act = jax.nn.sigmoid(acts[..., H:])
            acts = t_act * s_act

            res_skip_ch = 2 * H if i < self.n_layers - 1 else H
            res_skip = nn.Conv(res_skip_ch, (1,), dtype=self.dtype, name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = x + res_skip[..., :H]
                output = output + res_skip[..., H:]
            else:
                output = output + res_skip
        return output


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling (modules.ResidualCouplingLayer)."""

    config: SynthesizerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray, reverse: bool) -> jnp.ndarray:
        cfg = self.config
        half = cfg.inter_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Dense(cfg.hidden_channels, dtype=cfg.dtype, name="pre")(x0)
        h = WN(cfg.hidden_channels, cfg.flow_kernel, 1, cfg.flow_layers,
               cfg.gin_channels, cfg.dtype, name="enc")(h, g)
        m = nn.Dense(half, dtype=cfg.dtype, name="post")(h)
        x1 = x1 - m if reverse else x1 + m
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    config: SynthesizerConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, g: jnp.ndarray, reverse: bool = True) -> jnp.ndarray:
        cfg = self.config
        layers = list(range(cfg.flow_flows))
        if reverse:
            layers = layers[::-1]
        for i in layers:
            if not reverse:
                x = ResidualCouplingLayer(cfg, name=f"flow_{i}")(x, g, reverse=False)
                x = x[..., ::-1]  # Flip
            else:
                x = x[..., ::-1]
                x = ResidualCouplingLayer(cfg, name=f"flow_{i}")(x, g, reverse=True)
        return x


# ---------------------------------------------------------------------------
# NSF-HiFiGAN generator
# ---------------------------------------------------------------------------


def sine_source(
    f0: jnp.ndarray,
    upp: int,
    sample_rate: int,
    rng: Optional[jax.Array],
    sine_amp: float = 0.1,
    noise_std: float = 0.003,
    voiced_threshold: float = 0.0,
) -> jnp.ndarray:
    """SineGen: frame-rate f0 ``[B, T]`` → harmonic source ``[B, T*upp]``.

    Phase-continuous fundamental via cumulative phase of nearest-upsampled
    per-frame frequency with the wrap corrections RVC applies to keep the
    sample-rate cumsum aligned to the frame-rate one.
    """
    B, T = f0.shape
    rad = (f0 / sample_rate) % 1.0  # [B, T]

    # frame-rate phase, scaled to sample count, linearly interpolated (the
    # align-corners interp of RVC's SineGen), then wrapped
    cum_frame = jnp.cumsum(rad, axis=1) * upp  # [B, T]

    def interp_linear_ac(x, size):
        n = x.shape[1]
        pos = jnp.arange(size) * ((n - 1) / (size - 1))
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
        hi = jnp.clip(jnp.ceil(pos).astype(jnp.int32), 0, n - 1)
        frac = (pos - lo).astype(x.dtype)
        return x[:, lo] * (1 - frac) + x[:, hi] * frac

    over_one = interp_linear_ac(cum_frame, T * upp) % 1.0
    rad_s = jnp.repeat(rad, upp, axis=1)  # nearest upsample [B, T*upp]

    wrap = (over_one[:, 1:] - over_one[:, :-1]) < 0
    shift = jnp.pad(wrap.astype(rad_s.dtype) * -1.0, ((0, 0), (1, 0)))
    phase = jnp.cumsum(rad_s + shift, axis=1)
    sine = jnp.sin(2.0 * jnp.pi * phase) * sine_amp

    uv = (f0 > voiced_threshold).astype(rad_s.dtype)
    uv = jnp.repeat(uv, upp, axis=1)
    noise_amp = uv * noise_std + (1.0 - uv) * (sine_amp / 3.0)
    if rng is not None:
        noise = noise_amp * jax.random.normal(rng, sine.shape, dtype=sine.dtype)
    else:
        noise = 0.0
    return sine * uv + noise


class _ConvParams(nn.Module):
    """Parameter holder with ``nn.Conv``'s exact {kernel, bias} tree and
    inits — lets :class:`ResBlock1` share one param tree between the flax
    conv path and the fused Pallas kernel (checkpoint layout unchanged)."""

    features: int
    kernel_size: int

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


def _conv1d_same(x, kernel, bias, dilation: int, dtype) -> jnp.ndarray:
    """``nn.Conv(..., kernel_dilation=(d,), padding=SAME-centered)`` as the
    explicit lax call (identical dtype promotion, dims, and padding)."""
    k = kernel.shape[0]
    pad = (k * dilation - dilation) // 2
    y = jax.lax.conv_general_dilated(
        x.astype(dtype), kernel.astype(dtype),
        window_strides=(1,), padding=((pad, pad),), rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return y + bias.astype(dtype)


class ResBlock1(nn.Module):
    channels: int
    kernel_size: int
    dilations: tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):
        ws = []
        for i in range(len(self.dilations)):
            w1, b1 = _ConvParams(self.channels, self.kernel_size, name=f"conv1_{i}")(
                self.channels
            )
            w2, b2 = _ConvParams(self.channels, self.kernel_size, name=f"conv2_{i}")(
                self.channels
            )
            ws.append((w1, b1, w2, b2))
        if params_only:
            # stacked [S, k, C, C] / [S, C] views for ops.resblock_bank
            return tuple(
                jnp.stack([w[part] for w in ws]).astype(self.dtype)
                for part in range(4)
            )
        for (w1, b1, w2, b2), d in zip(ws, self.dilations):
            xt = leaky_relu(x, 0.1)
            xt = _conv1d_same(xt, w1, b1, d, self.dtype)
            xt = leaky_relu(xt, 0.1)
            xt = _conv1d_same(xt, w2, b2, 1, self.dtype)
            x = x + xt
        return x


class GeneratorNSF(nn.Module):
    config: SynthesizerConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, f0: jnp.ndarray, g: jnp.ndarray, rng: Optional[jax.Array]
    ) -> jnp.ndarray:
        """z ``[B, T, 192]``, f0 Hz ``[B, T]``, speaker ``[B, gin]`` →
        waveform ``[B, T*upp]``."""
        cfg = self.config
        upp = cfg.upp
        nk = len(cfg.resblock_kernel_sizes)

        # SourceModuleHnNSF: SineGen → linear merge → tanh (harmonic_num=0)
        har = sine_source(f0, upp, cfg.sample_rate, rng)[..., None]  # [B, L, 1]
        har = jnp.tanh(nn.Dense(1, dtype=cfg.dtype, name="source_linear")(har.astype(cfg.dtype)))

        x = nn.Conv(cfg.upsample_initial_channel, (7,), padding=((3, 3),),
                    dtype=cfg.dtype, name="conv_pre")(x.astype(cfg.dtype))
        x = x + nn.Dense(cfg.upsample_initial_channel, dtype=cfg.dtype, name="cond")(
            g.astype(cfg.dtype)
        )[:, None, :]

        for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            x = leaky_relu(x, 0.1)
            x = ConvTranspose1dTorch(ch, k, stride=u, padding=(k - u) // 2,
                                     dtype=cfg.dtype, name=f"ups_{i}")(x)
            if i + 1 < len(cfg.upsample_rates):
                stride_f0 = 1
                for r in cfg.upsample_rates[i + 1 :]:
                    stride_f0 *= r
                src = nn.Conv(ch, (stride_f0 * 2,), strides=(stride_f0,),
                              padding=((stride_f0 // 2, stride_f0 // 2),),
                              dtype=cfg.dtype, name=f"noise_conv_{i}")(har)
            else:
                src = nn.Conv(ch, (1,), dtype=cfg.dtype, name=f"noise_conv_{i}")(har)
            x = x + src
            banks = [
                ResBlock1(ch, rk, rd, cfg.dtype, name=f"resblock_{i}_{j}")
                for j, (rk, rd) in enumerate(
                    zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)
                )
            ]
            shared_dil = all(
                rd == cfg.resblock_dilation_sizes[0]
                for rd in cfg.resblock_dilation_sizes
            )
            # measured crossovers (scripts/resblock64_probe.py, B=32, bf16):
            # tapdot wins BOTH small levels — C=64: 2.95 vs XLA 3.15 vs
            # im2col 3.69 ms; C=32: 2.96 vs XLA 6.43 vs im2col 3.12 ms —
            # and Mosaic-compiles 5.6x faster than im2col (96 vs 542 s).
            # im2col keeps the C<32 levels (48k models have a C=16 level
            # where a 16-deep tapdot contraction would idle 7/8 of the MXU);
            # at C>=128 XLA's native conv holds the roofline.
            if cfg.pallas_resblocks and ch <= 64 and shared_dil:
                from obs_rvc_tpu.ops.resblock import resblock_bank, resblock_bank_tapdot

                bank = resblock_bank if ch < 32 else resblock_bank_tapdot
                bank_params = [b(x, params_only=True) for b in banks]
                if not self.is_initializing():
                    # during .init flax executes this eagerly (op-by-op on
                    # the device backend) just to trace shapes — the bank is
                    # shape-preserving, so skip the kernel there (eagerly
                    # compiling+running it through the axon tunnel stalls
                    # init for minutes)
                    x = bank(
                        x.astype(cfg.dtype), bank_params,
                        cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes[0],
                        interpret=jax.default_backend() == "cpu",
                    )
            else:
                xs = None
                for b in banks:
                    y = b(x)
                    xs = y if xs is None else xs + y
                x = xs / nk

        # HiFiGAN's final activation is F.leaky_relu at torch's DEFAULT slope
        # 0.01, unlike the 0.1 (LRELU_SLOPE) used everywhere else — caught by
        # the full-model torch-oracle gate (tests/test_torch_oracle.py)
        x = leaky_relu(x, 0.01)
        x = nn.Conv(1, (7,), padding=((3, 3),), use_bias=False, dtype=cfg.dtype,
                    name="conv_post")(x)
        # squeeze BEFORE tanh: on [B, L, 1] the C=1 minor dim gets a 1-lane
        # TPU layout and the tanh+convert fusion ran 0.84 ms at B=32; on
        # [B, L] time rides the lanes and it is bandwidth-trivial
        return jnp.tanh(x[..., 0]).astype(jnp.float32)


class Synthesizer(nn.Module):
    """Full inference graph; see module docstring."""

    config: SynthesizerConfig

    @nn.compact
    def __call__(
        self,
        phone: jnp.ndarray,          # [B, T, C] 100 Hz features
        pitch: jnp.ndarray,          # [B, T] int32 coarse codes
        pitchf: jnp.ndarray,         # [B, T] f0 Hz
        sid: jnp.ndarray,            # [B] int32 speaker id
        rnd: Optional[jnp.ndarray] = None,   # [B, T, 192] prior noise
        noise_rng: Optional[jax.Array] = None,
    ) -> jnp.ndarray:
        cfg = self.config
        g = nn.Embed(cfg.spk_embed_dim, cfg.gin_channels, dtype=cfg.dtype,
                     name="emb_g")(sid)  # [B, gin]

        m_p, logs_p = TextEncoder(cfg, name="enc_p")(phone, pitch)
        if rnd is None:
            rnd = jnp.zeros_like(m_p)
        z_p = m_p + jnp.exp(logs_p) * rnd * cfg.temperature
        z = ResidualCouplingBlock(cfg, name="flow")(z_p, g, reverse=True)
        return GeneratorNSF(cfg, name="dec")(z, pitchf, g, noise_rng)
