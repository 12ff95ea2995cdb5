"""RMVPE E2E pitch-salience network in Flax.

Replaces the reference's ``rmvpe.onnx`` session (``mel2hidden`` at
``/root/reference/rvc/src/f0/rmvpe.rs:225-241``): log-mel ``[B, 128, T]`` →
salience ``[B, T, 360]``, with T a multiple of 32 (the 5-level U-Net pools
2×2 five times — this is *why* the reference pads frames to 32,
``rmvpe.rs:227``; our chunk geometry guarantees it statically, see
``ChunkConfig.rmvpe_n_frames``).

Architecture mirrors the published RMVPE ``E2E(4, 1, (2, 2))`` used by RVC:
DeepUnet (5 encoder levels ×4 ConvBlockRes, 4 intermediate blocks, 5 decoder
levels with skip concat) → 3-channel 3×3 CNN → BiGRU(384→2×256) →
Linear(512→360) → sigmoid.

BatchNorm runs in inference mode (running stats folded as scale/shift).
The BiGRU keeps torch's gate layout (W_ih ``[3H, in]``, W_hh ``[3H, H]``)
so checkpoint conversion is a direct copy; time recurrence is a
``jax.lax.scan`` (T is small and static — 64 frames per default chunk).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from obs_rvc_tpu.models.layers import ConvTranspose2dTorch

N_MELS = 128
N_CLASS = 360


@dataclasses.dataclass(frozen=True)
class RMVPEConfig:
    en_de_layers: int = 5
    inter_layers: int = 4
    n_blocks: int = 4
    en_out_channels: int = 16
    gru_hidden: int = 256
    n_gru: int = 1
    dtype: jnp.dtype = jnp.float32
    #: fuse small-channel U-Net levels into the Pallas ConvBlockRes-chain
    #: kernel (ops/unet_block.py) — the C <= pallas_unet_max_ch levels run
    #: at the largest feature maps and dominate RMVPE's device time under
    #: XLA (18.6 % MFU at B=32, BENCHMARKS.md)
    pallas_unet: bool = False
    pallas_unet_max_ch: int = 32


class _Conv2dParams(nn.Module):
    """Parameter holder matching ``nn.Conv``'s exact {kernel[, bias]} tree
    and inits — lets the fused Pallas path share one param tree with the
    flax conv path (checkpoint layout unchanged)."""

    features: int
    kernel_size: tuple[int, int]
    use_bias: bool = False

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, in_features, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        return kernel, bias


class _BnParams(nn.Module):
    """Parameter holder matching ``nn.BatchNorm``'s tree (params scale/bias
    + batch_stats mean/var)."""

    @nn.compact
    def __call__(self, features: int):
        scale = self.param("scale", nn.initializers.ones, (features,))
        bias = self.param("bias", nn.initializers.zeros, (features,))
        mean = self.variable("batch_stats", "mean",
                             lambda: jnp.zeros((features,), jnp.float32)).value
        var = self.variable("batch_stats", "var",
                            lambda: jnp.ones((features,), jnp.float32)).value
        return scale, bias, mean, var


class ConvBlockRes(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, params_only: bool = False):  # NHWC
        in_channels = x.shape[-1]
        if params_only:
            # folded (W1, b1, W2, b2, Wsc, bsc) for ops.unet_block — same
            # param tree as the flax path below (holders match nn.Conv /
            # nn.BatchNorm names, shapes, and inits)
            from obs_rvc_tpu.ops.unet_block import fold_bn

            k1, _ = _Conv2dParams(self.out_channels, (3, 3), name="conv1")(in_channels)
            bn1 = _BnParams(name="bn1")(self.out_channels)
            k2, _ = _Conv2dParams(self.out_channels, (3, 3), name="conv2")(self.out_channels)
            bn2 = _BnParams(name="bn2")(self.out_channels)
            w1, b1 = fold_bn(k1, *bn1)
            w2, b2 = fold_bn(k2, *bn2)
            wsc = bsc = None
            if in_channels != self.out_channels:
                wsc, bsc = _Conv2dParams(self.out_channels, (1, 1), use_bias=True,
                                         name="shortcut")(in_channels)
                wsc = wsc.reshape(in_channels, self.out_channels)
            return w1, b1, w2, b2, wsc, bsc
        y = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.out_channels, (3, 3), padding=((1, 1), (1, 1)), use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="shortcut")(x)
        return x + y


def _fused_chain(module: nn.Module, x: jnp.ndarray, out_channels: int,
                 n_blocks: int, dtype) -> jnp.ndarray:
    """Run a level's ConvBlockRes chain through the fused Pallas kernel.

    Declares the blocks' params via their holders (identical tree), then
    calls ``conv_block_res_chain`` — except under ``.init``, where flax
    executes eagerly on the device backend just to trace shapes: the chain
    is shape-static, so a zeros placeholder avoids an eager Mosaic compile
    (same pattern as the synthesizer's resblock bank)."""
    import jax as _jax

    from obs_rvc_tpu.ops.unet_block import conv_block_res_chain

    blocks = []
    for i in range(n_blocks):
        hint = x if i == 0 else jnp.zeros((1, 1, 1, out_channels), x.dtype)
        blocks.append(
            ConvBlockRes(out_channels, dtype, name=f"block_{i}")(hint, params_only=True)
        )
    if module.is_initializing():
        return jnp.zeros(x.shape[:-1] + (out_channels,), dtype)
    return conv_block_res_chain(
        x.astype(dtype), blocks, interpret=_jax.default_backend() == "cpu"
    )


class ResEncoderBlock(nn.Module):
    out_channels: int
    n_blocks: int
    pool: bool
    dtype: jnp.dtype = jnp.float32
    pallas_unet: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if self.pallas_unet:
            x = _fused_chain(self, x, self.out_channels, self.n_blocks, self.dtype)
        else:
            for i in range(self.n_blocks):
                x = ConvBlockRes(self.out_channels, self.dtype, name=f"block_{i}")(x)
        if self.pool:
            # 2x2 mean via reshape instead of reduce-window: numerically the
            # same, but reduce-window forces a W-minor layout on TPU and
            # every neighboring conv wants C-minor — the pools were costing
            # a 16 MB layout copy on each side (profile: copies were ~1/3 of
            # RMVPE runtime at B=32)
            B, H, W, C = x.shape
            pooled = x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))
            return pooled, x  # (downsampled, skip)
        return x


class ResDecoderBlock(nn.Module):
    out_channels: int
    n_blocks: int
    dtype: jnp.dtype = jnp.float32
    pallas_unet: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, skip: jnp.ndarray) -> jnp.ndarray:
        # torch ConvTranspose2d 3x3 stride 2, padding=1, output_padding=1 → exact 2x
        y = ConvTranspose2dTorch(
            self.out_channels, (3, 3), stride=(2, 2), padding=(1, 1),
            output_padding=(1, 1), use_bias=False, dtype=self.dtype, name="up",
        )(x)
        y = nn.BatchNorm(use_running_average=True, dtype=self.dtype, name="bn")(y)
        y = nn.relu(y)
        y = jnp.concatenate([y, skip], axis=-1)
        if self.pallas_unet:
            y = _fused_chain(self, y, self.out_channels, self.n_blocks, self.dtype)
        else:
            for i in range(self.n_blocks):
                y = ConvBlockRes(self.out_channels, self.dtype, name=f"block_{i}")(y)
        return y


class DeepUnet(nn.Module):
    config: RMVPEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, 128, 1] NHWC
        cfg = self.config
        x = nn.BatchNorm(use_running_average=True, dtype=cfg.dtype, name="in_bn")(x)

        skips = []
        ch = cfg.en_out_channels
        for i in range(cfg.en_de_layers):
            fuse = cfg.pallas_unet and ch <= cfg.pallas_unet_max_ch
            x, skip = ResEncoderBlock(ch, cfg.n_blocks, pool=True, dtype=cfg.dtype,
                                      pallas_unet=fuse, name=f"encoder_{i}")(x)
            skips.append(skip)
            ch *= 2

        # intermediate: first block doubles channels (256→512), rest keep
        for i in range(cfg.inter_layers):
            x = ResEncoderBlock(ch, cfg.n_blocks, pool=False, dtype=cfg.dtype,
                                name=f"intermediate_{i}")(x)

        for i in range(cfg.en_de_layers):
            ch //= 2
            fuse = cfg.pallas_unet and ch <= cfg.pallas_unet_max_ch
            x = ResDecoderBlock(ch, cfg.n_blocks, dtype=cfg.dtype,
                                pallas_unet=fuse, name=f"decoder_{i}")(x, skips[-(i + 1)])
        return x  # [B, T, 128, 16]


class BiGRU(nn.Module):
    """Bidirectional GRU with torch gate layout (r, z, n)."""

    hidden: int
    num_layers: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, C] → [B, T, 2H]
        H = self.hidden
        x = x.astype(self.dtype)
        for layer in range(self.num_layers):
            in_dim = x.shape[-1]
            ws = {}
            for direction in (0, 1):
                ws[direction] = tuple(
                    self.param(f"l{layer}_d{direction}_{nm}", init, shape).astype(self.dtype)
                    for nm, init, shape in (
                        ("w_ih", nn.initializers.lecun_normal(), (3 * H, in_dim)),
                        ("w_hh", nn.initializers.orthogonal(), (3 * H, H)),
                        ("b_ih", nn.initializers.zeros, (3 * H,)),
                        ("b_hh", nn.initializers.zeros, (3 * H,)),
                    )
                )

            # hoist the input projections out of the recurrence (one [T,in]
            # matmul per direction instead of T small ones) and run both
            # directions in one scan (stacked on a direction axis) — ~4x
            # fewer sequential matmul launches than the naive form
            gi_f = x @ ws[0][0].T + ws[0][2]                 # [B, T, 3H]
            gi_b = x[:, ::-1, :] @ ws[1][0].T + ws[1][2]
            gi = jnp.stack([gi_f, gi_b], axis=0)             # [2, B, T, 3H]
            w_hh = jnp.stack([ws[0][1], ws[1][1]], axis=0)   # [2, 3H, H]
            b_hh = jnp.stack([ws[0][3], ws[1][3]], axis=0)   # [2, 3H]

            def step(h, gi_t):
                # h: [2, B, H]; gi_t: [2, B, 3H]
                gh = jnp.einsum("dbh,dgh->dbg", h, w_hh) + b_hh[:, None, :]
                i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
                h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(i_r + h_r)
                z = jax.nn.sigmoid(i_z + h_z)
                n = jnp.tanh(i_n + r * h_n)
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h0 = jnp.zeros((2, x.shape[0], H), dtype=self.dtype)
            # unroll: each step is a tiny [B,H]x[H,3H] matmul — sequential-loop
            # overhead dominates on TPU, so let XLA schedule 8 steps per trip
            _, ys = jax.lax.scan(step, h0, jnp.moveaxis(gi, 2, 0), unroll=8)  # [T, 2, B, H]
            fwd = jnp.swapaxes(ys[:, 0], 0, 1)            # [B, T, H]
            bwd = jnp.swapaxes(ys[:, 1], 0, 1)[:, ::-1, :]  # un-reverse
            x = jnp.concatenate([fwd, bwd], axis=-1)
        return x


class RMVPE(nn.Module):
    """mel ``[B, 128, T]`` → salience ``[B, T, 360]`` (T % 32 == 0)."""

    config: RMVPEConfig = RMVPEConfig()

    @nn.compact
    def __call__(self, mel: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        assert mel.shape[1] == N_MELS, f"expected [B, {N_MELS}, T], got {mel.shape}"
        assert mel.shape[2] % 32 == 0, "RMVPE frame count must be a multiple of 32"

        x = jnp.swapaxes(mel, 1, 2)[..., None]  # [B, T, 128, 1] NHWC
        x = DeepUnet(cfg, name="unet")(x)
        x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype, name="cnn")(x)
        # [B, T, 128, 3] → [B, T, 384] (torch flattens channel-major: C×W)
        x = jnp.swapaxes(x, 2, 3).reshape(x.shape[0], x.shape[1], 3 * N_MELS)
        x = BiGRU(cfg.gru_hidden, cfg.n_gru, dtype=cfg.dtype, name="gru")(x)
        x = nn.Dense(N_CLASS, dtype=cfg.dtype, name="fc")(x)
        return jax.nn.sigmoid(x).astype(jnp.float32)
