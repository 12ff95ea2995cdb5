"""Dissect RMVPE's device cost (the lowest-MFU net: tiny U-Net channels).

Times, via the slope harness (fixed costs cancelled):
- the real submodules: DeepUnet, BiGRU, cnn+fc head — who owns the ~0.5 ms?
- level-0-geometry conv chains in candidate layouts/dtypes — is the
  bottleneck MXU lane waste (C=16 << 128), layout padding traffic, or
  sequential scheduling?

Env: NET_BATCH (default 1); SECTIONS=submodules skips the layout
experiments (round-4 per-piece accounting of the 3.11 ms: intermediates,
pools/concats, cnn+fc head, mel — the pieces the per-level U-Net table
doesn't cover).
Usage (TPU): python scripts/rmvpe_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench
from obs_rvc_tpu.models.rmvpe import RMVPE, BiGRU, DeepUnet, RMVPEConfig

B = int(os.environ.get("NET_BATCH", "1"))
T, W = 64, 128


def conv_chain(x, kernels, dn):
    for k in kernels:
        x = jax.lax.conv_general_dilated(
            x, k, window_strides=(1, 1), padding="SAME", dimension_numbers=dn
        )
        x = jax.nn.relu(x)
    return x


def main():
    rng = np.random.default_rng(0)
    cfg = RMVPEConfig(dtype=jnp.bfloat16)

    # --- real submodules --------------------------------------------------
    # (SECTIONS=pieces skips the full-net/U-Net compiles — the monolith
    # compile through the remote service is hang-prone and the numbers are
    # already recorded; the pieces compile reliably in seconds)
    if os.environ.get("SECTIONS") != "pieces":
        mel = jnp.asarray(rng.standard_normal((B, 128, T)).astype(np.float32))
        net = RMVPE(cfg)
        params = net.init(jax.random.PRNGKey(0), mel)
        slope_bench("rmvpe_full", lambda p, m: net.apply(p, m), mel, params=params)

        unet = DeepUnet(cfg)
        xin = jnp.swapaxes(mel, 1, 2)[..., None]
        uparams = unet.init(jax.random.PRNGKey(1), xin)
        slope_bench("unet_only", lambda p, m: unet.apply(p, m), xin, params=uparams)

    gru = BiGRU(cfg.gru_hidden, 1, dtype=cfg.dtype)
    gin = jnp.asarray(rng.standard_normal((B, T, 384)).astype(np.float32))
    gparams = gru.init(jax.random.PRNGKey(2), gin)
    slope_bench("bigru_only", lambda p, g: gru.apply(p, g), gin, params=gparams)

    # --- the pieces the per-level table doesn't cover ---------------------
    # intermediates: 4 x ResEncoderBlock(512, pool=False) at the bottleneck
    # geometry [B, T/32, W/32, 256] — the single largest FLOPs block left on
    # XLA (32 convs of 3x3x512 on 2x4 maps at B=32)
    import flax.linen as nn

    from obs_rvc_tpu.models.rmvpe import ResEncoderBlock

    class Inters(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(cfg.inter_layers):
                x = ResEncoderBlock(512, cfg.n_blocks, pool=False,
                                    dtype=cfg.dtype, name=f"intermediate_{i}")(x)
            return x

    iin = jnp.asarray(rng.standard_normal((B, T // 32, 4, 256)).astype(np.float32))
    inters = Inters()
    ipar = inters.init(jax.random.PRNGKey(3), iin)
    slope_bench("intermediates_only", lambda p, m: inters.apply(p, m), iin, params=ipar)

    # cnn + flatten + fc head (post-U-Net, pre-GRU glue)
    class Head(nn.Module):
        @nn.compact
        def __call__(self, x):  # [B, T, 128, 16]
            x = nn.Conv(3, (3, 3), padding=((1, 1), (1, 1)), dtype=cfg.dtype,
                        name="cnn")(x)
            x = jnp.swapaxes(x, 2, 3).reshape(x.shape[0], x.shape[1], 3 * 128)
            return x

    hin = jnp.asarray(rng.standard_normal((B, T, W, 16)).astype(np.float32))
    head = Head()
    hpar = head.init(jax.random.PRNGKey(4), hin)
    slope_bench("cnn_head_only", lambda p, m: head.apply(p, m), hin, params=hpar)

    if os.environ.get("SECTIONS") in ("submodules", "pieces"):
        return

    # --- layout experiments at level-0 geometry ---------------------------
    C = 16
    for dtype, tag in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        x_nhwc = jnp.asarray(
            rng.standard_normal((B, T, W, C)).astype(np.float32), dtype
        )
        ks = [
            jnp.asarray(
                (rng.standard_normal((3, 3, C, C)) * 0.1).astype(np.float32), dtype
            )
            for _ in range(8)
        ]
        slope_bench(
            f"l0_8conv_nhwc_{tag}",
            lambda k, x: conv_chain(x, k, ("NHWC", "HWIO", "NHWC")),
            x_nhwc,
            params=ks,
        )
        # W as minor dim (128 = native lane width), C as a leading dim
        x_nchw = jnp.moveaxis(x_nhwc, -1, 1)
        ks_oihw = [jnp.transpose(k, (3, 2, 0, 1)) for k in ks]
        slope_bench(
            f"l0_8conv_nchw_{tag}",
            lambda k, x: conv_chain(x, k, ("NCHW", "OIHW", "NCHW")),
            x_nchw,
            params=ks_oihw,
        )
        # channel-widened control: same FLOPs-per-byte shape the MXU likes
        # (C=128): how fast is this level if channels were not tiny?
        xw = jnp.asarray(
            rng.standard_normal((B, T, W // 8, 128)).astype(np.float32), dtype
        )
        kw = [
            jnp.asarray(
                (rng.standard_normal((3, 3, 128, 128)) * 0.03).astype(np.float32),
                dtype,
            )
            for _ in range(8)
        ]
        slope_bench(
            f"l0_8conv_c128_{tag} (8x FLOPs)",
            lambda k, x: conv_chain(x, k, ("NHWC", "HWIO", "NHWC")),
            xw,
            params=kw,
        )


if __name__ == "__main__":
    main()
