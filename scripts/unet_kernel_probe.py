"""Measure the fused RMVPE U-Net level kernel (ops/unet_block.py) on TPU.

Times, via the slope harness (fixed tunnel costs cancelled):
- each Pallas-routed level geometry (encoder 0/1, decoder 3/4 at the default
  chunk: T=64 frames, 128 mels), fused kernel vs the XLA ConvBlockRes chain;
- full RMVPE end-to-end, pallas_unet on vs off.

The VERDICT round-2 target: RMVPE <= 2.5 ms at B=32 (from 4.28 ms measured,
18.6 % MFU — BENCHMARKS.md per-stage table).

Env: NET_BATCH (default 32), DTYPE (bfloat16|float32, default bfloat16),
LEVELS (comma list of level tags to run, default all), FULL (0 to skip the
end-to-end nets).
Usage (TPU, serialized — one python at a time):
    timeout -s KILL 1800 python scripts/unet_kernel_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench
from obs_rvc_tpu.models.rmvpe import RMVPE, ConvBlockRes, RMVPEConfig
from obs_rvc_tpu.ops.unet_block import conv_block_res_chain, fold_bn

B = int(os.environ.get("NET_BATCH", "32"))
DT = jnp.bfloat16 if os.environ.get("DTYPE", "bfloat16") == "bfloat16" else jnp.float32
T, W0 = 64, 128
N_BLOCKS = 4

# (tag, H, W, Cin, C) — every DeepUnet level geometry at the default chunk.
# pallas_unet_max_ch=32 routes enc0/enc1/dec3/dec4; the rest are listed so a
# LEVELS= run can answer whether raising max_ch pays (the C>=64 levels run at
# tiny feature maps, so their XLA chains may already be cheap).
LEVELS = [
    ("enc0", T, W0, 1, 16),        # [B,64,128,1] -> 16
    ("enc1", T // 2, W0 // 2, 16, 32),
    ("enc2", T // 4, W0 // 4, 32, 64),
    ("enc3", T // 8, W0 // 8, 64, 128),
    ("enc4", T // 16, W0 // 16, 128, 256),
    ("dec1", T // 8, W0 // 8, 256, 128),  # concat(128 up + 128 skip) -> 128
    ("dec2", T // 4, W0 // 4, 128, 64),   # concat(64 up + 64 skip) -> 64
    ("dec3", T // 2, W0 // 2, 64, 32),    # concat(32 up + 32 skip) -> 32
    ("dec4", T, W0, 32, 16),              # concat(16 up + 16 skip) -> 16
]


def make_blocks(rng, Cin, C):
    """Random folded (w1,b1,w2,b2,wsc,bsc) per block, plus a matching flax
    ConvBlockRes param tree so the XLA path runs the identical math."""
    import flax.linen as nn

    class Chain(nn.Module):
        @nn.compact
        def __call__(self, x):
            for i in range(N_BLOCKS):
                x = ConvBlockRes(C, DT, name=f"block_{i}")(x)
            return x

    chain = Chain()
    x0 = jnp.zeros((1, 4, 4, Cin), DT)
    params = jax.jit(chain.init)(jax.random.PRNGKey(0), x0)
    # randomize (init gives zeros biases / ones scales; fine either way, but
    # perturb weights so nothing folds away)
    params = jax.tree.map(
        lambda a: jnp.asarray(rng.standard_normal(a.shape).astype(np.float32) * 0.1,
                              a.dtype), params)
    # BN running var must stay positive (sqrt in both paths)
    params = {"params": params["params"],
              "batch_stats": jax.tree.map(lambda a: jnp.abs(a) + 0.5,
                                          params["batch_stats"])}

    blocks = []
    p = params["params"]
    s = params["batch_stats"]
    for i in range(N_BLOCKS):
        bp, bs = p[f"block_{i}"], s[f"block_{i}"]
        w1, b1 = fold_bn(bp["conv1"]["kernel"], bp["bn1"]["scale"], bp["bn1"]["bias"],
                         bs["bn1"]["mean"], bs["bn1"]["var"])
        w2, b2 = fold_bn(bp["conv2"]["kernel"], bp["bn2"]["scale"], bp["bn2"]["bias"],
                         bs["bn2"]["mean"], bs["bn2"]["var"])
        wsc = bsc = None
        if i == 0 and Cin != C:
            wsc = bp["shortcut"]["kernel"].reshape(Cin, C)
            bsc = bp["shortcut"]["bias"]
        blocks.append((w1, b1, w2, b2, wsc, bsc))
    return chain, params, blocks


def main():
    rng = np.random.default_rng(0)
    only = os.environ.get("LEVELS")
    only = set(only.split(",")) if only else None

    print(f"backend={jax.default_backend()} B={B} dtype={DT.__name__}", flush=True)

    for tag, H, W, Cin, C in LEVELS:
        if only and tag not in only:
            continue
        chain, params, blocks = make_blocks(rng, Cin, C)
        x = jnp.asarray(rng.standard_normal((B, H, W, Cin)).astype(np.float32) * 0.3,
                        DT)
        gflop = 2 * N_BLOCKS * (9 * Cin * C + 9 * C * C) * H * W * B / 1e9 \
            + (2 * Cin * C * H * W * B / 1e9 if Cin != C else 0.0)

        us = slope_bench(f"{tag}_pallas [{Cin}->{C} {H}x{W}]",
                         lambda bl, xx: conv_block_res_chain(xx, bl), x,
                         params=blocks)
        print(f"    {tag} pallas: {gflop / (us / 1e6):7.1f} GFLOP/s", flush=True)
        # NOTE: the XLA chain here uses unfolded BN on different var values
        # than the fold above — FLOPs identical, numerics not compared here
        # (parity is gated in tests/test_pallas_ops.py on CPU interpret)
        us = slope_bench(f"{tag}_xla    [{Cin}->{C} {H}x{W}]",
                         lambda p, xx: chain.apply(p, xx), x.astype(DT),
                         params=params)
        print(f"    {tag} xla:    {gflop / (us / 1e6):7.1f} GFLOP/s", flush=True)

    if os.environ.get("FULL", "1") != "1":
        return
    mel = jnp.asarray(rng.standard_normal((B, 128, T)).astype(np.float32))
    # MAX_CH: comma list of pallas_unet_max_ch values to sweep (0 = XLA only)
    for max_ch in [int(v) for v in os.environ.get("MAX_CH", "32,0").split(",")]:
        cfg = RMVPEConfig(dtype=DT, pallas_unet=max_ch > 0,
                          pallas_unet_max_ch=max(max_ch, 32))
        net = RMVPE(cfg)
        params = jax.jit(net.init)(jax.random.PRNGKey(0), mel)
        slope_bench(f"rmvpe_full max_ch={max_ch}",
                    lambda p, m: net.apply(p, m), mel, params=params)


if __name__ == "__main__":
    main()
