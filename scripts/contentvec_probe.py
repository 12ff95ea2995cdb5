"""Dissect ContentVec's device cost (38.8% MFU at B=32 — ~2x headroom).

Times, via the slope harness: full net, conv frontend alone, transformer
stack alone (pre-extracted features in), one layer, attention-only and
FFN-only variants. Env: NET_BATCH (default 1).

Usage (TPU): python scripts/contentvec_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

from benchlib import slope_bench
from obs_rvc_tpu.models.contentvec import (
    ContentVec,
    ContentVecConfig,
    ConvFeatureExtractor,
    TransformerLayer,
    feature_frames,
)

B = int(os.environ.get("NET_BATCH", "1"))
L = 38400  # default chunk geometry: 2.4 s at 16 kHz


def main():
    rng = np.random.default_rng(0)
    cfg = ContentVecConfig(dtype=jnp.bfloat16)
    T = feature_frames(L)
    print(f"B={B} L={L} T={T}")

    wav = jnp.asarray(rng.standard_normal((B, L)).astype(np.float32) * 0.1)
    net = ContentVec(cfg)
    params = net.init(jax.random.PRNGKey(0), wav)
    slope_bench("contentvec_full", lambda p, w: net.apply(p, w), wav, params=params)

    fe = ConvFeatureExtractor(cfg)
    fparams = fe.init(jax.random.PRNGKey(1), wav)
    slope_bench("frontend_only", lambda p, w: fe.apply(p, w), wav, params=fparams)

    feats = jnp.asarray(
        rng.standard_normal((B, T, cfg.dim)).astype(np.float32), jnp.bfloat16
    )
    layer = TransformerLayer(cfg)
    lparams = layer.init(jax.random.PRNGKey(2), feats)

    def stack12(p, x):
        for _ in range(12):
            x = layer.apply(p, x)  # same weights; identical cost profile
        return x

    slope_bench("12_layers", stack12, feats, params=lparams, n1=4, n2=24)
    slope_bench("1_layer", lambda p, x: layer.apply(p, x), feats, params=lparams)

    # attention vs FFN split
    attn = nn.MultiHeadDotProductAttention(
        num_heads=cfg.num_heads, qkv_features=cfg.dim, out_features=cfg.dim,
        dtype=cfg.dtype,
    )
    aparams = attn.init(jax.random.PRNGKey(3), feats, feats)
    slope_bench("attn_only", lambda p, x: attn.apply(p, x, x), feats, params=aparams)

    class FFN(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype)(x)
            h = nn.gelu(h, approximate=False)
            return nn.Dense(cfg.dim, dtype=cfg.dtype)(h)

    ffn = FFN()
    fp = ffn.init(jax.random.PRNGKey(4), feats)
    slope_bench("ffn_only", lambda p, x: ffn.apply(p, x), feats, params=fp)
    # tanh-approx GELU control (erf is a slow transcendental on some targets)
    class FFNTanh(nn.Module):
        @nn.compact
        def __call__(self, x):
            h = nn.Dense(cfg.ffn_dim, dtype=cfg.dtype)(x)
            h = nn.gelu(h, approximate=True)
            return nn.Dense(cfg.dim, dtype=cfg.dtype)(h)

    ffn2 = FFNTanh()
    fp2 = ffn2.init(jax.random.PRNGKey(4), feats)
    slope_bench("ffn_gelu_tanh", lambda p, x: ffn2.apply(p, x), feats, params=fp2)

    # T padded to a lane multiple (239 -> 256): does shape padding matter?
    feats256 = jnp.asarray(
        rng.standard_normal((B, 256, cfg.dim)).astype(np.float32), jnp.bfloat16
    )
    slope_bench("1_layer_T256", lambda p, x: layer.apply(p, x), feats256,
                params=lparams)


if __name__ == "__main__":
    main()
