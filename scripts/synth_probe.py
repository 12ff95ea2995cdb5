"""Dissect the synthesizer's device cost (52% MFU at B=32; per-op profile
shows large unfused leaky_relu / resblock-add elementwise passes at the
ch=32/64 generator levels).

Times, via the slope harness: full synthesizer, TextEncoder alone, flow
alone, GeneratorNSF alone, and a per-level generator ladder (truncated
upsample stacks) to localize the elementwise-bound levels.

Env: NET_BATCH (default 32).  Usage (TPU): python scripts/synth_probe.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(__file__))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench
from obs_rvc_tpu.models.synthesizer import (
    GeneratorNSF,
    ResidualCouplingBlock,
    Synthesizer,
    SynthesizerConfig,
    TextEncoder,
)

B = int(os.environ.get("NET_BATCH", "32"))
T = 35  # default chunk return_length


def bf16(tree):
    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, tree
    )


def main():
    rng = np.random.default_rng(0)
    cfg = SynthesizerConfig.for_sample_rate(40000)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, dtype=jnp.bfloat16,
        pallas_resblocks=bool(int(os.environ.get("PALLAS_RESBLOCKS", "0"))),
    )

    phone = jnp.asarray(rng.standard_normal((B, T, 768)).astype(np.float32) * 0.3)
    pitch = jnp.ones((B, T), jnp.int32) * 120
    pitchf = jnp.full((B, T), 150.0, jnp.float32)
    sid = jnp.zeros((B,), jnp.int32)
    z = jnp.asarray(rng.standard_normal((B, T, cfg.inter_channels)).astype(np.float32) * 0.3)
    g = jnp.asarray(rng.standard_normal((B, cfg.gin_channels)).astype(np.float32) * 0.3)

    full = Synthesizer(cfg)
    fparams = bf16(full.init(jax.random.PRNGKey(0), phone, pitch, pitchf, sid))
    slope_bench(
        "synth_full",
        lambda p, x: full.apply(p, x, pitch, pitchf, sid).astype(jnp.float32),
        phone,
        params=fparams,
    )

    enc = TextEncoder(cfg)
    eparams = bf16(enc.init(jax.random.PRNGKey(1), phone, pitch))
    slope_bench(
        "text_encoder",
        lambda p, x: jnp.concatenate(
            [a.astype(jnp.float32) for a in enc.apply(p, x, pitch)], axis=-1
        ),
        phone,
        params=eparams,
    )

    flow = ResidualCouplingBlock(cfg)
    wparams = bf16(flow.init(jax.random.PRNGKey(2), z, g, reverse=True))
    slope_bench(
        "flow",
        lambda p, x: flow.apply(p, x, g, reverse=True).astype(jnp.float32),
        z,
        params=wparams,
    )

    gen = GeneratorNSF(cfg)
    gparams = bf16(gen.init(jax.random.PRNGKey(3), z, pitchf, g, None))
    slope_bench(
        "generator",
        lambda p, x: gen.apply(p, x, pitchf, g, None).astype(jnp.float32),
        z,
        params=gparams,
    )

    # truncated generators: levels 0..k only — the delta between successive
    # rows is the cost of one upsample level (upsample conv + 3 resblocks)
    for k in range(1, len(cfg.upsample_rates)):
        tcfg = dataclasses.replace(
            cfg,
            upsample_rates=cfg.upsample_rates[:k],
            upsample_kernel_sizes=cfg.upsample_kernel_sizes[:k],
        )
        tgen = GeneratorNSF(tcfg)
        tparams = bf16(tgen.init(jax.random.PRNGKey(4), z, pitchf, g, None))
        slope_bench(
            f"gen_levels_0..{k - 1}",
            lambda p, x, tg=tgen: tg.apply(p, x, pitchf, g, None).astype(jnp.float32),
            z,
            params=tparams,
        )


if __name__ == "__main__":
    main()
