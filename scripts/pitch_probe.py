"""TPU cost of the alternative pitch nets (VERDICT r3 item 4): CREPE
full/tiny and FCPE, slope-timed at the pipeline's exact per-chunk geometry,
comparable to RMVPE's whole-net cost (3.11 ms at B=32, BENCHMARKS.md).

Per chunk each stream feeds the pitch net T = rmvpe_n_frames (default 64)
hop-160 frames:
- CREPE consumes per-frame-normalized [T, 1024] windows → [B*T, 1024] when
  batched (the net is frame-independent, so streams flatten into the frame
  axis — exactly what vmap over the pipeline's per-stream call collapses to).
- FCPE consumes log-mel [T, 128] per stream → vmapped over B.

Usage (TPU): python scripts/pitch_probe.py       # B=1 and B=32 in one run
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from benchlib import slope_bench
from obs_rvc_tpu.models.crepe import Crepe, CrepeConfig
from obs_rvc_tpu.models.fcpe import Fcpe, FcpeConfig

T = 64  # rmvpe_n_frames at the default 0.3 s / 2.0 s geometry


def main():
    rng = np.random.default_rng(0)

    for B in (1, 32):
        frames = jnp.asarray(
            rng.standard_normal((B * T, 1024)).astype(np.float32)
        )
        for capacity in ("full", "tiny"):
            net = Crepe(CrepeConfig(capacity=capacity, dtype=jnp.bfloat16))
            params = net.init(jax.random.PRNGKey(0), frames[:1])
            slope_bench(
                f"crepe_{capacity} B={B}",
                lambda p, f: net.apply(p, f),
                frames, params=params,
            )

        mel = jnp.asarray(rng.standard_normal((B, T, 128)).astype(np.float32))
        fnet = Fcpe(FcpeConfig(dtype=jnp.bfloat16))
        fparams = fnet.init(jax.random.PRNGKey(1), mel[0])
        fapply = jax.vmap(lambda m: fnet.apply(fparams, m))
        slope_bench(f"fcpe B={B}", fapply, mel)


if __name__ == "__main__":
    main()
