"""Is a deserialized PJRT executable slower to run than the same executable
fresh from ``lowered.compile()``? (VERDICT r3 item 5 / weak #2)

Cross-process evidence is 4/4 consistent with "yes": every fresh-compile
bench measured p50 ~33.7-34.1 ms / sustained ~3.07 ms (BENCH_r01, r4 runA)
while every deserialized-hit bench measured p50 ~38.9-39.9 / sustained
~3.33-3.58 (BENCH_r03, r4 runB). But those are different processes minutes
apart on an erratic tunnel — this probe removes the confound by timing BOTH
objects interleaved in ONE process:

1. compile the full fused B=1 step fresh (the expensive part, one lottery
   ticket through the remote-compile service),
2. serialize → deserialize_and_load the bytes back,
3. alternate sustained-chain and sync-step measurements fresh/loaded 3x.

Usage (TPU): timeout -s KILL 1200 python scripts/dispatch_probe.py
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def measure(step, params, state0, chunk, controls, steps=30):
    """(sync_p50_ms, sustained_ms) for a step executable, bench.py-style."""
    state = state0
    # sync per-step
    times = []
    for _ in range(15):
        t0 = time.perf_counter()
        state, out = step(params, state, chunk, controls)
        _ = np.asarray(out)
        times.append((time.perf_counter() - t0) * 1000.0)
    p50 = statistics.median(times)

    def chain(n):
        nonlocal state
        t0 = time.perf_counter()
        st, out = state, None
        for _ in range(n):
            st, out = step(params, st, chunk, controls)
        _ = np.asarray(out.ravel()[:1])
        state = st
        return time.perf_counter() - t0

    t1 = min(chain(1) for _ in range(3))
    tN = chain(steps)
    sustained = (tN - t1) / (steps - 1) * 1000.0
    return p50, sustained


def main():
    import jax.numpy as jnp
    from jax.experimental.serialize_executable import deserialize_and_load, serialize

    from obs_rvc_tpu.config import StreamSettings
    from obs_rvc_tpu.models.checkpoints import cast_params_for_serving
    from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState

    cfg = StreamSettings().chunk_config(48000)
    pipe = RvcPipeline(cfg, compute_dtype=jnp.bfloat16)
    params = jax.device_put(cast_params_for_serving(pipe.init_params_fast(0)))
    state = StreamState.init(cfg)
    controls = StepControls.default(pitch_shift=12.0, rms_mix_rate=0.5)
    rng = np.random.default_rng(0)
    chunk = jnp.asarray(rng.standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1)

    # NO donation: fresh and loaded must be freely re-callable on the same
    # state buffers for interleaved timing (jit_step donates arg 1)
    jitted = jax.jit(pipe.step)
    t0 = time.time()
    lowered = jitted.lower(params, state, chunk, controls)
    fresh = lowered.compile()
    print(f"compile: {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    payload, in_tree, out_tree = serialize(fresh)
    loaded = deserialize_and_load(payload, in_tree, out_tree)
    print(f"serialize+deserialize: {time.time() - t0:.1f}s "
          f"({len(payload)/1e6:.0f} MB)", flush=True)

    # warm both
    jax.block_until_ready(fresh(params, state, chunk, controls))
    jax.block_until_ready(loaded(params, state, chunk, controls))

    for round_ in range(3):
        for name, step in (("fresh ", fresh), ("loaded", loaded)):
            p50, sus = measure(step, params, state, chunk, controls)
            print(f"round {round_} {name}: p50 {p50:6.2f} ms   "
                  f"sustained {sus:6.3f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
