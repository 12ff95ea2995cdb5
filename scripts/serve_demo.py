"""Real-time serving demo on the attached TPU.

Simulates an audio callback: pushes 10 ms device-rate frames at (faster
than) real time into a StreamSession for N seconds of audio, pulls converted
frames, and prints the metrics snapshot — the live-serving analog of
bench.py's offline numbers.

Usage: python scripts/serve_demo.py [--seconds 15] [--realtime]
"""

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--realtime", action="store_true",
                    help="pace frames at wall-clock real time (else flat out)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from obs_rvc_tpu.config import StreamSettings
    from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamSession, StreamState

    cfg = StreamSettings().chunk_config(48000)
    pipe = RvcPipeline(cfg, compute_dtype=jnp.bfloat16)
    params = jax.device_put(pipe.init_params_fast(0))

    # warm the staged executables before the clock starts
    t0 = time.time()
    state = StreamState.init(cfg)
    state, _ = pipe.staged_step(params, state, jnp.zeros(cfg.sample_frame_size),
                                StepControls.default())
    jax.block_until_ready(state.input_buffer)
    print(f"warmup/compile: {time.time()-t0:.1f}s", flush=True)

    sess = StreamSession(pipe, params, StepControls.default(pitch_shift=12.0, rms_mix_rate=0.5))
    sess.start()

    sr, frame = 48000, 480  # 10 ms frames like an audio callback
    n_frames = int(args.seconds * sr / frame)
    rng = np.random.default_rng(0)
    t = np.arange(frame) / sr
    got = 0
    t_start = time.time()
    for i in range(n_frames):
        f = 220.0 * (1 + 0.2 * np.sin(2 * np.pi * 0.5 * (i * frame / sr)))
        wav = (0.3 * np.sin(2 * np.pi * f * (t + i * frame / sr))).astype(np.float32)
        sess.push_audio(wav)
        got += sess.pull_audio(frame).size
        if args.realtime:
            target = t_start + (i + 1) * frame / sr
            dt = target - time.time()
            if dt > 0:
                time.sleep(dt)
    # drain
    deadline = time.time() + 5
    while got < (n_frames - 2 * cfg.sample_frame_size // frame) * frame and time.time() < deadline:
        got += sess.pull_audio(frame).size
        time.sleep(0.01)
    wall = time.time() - t_start
    sess.stop()

    snap = sess.metrics.snapshot().as_dict()
    snap["pushed_seconds"] = round(n_frames * frame / sr, 2)
    snap["pulled_seconds"] = round(got / sr, 2)
    snap["wall_seconds"] = round(wall, 2)
    print(json.dumps(snap), flush=True)


if __name__ == "__main__":
    main()
