"""Capture a jax.profiler trace of one net (or the fused step) and print the
top HLO ops by device time — the definitive answer to "where do the
milliseconds go", replacing guesswork about XLA's conv/layout choices.

Usage (TPU):
    python scripts/profile_net.py rmvpe|contentvec|synth [iters]
    NET_BATCH=32 python scripts/profile_net.py rmvpe

Parses the xplane protobuf with tensorboard_plugin_profile (in-image); no
tensorboard server needed.
"""

import glob
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B = int(os.environ.get("NET_BATCH", "1"))


def build(which):
    from obs_rvc_tpu.config import StreamSettings
    from obs_rvc_tpu.stream import RvcPipeline

    cfg = StreamSettings().chunk_config(48000)
    pipe = RvcPipeline(cfg, compute_dtype=jnp.bfloat16)
    print("init params...", flush=True)
    from obs_rvc_tpu.models.checkpoints import cast_params_for_serving

    params = cast_params_for_serving(pipe.init_params_fast(0))
    rng = np.random.default_rng(0)

    if which == "step":
        from obs_rvc_tpu.stream import StepControls, StreamState

        controls1 = StepControls.default(pitch_shift=12.0, rms_mix_rate=0.5)
        if B == 1:
            state = StreamState.init(cfg)
            step, controls = pipe.jit_step, controls1
            chunk = rng.standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1
        else:
            state = StreamState.init_batch(cfg, B)
            step = pipe.jit_step_batch
            controls = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), controls1)
            chunk = rng.standard_normal((B, cfg.sample_frame_size)).astype(np.float32) * 0.1
        chunk = jnp.asarray(chunk)

        def fn(p, operand):
            st, ch, ctl = operand
            st2, out = step(p, st, ch, ctl)
            return out

        p, x = params, (state, chunk, controls)
        p, x = jax.device_put((p, x))
        jax.block_until_ready((p, x))
        return fn, p, x
    if which == "contentvec":
        x = jnp.asarray(
            rng.standard_normal((B, cfg.input_buffer_16k_size)).astype(np.float32) * 0.1
        )
        fn = jax.jit(lambda p, v: pipe.contentvec.apply(p, v))
        p = params["contentvec"]
    elif which == "rmvpe":
        x = jnp.asarray(
            rng.standard_normal((B, 128, cfg.rmvpe_n_frames)).astype(np.float32)
        )
        fn = jax.jit(lambda p, v: pipe.rmvpe.apply(p, v))
        p = params["rmvpe"]
    elif which == "synth":
        T = cfg.return_length
        x = jnp.asarray(rng.standard_normal((B, T, 768)).astype(np.float32) * 0.3)
        pitch = jnp.ones((B, T), jnp.int32) * 120
        pitchf = jnp.ones((B, T), jnp.float32) * 150.0
        sid = jnp.zeros((B,), jnp.int32)
        fn = jax.jit(
            lambda p, v: pipe.synthesizer.apply(p, v, pitch, pitchf, sid).astype(
                jnp.float32
            )
        )
        p = params["synthesizer"]
    else:
        raise SystemExit(f"unknown net {which}")
    # device-resident operands: otherwise every profiled call re-ships the
    # param tree through the tunnel and the trace measures transfers
    p, x = jax.device_put((p, x))
    jax.block_until_ready((p, x))
    return fn, p, x


def run_and_profile(which, iters):
    fn, p, x = build(which)
    print("compile...", flush=True)
    y = fn(p, x)
    np.asarray(y)  # force completion through the tunnel

    logdir = tempfile.mkdtemp(prefix=f"prof_{which}_")
    with jax.profiler.trace(logdir):
        for _ in range(iters):
            y = fn(p, x)
        np.asarray(y)
    print("trace dir:", logdir, flush=True)
    return logdir


def report(logdir, iters, top=40):
    """Aggregate device-plane op self-times straight from the xplane proto
    (the in-image tensorboard_plugin_profile converter is ABI-mismatched
    with tf; the proto itself parses fine)."""
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    path = max(paths, key=os.path.getmtime)
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        xs.ParseFromString(f.read())

    import re

    for plane in xs.planes:
        if not any(l.events for l in plane.lines):
            continue
        nev = sum(len(l.events) for l in plane.lines)
        print(f"\n== plane {plane.name!r} ({nev} events) ==")
        agg = {}
        for line in plane.lines:
            if line.name not in ("XLA Ops", "XLA TraceMe", "Ops") and "Ops" not in line.name:
                continue
            for ev in line.events:
                name = plane.event_metadata[ev.metadata_id].name
                agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e6
        if not agg:  # fall back: aggregate every line
            for line in plane.lines:
                for ev in line.events:
                    name = f"{line.name}:{plane.event_metadata[ev.metadata_id].name}"
                    agg[name] = agg.get(name, 0.0) + ev.duration_ps / 1e6
        total = sum(agg.values())
        print(f"self time total: {total:.0f} us ({total / iters:.1f} us/iter)")
        # rollup by op kind (copy-start durations are async prefetch windows,
        # not real cost — the jit_* umbrella event ~= wall time per iter)
        cat = {}
        for name, t in agg.items():
            m = re.match(r"%?([a-zA-Z_\-]+)[\.\d]*\s*=", name)
            kind = m.group(1) if m else name.split("(")[0][:40]
            cat[kind] = cat.get(kind, 0.0) + t
        print("by kind:")
        for k, v in sorted(cat.items(), key=lambda kv: -kv[1]):
            if v / total > 0.004:
                print(f"  {v / iters:9.1f} us/iter {100 * v / total:5.1f}%  {k}")
        print(f"{'us/iter':>10} {'%':>6}  op")
        for name, t in sorted(agg.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{t / iters:10.1f} {100 * t / total:6.1f}  {name[:110]}")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "rmvpe"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    logdir = run_and_profile(which, iters)
    report(logdir, iters)
