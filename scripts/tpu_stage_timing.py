"""Diagnose per-stage compile+run time on the real TPU chip.

Usage: python scripts/tpu_stage_timing.py [stage ...]
stages: mel rmvpe contentvec synth dsp step
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from obs_rvc_tpu.config import StreamSettings
from obs_rvc_tpu.models.checkpoints import enable_compilation_cache
from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState

enable_compilation_cache()

STAGES = sys.argv[1:] or ["mel", "rmvpe", "contentvec", "synth", "dsp", "step"]


def bench(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out = jax.block_until_ready(fn(*args))
    run_ms = (time.perf_counter() - t0) / n * 1000
    print(f"{name:12s} compile {compile_s:7.1f}s   run {run_ms:8.2f} ms", flush=True)
    return out


from benchlib import slope_bench as loop_bench


def main():
    cfg = StreamSettings().chunk_config(48000)
    pipe = RvcPipeline(cfg, compute_dtype=jnp.bfloat16)
    print("init params...", flush=True)
    from obs_rvc_tpu.models.checkpoints import cast_params_for_serving
    params = jax.device_put(cast_params_for_serving(pipe.init_params_fast(0)))
    jax.block_until_ready(params)
    print("params ready", flush=True)

    rng = np.random.default_rng(0)
    buf16 = jnp.asarray(rng.standard_normal(cfg.input_buffer_16k_size).astype(np.float32) * 0.1)

    if "mel" in STAGES:
        mel_fn = jax.jit(lambda x: pipe.mel(x[-cfg.rmvpe_frame_16k:]))
        bench("mel", mel_fn, buf16)

    if "rmvpe" in STAGES:
        mel = jnp.zeros((1, 128, cfg.rmvpe_n_frames))
        rmvpe_fn = jax.jit(lambda p, m: pipe.rmvpe.apply(p, m))
        bench("rmvpe", rmvpe_fn, params["rmvpe"], mel)

    if "contentvec" in STAGES:
        cv_fn = jax.jit(lambda p, x: pipe.contentvec.apply(p, x))
        bench("contentvec", cv_fn, params["contentvec"], buf16[None])

    if "synth" in STAGES:
        T = cfg.return_length
        phone = jnp.zeros((1, T, pipe.synth_cfg.feature_dim))
        pitch = jnp.ones((1, T), jnp.int32)
        pitchf = jnp.full((1, T), 220.0)
        sid = jnp.zeros((1,), jnp.int32)
        synth_fn = jax.jit(lambda p, *a: pipe.synthesizer.apply(p, *a))
        bench("synth", synth_fn, params["synthesizer"], phone, pitch, pitchf, sid)

    if "dsp" in STAGES:
        from obs_rvc_tpu.dsp import envelope_mixing, resample_poly, sola_crossfade, sola_offset

        def dsp_fn(buf, model_out, sola_buf):
            out = resample_poly(model_out, cfg.model_sample_rate, cfg.sample_rate)
            out = envelope_mixing(buf[cfg.extra_frame_size:], out, cfg.sample_rate, 0.5)
            off = sola_offset(out, sola_buf, cfg.sola_buffer_frame_size, cfg.sola_search_frame_size)
            return sola_crossfade(out, sola_buf, off, pipe._fade_in, pipe._fade_out, cfg.sample_frame_size)

        buf = jnp.zeros(cfg.input_buffer_size)
        model_out = jnp.zeros(cfg.model_return_size)
        sola_buf = jnp.zeros(cfg.sola_buffer_frame_size)
        bench("dsp", jax.jit(dsp_fn), buf, model_out, sola_buf)

    if "dspsub" in STAGES:
        # per-op breakdown of the DSP block (roofline-gap hunt), amortized
        # over a fori_loop so the tunnel RTT doesn't swamp sub-ms ops
        from obs_rvc_tpu.dsp import envelope_mixing, resample_poly, sola_crossfade, sola_offset

        rng2 = np.random.default_rng(1)
        buf = jnp.asarray(rng2.standard_normal(cfg.input_buffer_size).astype(np.float32) * 0.1)
        out48 = jnp.asarray(
            rng2.standard_normal(
                cfg.model_return_size * cfg.sample_rate // cfg.model_sample_rate
            ).astype(np.float32) * 0.1
        )
        sola_buf = jnp.asarray(
            rng2.standard_normal(cfg.sola_buffer_frame_size).astype(np.float32) * 0.1
        )
        window = jnp.asarray(rng2.standard_normal(cfg.downsample_window).astype(np.float32))

        loop_bench("resamp_down", lambda x: resample_poly(x, cfg.sample_rate, 16000), window)
        loop_bench(
            "resamp_up",
            lambda x: resample_poly(
                x[: cfg.model_return_size], cfg.model_sample_rate, cfg.sample_rate
            ),
            out48,
        )
        # NB: the input side must ride as an argument, not a closure constant
        # — a captured buf makes the whole rms1 branch compile-time constant
        # and XLA's constant folder (slow HLO evaluator) grinds for minutes.
        loop_bench(
            "envelope",
            lambda b, o: envelope_mixing(b[cfg.extra_frame_size :], o, cfg.sample_rate, 0.5),
            out48,
            params=buf,
        )
        loop_bench(
            "sola_offset",
            lambda o: sola_offset(
                o, sola_buf, cfg.sola_buffer_frame_size, cfg.sola_search_frame_size
            ).astype(jnp.float32)[None],
            out48,
        )
        loop_bench(
            "sola_xfade",
            lambda o: jnp.concatenate(
                sola_crossfade(
                    o, sola_buf, jnp.int32(17), pipe._fade_in, pipe._fade_out,
                    cfg.sample_frame_size,
                )
            ),
            out48,
        )

    if "netsub" in STAGES:
        # amortized per-net cost (dependency-chained fori_loop, one dispatch);
        # NET_BATCH=k measures the batched (DP) nets — the models all take a
        # leading batch axis natively
        import os

        NB = int(os.environ.get("NET_BATCH", "1"))
        NETS = os.environ.get("NETS", "contentvec,rmvpe,synth").split(",")
        mel = jnp.asarray(
            np.random.default_rng(2).standard_normal((NB, 128, cfg.rmvpe_n_frames))
            .astype(np.float32)
        )
        T = cfg.return_length
        phone = jnp.asarray(
            np.random.default_rng(3).standard_normal((NB, T, pipe.synth_cfg.feature_dim))
            .astype(np.float32) * 0.1
        )
        pitch = jnp.ones((NB, T), jnp.int32)
        pitchf = jnp.full((NB, T), 220.0)
        sid = jnp.zeros((NB,), jnp.int32)
        wav = jnp.broadcast_to(buf16[None], (NB, buf16.shape[0]))

        if "contentvec" in NETS:
            loop_bench(
                f"contentvec B={NB}",
                lambda p, x: pipe.contentvec.apply(p, x),
                wav,
                params=params["contentvec"],
            )
        if "rmvpe" in NETS:
            loop_bench(
                f"rmvpe B={NB}",
                lambda p, m: pipe.rmvpe.apply(p, m),
                mel,
                params=params["rmvpe"],
            )
        if "synth" in NETS:
            loop_bench(
                f"synth B={NB}",
                lambda pr, p: pipe.synthesizer.apply(pr, p, pitch, pitchf, sid).astype(
                    jnp.float32
                ),
                phone,
                params=params["synthesizer"],
            )

    if "stagesub" in STAGES:
        # amortized per-op cost of the NON-NET stages at NET_BATCH (vmapped),
        # to localize the steploop-minus-nets overhead
        import os

        NB = int(os.environ.get("NET_BATCH", "1"))
        jits = pipe._staged_jits_batch if NB > 1 else pipe._staged_jits
        rng5 = np.random.default_rng(5)

        def bshape(*s):
            return (NB,) + s if NB > 1 else s

        chunk = jnp.asarray(
            rng5.standard_normal(bshape(cfg.sample_frame_size)).astype(np.float32) * 0.1
        )
        in16 = jnp.asarray(
            rng5.standard_normal(bshape(cfg.input_buffer_16k_size)).astype(np.float32) * 0.1
        )
        inbuf = jnp.asarray(
            rng5.standard_normal(bshape(cfg.input_buffer_size)).astype(np.float32) * 0.1
        )
        b16 = jnp.asarray(
            rng5.standard_normal(bshape(cfg.input_buffer_16k_size)).astype(np.float32) * 0.1
        )
        model_out = jnp.asarray(
            rng5.standard_normal(bshape(cfg.model_return_size)).astype(np.float32) * 0.1
        )
        sola = jnp.asarray(
            rng5.standard_normal(bshape(cfg.sola_buffer_frame_size)).astype(np.float32) * 0.1
        )
        salience = jnp.asarray(
            rng5.standard_normal(bshape(cfg.rmvpe_n_frames, 360)).astype(np.float32)
        )
        cache = jnp.asarray(
            rng5.standard_normal(bshape(cfg.pitch_cache_len)).astype(np.float32) * 100 + 150
        )
        controls1 = StepControls.default()
        controls = (
            jax.tree.map(lambda x: jnp.broadcast_to(x, (NB,) + x.shape), controls1)
            if NB > 1 else controls1
        )

        # NB: state-like operands ride as slope_bench params (real jit args),
        # not closure constants — a captured buffer turns whole branches into
        # compile-time constants and the XLA constant folder grinds (see the
        # dspsub note above).
        loop_bench(
            f"pre B={NB}",
            lambda p, c: jnp.concatenate(jits["pre"](p[0], p[1], c), axis=-1),
            chunk,
            params=(in16, inbuf),
        )
        loop_bench(f"mel B={NB}", lambda b: jits["mel"](b), b16)
        loop_bench(
            f"pitch_post B={NB}",
            lambda p, s: (lambda r: jnp.concatenate([r[0], r[2]], axis=-1))(
                jits["pitch_post"](p, s, controls)
            ),
            salience,
            params=cache,
        )
        rmr = jnp.full(bshape(), 0.5)
        loop_bench(
            f"post B={NB}",
            lambda p, m: jnp.concatenate(jits["post"](p, m, sola, rmr), axis=-1),
            model_out,
            params=inbuf,
        )

    if "pre" in STAGES:
        state = StreamState.init(cfg)
        chunk = jnp.zeros(cfg.sample_frame_size)
        bench("pre", pipe._staged_jits["pre"],
              jnp.asarray(state.input_buffer_16k), jnp.asarray(state.input_buffer), chunk)

    if "post" in STAGES:
        buf = jnp.zeros(cfg.input_buffer_size)
        model_out = jnp.zeros(cfg.model_return_size)
        sola_buf = jnp.zeros(cfg.sola_buffer_frame_size)
        bench("post", pipe._staged_jits["post"], buf, model_out, sola_buf, jnp.float32(0.5))

    if "step" in STAGES:
        state = StreamState.init(cfg)
        chunk = jnp.zeros(cfg.sample_frame_size)
        controls = StepControls.default()
        bench("step", jax.jit(pipe.step), params, state, chunk, controls)

    if "steploop" in STAGES:
        # true sustained per-chunk device cost: N steps chained through
        # carried state inside ONE executable, traced count → slope.
        # STEPLOOP_BATCH=k measures the vmapped (DP) step.
        import os

        B = int(os.environ.get("STEPLOOP_BATCH", "1"))
        controls1 = StepControls.default()
        rng7 = np.random.default_rng(7)
        if B == 1:
            controls = controls1
            chunk = jnp.asarray(
                rng7.standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1
            )
            state0 = jax.tree.map(jnp.asarray, StreamState.init(cfg))
            stepfn = pipe.step
        else:
            controls = jax.tree.map(
                lambda x: jnp.broadcast_to(x, (B,) + x.shape), controls1
            )
            chunk = jnp.asarray(
                rng7.standard_normal((B, cfg.sample_frame_size)).astype(np.float32) * 0.1
            )
            state0 = jax.tree.map(jnp.asarray, StreamState.init_batch(cfg, B))
            stepfn = jax.vmap(pipe.step, in_axes=(None, 0, 0, 0))

        def steploop(p, st, n):
            def body(i, s):
                new_s, _out = stepfn(p, s, chunk, controls)
                return new_s
            final = jax.lax.fori_loop(0, n, body, st)
            # scalar probe of the final state: the device→host pull below is
            # the only reliable sync on the axon relay (see benchlib.sync)
            return final, jnp.sum(final.sola_buffer)

        fn = jax.jit(steploop)

        def sync(res):
            return float(np.asarray(res[1]))

        t0 = time.perf_counter()
        sync(fn(params, state0, 5))
        print(f"steploop     compile {time.perf_counter()-t0:7.1f}s", flush=True)

        def best(n, reps=3):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(fn(params, state0, n))
                ts.append(time.perf_counter() - t0)
            return min(ts) * 1000.0

        n1, n2 = 5, 55
        t1, t2 = best(n1), best(n2)
        per = (t2 - t1) / (n2 - n1)
        print(
            f"steploop B={B}  {per:8.2f} ms/chunk sustained"
            f"   (fixed {t1 - n1*per:.1f} ms; {B * cfg.latency_seconds / (per/1000):.0f}x"
            f" realtime aggregate; {B * cfg.latency_seconds / (per/1000):.1f} audio-s/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
