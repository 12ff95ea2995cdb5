"""Benchmark: sustained single-stream streaming conversion on one chip.

Measures per-chunk step latency of the full fused pipeline (ContentVec →
RMVPE → synthesizer → resample/RMS/SOLA) at the reference's default geometry
(48 kHz stream, 0.3 s chunks, 2 s context, RVC v2 40k). Prints ONE JSON
line: p50 chunk latency in ms against the 80 ms BASELINE target
(vs_baseline > 1 means faster than target).

Real-time budget context: the reference must finish a chunk in < 300 ms
(sample_length) to keep up (obs-rvc/src/lib.rs:179,830); BASELINE.md sets
<80 ms p50 on one chip.

Supervision: the axon remote-compile service occasionally hangs a compile
request indefinitely (docs/DEVELOPMENT.md). By default the measurement runs
in a supervised child process with a deadline and up to 3 attempts — a hung
attempt is killed and retried fresh, which in practice succeeds. Use
``--no-supervise`` to run inline.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import statistics
import subprocess
import sys
import time


def _build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--warmup", type=int, default=5)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="bfloat16")
    parser.add_argument("--batch", type=int, default=1, help="concurrent streams (DP on one chip)")
    parser.add_argument(
        "--mode",
        choices=["staged", "fused", "auto"],
        default="auto",
        help="staged = per-stage executables (fast, reliable compile); "
        "fused = one monolithic XLA program (slowest compile, fewest dispatches; "
        "~0.9 ms/chunk faster sustained); auto = try fused, fall back to "
        "staged on the last supervised attempt (remote compile is erratic)",
    )
    parser.add_argument(
        "--profile", metavar="DIR", help="capture a jax.profiler trace of the measured steps"
    )
    parser.add_argument("--no-supervise", action="store_true", help="run inline (no retry child)")
    # the Pallas resblock kernel adds ~180 s of Mosaic compile to the synth
    # program when the remote service cooperates (it hangs ~50% of the time)
    # — 480 s cut off ALL modes; the auto ladder's last rung disables it
    parser.add_argument("--attempt-seconds", type=int, default=600)
    parser.add_argument("--attempts", type=int, default=3)
    parser.add_argument("--no-pallas-resblocks", action="store_true",
                        help="disable the fused resblock kernel (reliable compile)")
    parser.add_argument("--exec-cache", dest="exec_cache", action="store_true",
                        default=True,
                        help="serialize/deserialize the compiled step executable "
                        "(utils/exec_cache.py) — a previously-cached fused step "
                        "deserializes in seconds instead of re-entering the "
                        "erratic remote compile (default on; TPU-validated: "
                        "save 4.2s-compile/1MB, load 0.1s, outputs exact)")
    parser.add_argument("--no-exec-cache", dest="exec_cache", action="store_false")
    parser.add_argument("--pitch-algorithm", default="rmvpe",
                        choices=["rmvpe", "crepe", "fcpe"],
                        help="pitch extractor to bench (reference ships rmvpe; "
                        "crepe/fcpe are the upstream-RVC extras)")
    parser.add_argument("--crepe-capacity", default="full", choices=["full", "tiny"],
                        help="crepe model size (torchcrepe's two published nets)")
    return parser


def supervise(argv) -> int:
    """Run the measurement in a child; kill + retry on deadline."""
    args = _build_parser().parse_args(argv)
    # strip "--mode X" / "--mode=X" from argv; re-added per attempt below
    # (argparse is last-wins, so a leaked "--mode=auto" would override the
    # ladder rung's "--mode staged" and silently run fused everywhere)
    base_argv = []
    skip_next = False
    for a in argv:
        if skip_next:
            skip_next = False
            continue
        if a == "--mode":
            skip_next = True
            continue
        if a.startswith("--mode="):
            continue
        base_argv.append(a)
    if args.mode == "auto":
        # ladder: fused gives the best sustained number; the remote compile
        # service hangs intermittently on the monolith AND (~50% observed)
        # on the Pallas resblock kernel's Mosaic compile, so the final rung
        # is staged with the kernel disabled — always compiles in ~40 s
        ladder = [("fused", True), ("staged", True), ("staged", False)][: max(args.attempts, 1)]
        if args.attempts >= len(ladder):
            ladder += [("staged", False)] * (args.attempts - len(ladder))
    else:
        ladder = [(args.mode, True)] * args.attempts
    for attempt, (mode, pallas) in enumerate(ladder):
        child_argv = [sys.executable, "-u", os.path.abspath(__file__), "--no-supervise",
                      "--mode", mode] + ([] if pallas else ["--no-pallas-resblocks"]) + base_argv
        proc = subprocess.Popen(child_argv, stdout=subprocess.PIPE, stderr=sys.stderr,
                                start_new_session=True)
        try:
            out, _ = proc.communicate(timeout=args.attempt_seconds)
            text = out.decode()
            if proc.returncode == 0 and '"metric"' in text:
                line = [l for l in text.splitlines() if '"metric"' in l][-1]
                print(line)
                return 0
            print(f"attempt {attempt + 1} failed (rc={proc.returncode})", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"attempt {attempt + 1} exceeded {args.attempt_seconds}s "
                  "(remote-compile hang) — killing and retrying", file=sys.stderr)
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
    # all attempts failed — distinguish "our program hangs the compiler"
    # from "the remote compile service is down" (observed multi-hour full
    # outages where even backend init blocks)
    canary = subprocess.Popen(
        [sys.executable, "-u", "-c",
         "import jax, jax.numpy as jnp, numpy as np;"
         "print(float(np.asarray(jax.jit(lambda x: (x @ x).sum())(jnp.ones((256, 256))))))"],
        stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, start_new_session=True,
    )
    try:
        canary_out, _ = canary.communicate(timeout=150)
        service = "up" if canary.returncode == 0 and canary_out.strip() else "error"
    except subprocess.TimeoutExpired:
        try:
            os.killpg(canary.pid, signal.SIGKILL)
        except ProcessLookupError:
            pass
        canary.wait()
        service = "DOWN (trivial 256x256 matmul compile hangs)"
    print(json.dumps({"metric": "chunk_p50_ms", "value": -1.0, "unit": "ms",
                      "vs_baseline": 0.0,
                      "extra": {"error": "all bench attempts hit remote-compile hangs",
                                "compile_service": service}}))
    return 1


def main() -> None:
    args = _build_parser().parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from obs_rvc_tpu.config import StreamSettings
    from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState

    if jax.default_backend() == "cpu":
        # persistent executable cache; skipped on the axon tunnel backend,
        # where the remote compile service owns caching (and the local
        # cache hook has been observed to hang it)
        from obs_rvc_tpu.models.checkpoints import enable_compilation_cache

        enable_compilation_cache()

    cfg = StreamSettings().chunk_config(48000)
    crepe_cfg = None
    if args.pitch_algorithm == "crepe" and args.crepe_capacity != "full":
        from obs_rvc_tpu.models.crepe import CrepeConfig

        crepe_cfg = CrepeConfig(capacity=args.crepe_capacity)
    pipe = RvcPipeline(
        cfg,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        pallas_resblocks=False if args.no_pallas_resblocks else None,
        pitch_algorithm=args.pitch_algorithm,
        crepe_cfg=crepe_cfg,
    )
    params = pipe.init_params_fast(0)
    if args.dtype == "bfloat16":
        from obs_rvc_tpu.models.checkpoints import cast_params_for_serving

        # flax casts per-op anyway; pre-cast halves weight HBM traffic
        params = cast_params_for_serving(params)
    params = jax.device_put(params)

    rng = np.random.default_rng(0)
    controls1 = StepControls.default(pitch_shift=12.0, rms_mix_rate=0.5)

    mode = "fused" if args.mode == "auto" else args.mode  # inline runs: no retry ladder
    B = args.batch
    if B == 1:
        state = StreamState.init(cfg)
        step = pipe.staged_step if mode == "staged" else pipe.jit_step
        controls = controls1
        make_chunk = lambda: jnp.asarray(
            rng.standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1
        )
    else:
        state = StreamState.init_batch(cfg, B)
        if mode == "staged":
            import functools

            step = functools.partial(pipe.staged_step, batched=True)
        else:
            step = pipe.jit_step_batch
        controls = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), controls1)
        make_chunk = lambda: jnp.asarray(
            rng.standard_normal((B, cfg.sample_frame_size)).astype(np.float32) * 0.1
        )

    exec_cache_status = None
    if args.exec_cache and mode != "staged":
        # swap the traced jit for a persisted executable: the first process
        # pays the (erratic) remote compile once and serializes the result;
        # every later process deserializes in seconds (utils/exec_cache.py)
        from obs_rvc_tpu.utils.exec_cache import cached_compile

        t0 = time.perf_counter()
        step, exec_cache_status = cached_compile(
            step, (params, state, make_chunk(), controls),
            semantic_key=pipe.fingerprint()
            + ("|jit_step" if B == 1 else "|jit_step_batch"),
        )
        print(
            f"exec-cache: {exec_cache_status} in {time.perf_counter() - t0:.1f}s",
            file=sys.stderr,
        )

    # warmup / compile
    for _ in range(args.warmup):
        state, out = step(params, state, make_chunk(), controls)
    jax.block_until_ready(out)

    import contextlib

    profile_ctx = (
        jax.profiler.trace(args.profile) if args.profile else contextlib.nullcontext()
    )

    # synchronous per-chunk latency (worst case: block every step; the
    # output audio is pulled to host like a real serving client would —
    # also the only reliable sync on the axon relay)
    times = []
    with profile_ctx:
        for _ in range(args.steps):
            chunk = make_chunk()
            jax.block_until_ready(chunk)
            t0 = time.perf_counter()
            state, out = step(params, state, chunk, controls)
            _ = np.asarray(out)
            times.append((time.perf_counter() - t0) * 1000.0)

    # sustained throughput: async dispatch pipelines host↔device latency
    # away (steps chain through the carried state; one sync at the end).
    # The final sync is a device→host pull of a scalar slice — on the axon
    # relay block_until_ready alone has been observed returning before the
    # queued compute drains (docs/DEVELOPMENT.md), which would fake the
    # number; a transfer always waits. Its ~29 ms RTT is amortized over
    # args.steps and subtracted via the 1-step baseline below.
    chunk_dev = jax.device_put(
        np.zeros((B, cfg.sample_frame_size) if B > 1 else (cfg.sample_frame_size,), np.float32)
    )
    _ = np.asarray(chunk_dev)  # settle

    def run_chain(n):
        nonlocal state
        t0 = time.perf_counter()
        st, out = state, None
        for _ in range(n):
            st, out = step(params, st, chunk_dev, controls)
        _ = np.asarray(out.ravel()[:1])  # forced sync
        dt = time.perf_counter() - t0
        state = st
        return dt

    t_one = min(run_chain(1) for _ in range(3))
    t_all = run_chain(args.steps)
    sustained_ms = (t_all - t_one) / (args.steps - 1) * 1000.0

    p50 = statistics.median(times)
    p95 = sorted(times)[max(0, int(len(times) * 0.95) - 1)]
    chunk_s = cfg.sample_frame_size / cfg.sample_rate
    rtf = (p50 / 1000.0) / chunk_s  # <1 = realtime
    audio_s_per_s = B * chunk_s / (sustained_ms / 1000.0)

    # model FLOPs utilization at sustained throughput (neural nets only;
    # TPU v5e peak 197 bf16 TFLOP/s)
    from obs_rvc_tpu.utils.flops import pipeline_gflops_per_chunk

    gflops_per_step = B * pipeline_gflops_per_chunk(cfg)
    peak_tflops = 197.0 if args.dtype == "bfloat16" else 49.0
    # pipeline_gflops assumes the rmvpe pitch stage; crepe/fcpe rows carry
    # approximate MFU (their pitch nets differ by <2 GFLOP/chunk)
    mfu = (gflops_per_step / (sustained_ms / 1000.0)) / (peak_tflops * 1e3)

    print(
        json.dumps(
            {
                "metric": "chunk_p50_ms",
                "value": round(p50, 3),
                "unit": "ms",
                "vs_baseline": round(80.0 / p50, 3),
                "extra": {
                    "p95_ms": round(p95, 3),
                    "sustained_ms_per_chunk": round(sustained_ms, 3),
                    "rtf": round(rtf, 4),
                    "audio_seconds_per_second": round(audio_s_per_s, 2),
                    "mfu": round(mfu, 4),
                    "model_gflops_per_chunk": round(gflops_per_step / B, 2),
                    "batch": B,
                    "mode": mode,
                    "pitch_algorithm": args.pitch_algorithm,
                    **({"crepe_capacity": args.crepe_capacity}
                       if args.pitch_algorithm == "crepe" else {}),
                    "pallas_resblocks": not args.no_pallas_resblocks,
                    "dtype": args.dtype,
                    "chunk_ms": chunk_s * 1000.0,
                    "backend": jax.default_backend(),
                    **({"exec_cache": exec_cache_status} if exec_cache_status else {}),
                },
            }
        )
    )


if __name__ == "__main__":
    if "--no-supervise" in sys.argv:
        main()
    else:
        sys.exit(supervise(sys.argv[1:]))
