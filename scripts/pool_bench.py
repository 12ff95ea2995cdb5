"""Measure the SERVING surface at scale: StreamPool ticks on the TPU
(VERDICT r3 item 6 — the 377-416 audio-s/s rows are raw jit_step_batch
numbers; this times the pool path those streams actually ride: ring drain →
masked merge → ring fill).

Drives `capacity` synthetic streams: every tick feeds all slots one chunk
and calls ``process_pending`` (the worker loop's body, without the thread).
Reports p50/p95 tick wall, pool-surface audio-s/s, and — fused mode — the
raw batched step re-timed with the pool's own executable/arguments, so
host overhead = tick − step is an apples-to-apples split. Note the axon
tunnel charges ~29 ms per synchronous device→host pull (the pool's per-tick
``np.asarray(out)``); the script reports it separately via a no-op
transfer, since on a real TPU host that term is ~0.

Usage (TPU): python scripts/pool_bench.py --streams 64 --mode fused
"""

import argparse
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--streams", type=int, default=64)
    ap.add_argument("--ticks", type=int, default=30)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--mode", choices=["staged", "fused"], default="fused")
    ap.add_argument("--io-dtype", choices=["float32", "int16"], default="float32",
                    help="host<->device PCM width (int16 halves transfer bytes)")
    ap.add_argument("--pipelined", action="store_true",
                    help="double-buffered output pulls: tick k's device->host "
                    "transfer overlaps tick k+1's compute (+1 tick latency)")
    ap.add_argument("--no-exec-cache", action="store_true")
    ap.add_argument("--no-pallas-resblocks", action="store_true")
    ap.add_argument("--sample-length", type=float, default=0.30,
                    help="shrink with --extra-inference-time for CPU smokes")
    ap.add_argument("--extra-inference-time", type=float, default=2.00)
    ap.add_argument("--skip-inference", action="store_true")
    ap.add_argument("--pitch-algorithm", default="rmvpe",
                    choices=["rmvpe", "crepe", "fcpe"],
                    help="fcpe is the measured fastest serving extractor "
                    "(BENCHMARKS.md pitch table)")
    ap.add_argument("--realtime", type=float, default=0.0, metavar="SECONDS",
                    help="after the throughput ticks, run wall-clock-paced "
                    "ticks (one chunk per slot every chunk_s) for SECONDS "
                    "and report deadline misses — the reference's implicit "
                    "contract is zero misses within the 300 ms chunk budget "
                    "(obs-rvc/src/lib.rs:179)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from obs_rvc_tpu.config import StreamSettings
    from obs_rvc_tpu.models.checkpoints import cast_params_for_serving
    from obs_rvc_tpu.stream import RvcPipeline, StreamPool

    B = args.streams
    cfg = StreamSettings(
        sample_length=args.sample_length,
        extra_inference_time=args.extra_inference_time,
        skip_inference=args.skip_inference,
    ).chunk_config(48000)
    pipe = RvcPipeline(
        cfg,
        compute_dtype=jnp.bfloat16,
        pallas_resblocks=False if args.no_pallas_resblocks else None,
        pitch_algorithm=args.pitch_algorithm,
    )
    params = jax.device_put(cast_params_for_serving(pipe.init_params_fast(0)))

    t0 = time.perf_counter()
    pool = StreamPool(
        pipe, params, capacity=B, mode=args.mode,
        exec_cache=not args.no_exec_cache,
        input_capacity_chunks=4, output_capacity_chunks=4,
        io_dtype=args.io_dtype, pipelined=args.pipelined,
    )
    slots = [pool.attach() for _ in range(B)]
    rng = np.random.default_rng(0)
    chunk = cfg.sample_frame_size
    frames = (rng.standard_normal((B, chunk)).astype(np.float32) * 0.1)

    phase_log: list[dict] = []
    pulled = [0] * B
    ticked = [0]

    def tick():
        for k, s in enumerate(slots):
            pool.push_audio(s, frames[k])
        t = time.perf_counter()
        n = pool.process_pending()
        assert n == B, n
        dt = (time.perf_counter() - t) * 1000.0
        ticked[0] += 1
        phase_log.append(dict(pool.last_tick_phases))
        for k, s in enumerate(slots):
            # pipelined mode lags one tick; pull whatever has been delivered
            pulled[k] += pool.pull_audio(s, chunk).size
        return dt

    for _ in range(args.warmup):
        tick()
    print(f"setup+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)

    phase_log.clear()
    times = [tick() for _ in range(args.ticks)]
    phases = {
        k: round(statistics.median(p[k] for p in phase_log), 2)
        for k in phase_log[0]
    }
    p50 = statistics.median(times)
    p95 = sorted(times)[max(0, int(len(times) * 0.95) - 1)]
    chunk_s = chunk / cfg.sample_rate
    pool_audio_sps = B * chunk_s / (p50 / 1000.0)

    # tunnel sync tax: a minimal device->host pull (~29 ms on axon, ~0 real).
    # Must pull a freshly COMPUTED array — np.asarray of an unmutated
    # device_put result serves from the cached host buffer (measured 0.0 ms)
    x = jax.device_put(np.zeros((8,), np.float32))
    bump = jax.jit(lambda a: a + 1.0)
    rtts = []
    for _ in range(10):
        x = bump(x)
        jax.block_until_ready(x)
        t = time.perf_counter()
        _ = np.asarray(x)
        rtts.append((time.perf_counter() - t) * 1000.0)
    rtt = statistics.median(rtts)

    step_ms = None
    if args.mode == "fused" and pool._fused_step is not None:
        # re-time the pool's own executable with its resident args: the
        # device cost of a tick, measured the way bench.py measures steps
        states = pool._states
        raw = frames
        if args.io_dtype == "int16":
            raw = np.clip(np.rint(raw * 32768.0), -32768, 32767).astype(np.int16)
        chunks_dev = pool._place_chunks(raw)
        mask_dev = pool._place_mask(np.ones(B, bool))
        controls = pool._controls_device([pool._controls[s] for s in slots],
                                         pool._controls_version)
        sts = []
        for _ in range(max(args.ticks // 2, 5)):
            t = time.perf_counter()
            merged, out = pool._fused_step(
                params, states, chunks_dev, controls, mask_dev)
            _ = np.asarray(out)
            sts.append((time.perf_counter() - t) * 1000.0)
        step_ms = statistics.median(sts)

    realtime = None
    if args.realtime > 0:
        # wall-clock-paced serving: one chunk per slot every chunk_s on an
        # ABSOLUTE schedule (a late tick doesn't shift later deadlines).
        # A tick misses when its outputs aren't ready by the next chunk
        # boundary — the moment a real client would underrun.
        budget = chunk_s
        n_ticks = int(args.realtime / budget)
        lateness = []
        misses = 0
        start = time.perf_counter()
        for kk in range(n_ticks):
            t_due = start + kk * budget
            while True:
                dt = t_due - time.perf_counter()
                if dt <= 0:
                    break
                time.sleep(min(dt, 0.01))
            tick()
            late = time.perf_counter() - t_due - budget
            lateness.append(late * 1000.0)
            if late > 0:
                misses += 1
        lat_sorted = sorted(lateness)
        realtime = {
            "paced_seconds": round(n_ticks * budget, 1),
            "ticks": n_ticks,
            "deadline_misses": misses,
            "miss_rate": round(misses / max(n_ticks, 1), 4),
            # completion relative to the deadline; negative = headroom
            "lateness_p50_ms": round(lat_sorted[len(lat_sorted) // 2], 1),
            "lateness_p95_ms": round(
                lat_sorted[max(0, int(len(lat_sorted) * 0.95) - 1)], 1),
            "lateness_max_ms": round(lat_sorted[-1], 1),
        }

    # drain: every pushed chunk must come back (pipelined lags one tick)
    pool.flush_pending()
    for k, s in enumerate(slots):
        pulled[k] += pool.pull_audio(s, ticked[0] * chunk).size
    assert all(p == ticked[0] * chunk for p in pulled), pulled

    result = {
        "metric": "pool_tick_p50_ms",
        "value": round(p50, 2),
        "unit": "ms",
        "extra": {
            "streams": B,
            "mode": args.mode,
            "io_dtype": args.io_dtype,
            "pipelined": args.pipelined,
            "pitch_algorithm": args.pitch_algorithm,
            **({"realtime": realtime} if realtime else {}),
            "p95_ms": round(p95, 2),
            "pool_audio_seconds_per_second": round(pool_audio_sps, 1),
            "per_chunk_ms": round(p50 / B, 3),
            "sync_rtt_ms": round(rtt, 1),
            "phases_ms": phases,
            **({"raw_step_ms": round(step_ms, 2),
                "host_overhead_ms": round(p50 - step_ms, 2),
                "host_overhead_pct": round((p50 - step_ms) / p50 * 100.0, 1)}
               if step_ms else {}),
        },
    }
    import json

    print(json.dumps(result))


if __name__ == "__main__":
    main()
