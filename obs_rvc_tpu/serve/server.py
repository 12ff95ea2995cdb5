"""Unified streaming server entry point.

Brings up every serving front door over one pipeline/pool:

- duplex PCM over raw TCP (``stream_server``, tag-framed)
- the same protocol over WebSocket (``ws``) for browser clients
- HTTP health/metrics (``health``)
- optionally the reference-wire-compatible RPC server (``rpc``) on stdio
  replacement semantics — TCP only here

Usage::

    python -m obs_rvc_tpu.serve.server --port 7861 --ws-port 7862 \
        --health-port 8080 --pool 8 --model model.pth [...]

All model/settings flags match ``serve.cli`` (the reference's 13 settings,
``obs-rvc/src/lib.rs:77-89``). With ``--pool N``, connections claim slots of
one batched StreamPool (one vmapped step per tick — DP serving); otherwise
each connection gets an independent StreamSession.
"""

from __future__ import annotations

import argparse
import sys
import threading


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native RVC streaming server")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=7861, help="duplex TCP port (0 = off)")
    p.add_argument("--ws-port", type=int, default=0, help="WebSocket port (0 = off)")
    p.add_argument("--health-port", type=int, default=0, help="health/metrics HTTP port (0 = off)")
    p.add_argument("--rpc-port", type=int, default=0,
                   help="reference-compatible RPC port (0 = off)")
    p.add_argument("--pool", type=int, default=0,
                   help="batch connections through a StreamPool of this capacity (0 = per-connection sessions)")
    p.add_argument("--mesh", default="",
                   help="serve across a device mesh, e.g. 'data=4,model=2' "
                   "(data=-1 fills the remaining devices). With --pool the "
                   "pool's slot states/chunks ride the data axis and params "
                   "shard by the TP rules; without --pool the mesh must be "
                   "data=1 (per-connection sessions get TP-sharded params). "
                   "BASELINE config 5's N-stream pod-slice knob.")
    p.add_argument("--device-sample-rate", type=int, default=48000)
    # model artifacts + the 13 settings (mirrors serve.cli)
    p.add_argument("--model")
    p.add_argument("--contentvec")
    p.add_argument("--rmvpe")
    p.add_argument("--index")
    p.add_argument("--index-dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--index-mode", default="exact", choices=["exact", "ivf"],
                   help="retrieval search: brute-force or TPU-native IVF list probing")
    p.add_argument("--index-probes", type=int, default=0,
                   help="ivf mode: lists probed per chunk (0 = auto)")
    p.add_argument("--index-lcap", type=int, default=64,
                   help="ivf mode: static slab rows gathered per probed "
                   "list; lists longer than this are split into balanced "
                   "sublists at load (retrieval/build.balance_lists), so "
                   "the cap costs bandwidth, not recall (0 = uncapped)")
    p.add_argument("--model-version", default="v2", choices=["v1", "v2"])
    p.add_argument("--pitch-algorithm", default="rmvpe", choices=["rmvpe", "crepe", "fcpe"])
    p.add_argument("--crepe")
    p.add_argument("--fcpe")
    p.add_argument("--dest-sample-rate", type=int, default=40000)
    p.add_argument("--pitch-shift", type=float, default=0.0)
    p.add_argument("--resonance-shift", type=float, default=0.0)
    p.add_argument("--index-rate", type=float, default=0.0)
    p.add_argument("--loudness-factor", type=float, default=1.0)
    p.add_argument("--sample-length", type=float, default=0.30)
    p.add_argument("--fade-length", type=float, default=0.07)
    p.add_argument("--extra-inference-time", type=float, default=2.00)
    p.add_argument("--skip-inference", action="store_true")
    p.add_argument("--speaker-id", type=int, default=0)
    p.add_argument("--f0-median-radius", type=int, default=0)
    p.add_argument("--phase-vocoder", action="store_true")
    p.add_argument("--step-mode", default="staged", choices=["staged", "fused"],
                   help="per-connection sessions: staged = per-stage programs "
                   "(robust compile, default); fused = one executable per step "
                   "(~0.9 ms/chunk faster sustained; pair with --exec-cache for "
                   "deterministic startup)")
    p.add_argument("--pool-io-dtype", default="float32",
                   choices=["float32", "int16"],
                   help="host<->device PCM width for pool ticks (int16 halves "
                   "the per-tick transfer bytes; needs --step-mode fused)")
    p.add_argument("--pool-pipelined", action="store_true",
                   help="double-buffered pool ticks: tick k's output pull "
                   "overlaps tick k+1's compute (+1 chunk output latency; "
                   "needs --step-mode fused). The high-throughput preset.")
    p.add_argument("--exec-cache", action="store_true",
                   help="persist compiled per-geometry executables to disk "
                   "(utils/exec_cache.py) so engine restarts skip the "
                   "multi-minute TPU compile")
    p.add_argument("--dtype", default="bfloat16", choices=["float32", "bfloat16"])
    p.add_argument("--no-pallas-resblocks", action="store_true",
                   help="disable the fused resblock kernel (its Mosaic compile "
                   "hangs intermittently through the axon remote-compile tunnel)")
    p.add_argument("--stage-timing", action="store_true",
                   help="collect per-stage p50s into /metrics (forces per-stage sync)")
    return p


def build_pipeline(args):
    import jax.numpy as jnp

    from obs_rvc_tpu.config import PitchAlgorithm, RvcModelVersion, StreamSettings
    from obs_rvc_tpu.models.checkpoints import load_pipeline_params
    from obs_rvc_tpu.stream import StepControls

    settings = StreamSettings(
        model_path=args.model,
        index_path=args.index,
        model_version=RvcModelVersion.from_str(args.model_version),
        pitch_algorithm=PitchAlgorithm.from_str(args.pitch_algorithm),
        dest_sample_rate=args.dest_sample_rate,
        pitch_shift=int(args.pitch_shift),
        resonance_shift=args.resonance_shift,
        index_rate=args.index_rate,
        rms_mix_rate=args.loudness_factor,
        sample_length=args.sample_length,
        fade_length=args.fade_length,
        extra_inference_time=args.extra_inference_time,
        skip_inference=args.skip_inference,
    )
    cfg = settings.chunk_config(args.device_sample_rate)
    pipe = _build_pipe(args, settings, cfg, jnp)
    if cfg.skip_inference:
        # the passthrough path touches no nets (stream/pipeline.py skip
        # branch) — don't pay a full-model random init to serve it
        params = {}
    else:
        params = load_pipeline_params(
            pipe,
            contentvec_path=args.contentvec,
            rmvpe_path=args.rmvpe,
            crepe_path=args.crepe,
            fcpe_path=args.fcpe,
            synthesizer_path=args.model,
            index_path=args.index,
            index_dtype=jnp.bfloat16 if args.index_dtype == "bfloat16" else None,
        )
        if args.dtype == "bfloat16":
            from obs_rvc_tpu.models.checkpoints import cast_params_for_serving

            # flax casts per-op anyway; pre-cast halves weight HBM traffic
            params = cast_params_for_serving(params)
    controls = StepControls.default(
        pitch_shift=args.pitch_shift,
        rms_mix_rate=args.loudness_factor,
        index_rate=args.index_rate,
        sid=args.speaker_id,
    )
    return pipe, params, controls


def _build_pipe(args, settings, cfg, jnp):
    from obs_rvc_tpu.retrieval import RetrievalIndex
    from obs_rvc_tpu.stream import RvcPipeline

    return RvcPipeline(
        cfg,
        settings.model_version,
        retrieval_index=RetrievalIndex(
            mode=args.index_mode, probes=args.index_probes or None,
            lcap=args.index_lcap or None,
        ) if args.index else None,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        pitch_algorithm=str(settings.pitch_algorithm),
        keyshift=int(round(args.resonance_shift)),
        f0_median_radius=args.f0_median_radius,
        phase_vocoder=args.phase_vocoder,
        pallas_resblocks=False if args.no_pallas_resblocks else None,
    )


def main(argv=None, *, ready=None, stop_event=None) -> None:
    args = build_parser().parse_args(argv)

    from obs_rvc_tpu.serve.health import start_health_server
    from obs_rvc_tpu.serve.stream_server import serve_tcp
    from obs_rvc_tpu.serve.ws import serve_ws_tcp
    from obs_rvc_tpu.stream import StreamSession
    from obs_rvc_tpu.stream.pool import StreamPool

    pipe, params, controls = build_pipeline(args)

    mesh = None
    if args.mesh:
        from obs_rvc_tpu.parallel import parse_mesh_spec, shard_params

        mesh = parse_mesh_spec(args.mesh)
        print(f"serving on mesh {dict(mesh.shape)}", file=sys.stderr)
        if not args.pool and mesh.shape["data"] != 1:
            raise SystemExit(
                "--mesh with data>1 needs --pool (per-connection sessions "
                "are unbatched; only the pool rides the data axis)"
            )
        # shard ONCE at the top so every front door (pool, per-connection
        # sessions, the --rpc-port engine) sees the TP placement; the pool's
        # own shard_params call is a re-place no-op on committed arrays
        params = shard_params(params, mesh)

    pool = None
    metrics = None
    if args.pool:
        pool = StreamPool(pipe, params, capacity=args.pool,
                          batch_min=max(1, args.pool // 4),
                          default_controls=controls,
                          mode=args.step_mode, exec_cache=args.exec_cache,
                          mesh=mesh, io_dtype=args.pool_io_dtype,
                          pipelined=args.pool_pipelined)
        pool.start()
        metrics = pool.metrics

        def make_session():  # pragma: no cover - pool path claims slots instead
            raise RuntimeError("pool mode")
    else:
        from obs_rvc_tpu.serve.metrics import ChunkMetrics

        # one scrape target aggregating every connection's session
        metrics = ChunkMetrics(chunk_seconds=pipe.cfg.latency_seconds)

        def make_session():
            return StreamSession(
                pipe, params, controls,
                mode=args.step_mode, exec_cache=args.exec_cache,
                stage_timing=args.stage_timing, metrics=metrics,
            )

    if args.health_port:
        # pool occupancy rides /metrics so operators (and the soak test) can
        # see slot pressure without a side channel
        extra = None
        if pool is not None:
            def extra(pool=pool):
                ready, active = pool.ready_slots()
                return {"pool_ready": ready, "pool_active": active,
                        "pool_capacity": pool.capacity}
        _, hp = start_health_server(metrics, args.host, args.health_port,
                                    extra=extra)
        print(f"health/metrics on {args.host}:{hp}", file=sys.stderr)

    threads = []
    if args.ws_port:
        threads.append(threading.Thread(
            target=serve_ws_tcp, args=(make_session, args.host, args.ws_port),
            kwargs={"pool": pool}, daemon=True))
    if args.rpc_port:
        from obs_rvc_tpu.serve.rpc import serve_tcp as rpc_serve_tcp
        from obs_rvc_tpu.stream.engine import RvcEngine

        engine = RvcEngine(pipe, params, exec_cache=args.exec_cache)
        threads.append(threading.Thread(
            target=rpc_serve_tcp, args=(engine, args.host, args.rpc_port), daemon=True))
    for t in threads:
        t.start()

    if args.port:
        # blocks; ``ready``/``stop_event`` let an embedding test (or
        # supervisor) learn the bound port and shut the accept loop down
        serve_tcp(make_session, args.host, args.port, pool=pool,
                  ready=ready, stop_event=stop_event)
        if pool is not None:
            pool.stop()
    else:
        for t in threads:
            t.join()


if __name__ == "__main__":
    main()
