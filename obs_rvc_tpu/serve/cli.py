"""Command-line conversion: WAV in → converted WAV out.

The offline equivalent of adding the reference's OBS filter to a source —
every one of its 13 settings (``obs-rvc/src/lib.rs:77-89``) maps to a flag.

Usage::

    python -m obs_rvc_tpu.serve.cli input.wav output.wav \
        --model model.pth --pitch-shift 12 --loudness-factor 0.5 \
        --index voice.index --index-rate 0.75
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="TPU-native RVC voice conversion")
    p.add_argument("input", help="input WAV")
    p.add_argument("output", help="output WAV")
    # model artifacts (reference: model_path/index_path settings + bundled
    # contentvec/rmvpe in the plugin data dir)
    p.add_argument("--model", help="RVC synthesizer .pth (random init if omitted)")
    p.add_argument("--contentvec", help="ContentVec/HuBERT .pt checkpoint")
    p.add_argument("--rmvpe", help="RMVPE .pt checkpoint")
    p.add_argument("--crepe", help="torchcrepe .pth checkpoint (pitch-algorithm crepe)")
    p.add_argument("--fcpe", help="torchfcpe .pt checkpoint (pitch-algorithm fcpe)")
    p.add_argument("--index", help="faiss .index / .npy feature table")
    p.add_argument("--index-dtype", default="float32", choices=["float32", "bfloat16"],
                   help="on-chip table dtype; bfloat16 halves the search's HBM traffic")
    p.add_argument("--index-mode", default="exact", choices=["exact", "ivf"],
                   help="retrieval search: brute-force over the table, or TPU-native "
                        "IVF list probing (the faiss nprobe analog — for big tables)")
    p.add_argument("--index-probes", type=int, default=0,
                   help="ivf mode: lists probed per chunk (0 = auto: max(64, frames), "
                        "the faiss-recall-superset regime)")
    p.add_argument("--index-lcap", type=int, default=64,
                   help="ivf mode: static slab rows gathered per probed "
                   "list; lists longer than this are split into balanced "
                   "sublists at load (retrieval/build.balance_lists), so "
                   "the cap costs bandwidth, not recall (0 = uncapped)")
    # the 13 settings
    p.add_argument("--model-version", default="v2", choices=["v1", "v2"])
    p.add_argument("--dest-sample-rate", type=int, default=40000)
    p.add_argument("--pitch-algorithm", default="rmvpe", choices=["rmvpe", "crepe", "fcpe"])
    p.add_argument("--pitch-shift", type=float, default=0.0)
    p.add_argument("--resonance-shift", type=float, default=0.0)
    p.add_argument("--index-rate", type=float, default=0.0)
    p.add_argument("--loudness-factor", type=float, default=0.5)
    p.add_argument("--sample-length", type=float, default=0.30)
    p.add_argument("--fade-length", type=float, default=0.07)
    p.add_argument("--extra-inference-time", type=float, default=2.00)
    p.add_argument("--skip-inference", action="store_true")
    # extras beyond the reference
    p.add_argument("--speaker-id", type=int, default=0)
    p.add_argument("--f0-median-radius", type=int, default=0)
    p.add_argument("--phase-vocoder", action="store_true",
                   help="phase-corrected SOLA crossfade (the reference's lib.rs:778 TODO)")
    p.add_argument("--dtype", default="float32", choices=["float32", "bfloat16"])
    p.add_argument("--no-pallas-resblocks", action="store_true",
                   help="disable the fused resblock kernel (its Mosaic compile "
                   "hangs intermittently through the axon remote-compile tunnel; "
                   "irrelevant on real TPU hosts, which compile locally)")
    p.add_argument("--metrics-json", action="store_true", help="print metrics JSON to stderr")
    p.add_argument("--mesh", default="",
                   help="convert with TP-sharded params over a device mesh, "
                   "e.g. 'model=2' (offline conversion is one stream, so the "
                   "data axis must be 1; see serve.server --mesh for DP)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from obs_rvc_tpu.config import PitchAlgorithm, RvcModelVersion, StreamSettings
    from obs_rvc_tpu.models.checkpoints import load_pipeline_params
    from obs_rvc_tpu.retrieval import RetrievalIndex
    from obs_rvc_tpu.stream import RvcPipeline, StepControls
    from obs_rvc_tpu.utils import downmix_to_mono, read_wav, upmix_from_mono, write_wav

    audio, sr = read_wav(args.input)
    channels = audio.shape[0]
    mono = downmix_to_mono(audio)

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
    cfg = settings.chunk_config(sr)
    pipe = RvcPipeline(
        cfg,
        settings.model_version,
        f0_median_radius=args.f0_median_radius,
        retrieval_index=RetrievalIndex(
            mode=args.index_mode, probes=args.index_probes or None,
            lcap=args.index_lcap or None,
        ) if args.index else None,
        compute_dtype=jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32,
        pitch_algorithm=str(settings.pitch_algorithm),
        keyshift=int(round(args.resonance_shift)),
        phase_vocoder=args.phase_vocoder,
        pallas_resblocks=False if args.no_pallas_resblocks else None,
    )
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
    if args.mesh:
        from obs_rvc_tpu.parallel import parse_mesh_spec, shard_params

        # default_data=1: offline conversion is one stream, so "--mesh
        # model=2" must mean TP-only, not "fill data with remaining devices"
        mesh = parse_mesh_spec(args.mesh, default_data=1)
        if mesh.shape["data"] != 1:
            raise SystemExit("offline conversion is one stream — use data=1 "
                             "(DP lives in serve.server --pool --mesh)")
        params = shard_params(params, mesh)

    t0 = time.perf_counter()
    out = np.asarray(pipe.convert_offline(params, jnp.asarray(mono), controls))
    wall = time.perf_counter() - t0

    write_wav(args.output, upmix_from_mono(out, channels), sr)

    if args.metrics_json:
        audio_s = len(out) / sr
        print(
            json.dumps(
                {
                    "audio_seconds": round(audio_s, 3),
                    "wall_seconds": round(wall, 3),
                    "rtf": round(wall / max(audio_s, 1e-9), 4),
                    "chunks": len(out) // cfg.sample_frame_size,
                }
            ),
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
