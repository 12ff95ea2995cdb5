"""The jitted per-chunk conversion step and offline conversion driver.

This is the TPU-native fusion of the reference's entire hot path — one XLA
executable per chunk instead of three ONNX sessions + Rust DSP + two pipe
crossings (SURVEY §3.3):

    48k ring slide             lib.rs:662-665
    → 16k resample + ring      lib.rs:669-683
    → ContentVec + 2× upsample rvc.rs:151, 99-109
    → RMVPE mel→salience→f0    rmvpe.rs:250-261
    → pitch cache slide/slice  rvc.rs:164-182
    → (retrieval blend)        rvc.rs:159 "TODO: index search" — implemented
    → synthesizer              rvc.rs:193-215
    → upsample to device rate  lib.rs:742-756
    → RMS envelope mix         lib.rs:758-765
    → SOLA align + crossfade   lib.rs:768-791

Everything is static-shape; live controls (pitch shift, mix rates, speaker)
are traced scalars so changing them never recompiles (reference tier-1
settings, SURVEY §5 config).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from obs_rvc_tpu.config import ChunkConfig, RMVPE_HOP, ZC_16K, RvcModelVersion
from obs_rvc_tpu.dsp import (
    MelSpectrogram,
    decode_f0,
    envelope_mixing,
    get_f0_post,
    median_filter_f0,
    resample_poly,
    sola_crossfade,
    sola_offset,
)
from obs_rvc_tpu.dsp.f0 import apply_pitch_shift
from obs_rvc_tpu.dsp.window import fade_windows
from obs_rvc_tpu.models import (
    ContentVec,
    ContentVecConfig,
    RMVPE,
    RMVPEConfig,
    Synthesizer,
    SynthesizerConfig,
)
from obs_rvc_tpu.models.crepe import Crepe, CrepeConfig, extract_crepe_frames
from obs_rvc_tpu.models.fcpe import Fcpe, FcpeConfig, decode_f0_fcpe
from obs_rvc_tpu.models.contentvec import extract_feature, feature_frames
from obs_rvc_tpu.stream.state import StreamState


def slide_pitch_cache(
    cache: jnp.ndarray,
    f0: jnp.ndarray,
    shift: int,
) -> jnp.ndarray:
    """Slide the 1024-entry f0 cache left by ``shift`` frames and write the
    new chunk's pitch track ``f0[3 : len-1]`` at offset ``1024 + 4 - len``
    (``rvc/src/rvc.rs:164-182``; the left-shift keeps ``copy_within``
    semantics — the vacated tail holds stale values until overwritten)."""
    pitch_len = f0.shape[0]
    cache = jnp.concatenate([cache[shift:], cache[-shift:]])
    cache_start = cache.shape[0] + 4 - pitch_len
    return cache.at[cache_start:].set(f0[3 : pitch_len - 1])


@struct.dataclass
class StepControls:
    """Live (tier-1) per-chunk controls — traced, never recompile
    (reference hot-reload semantics, ``obs-rvc/src/lib.rs:440-462``)."""

    pitch_shift: jnp.ndarray      # semitones, float
    rms_mix_rate: jnp.ndarray     # 0..1 (1 = no envelope mixing)
    index_rate: jnp.ndarray       # 0..1 retrieval blend
    sid: jnp.ndarray              # int32 speaker id

    @staticmethod
    def default(
        pitch_shift: float = 0.0,
        rms_mix_rate: float = 1.0,
        index_rate: float = 0.0,
        sid: int = 0,
    ) -> "StepControls":
        return StepControls(
            pitch_shift=jnp.float32(pitch_shift),
            rms_mix_rate=jnp.float32(rms_mix_rate),
            index_rate=jnp.float32(index_rate),
            sid=jnp.int32(sid),
        )


class RvcPipeline:
    """Bundles model definitions + chunk geometry into jitted step functions.

    The equivalent of the reference's engine+filter pair, minus all mutable
    machinery. Parameters are a plain pytree dict
    ``{"contentvec": ..., "rmvpe": ..., "synthesizer": ...}`` so they can be
    sharded with ``jax.device_put`` / NamedSharding.
    """

    def __init__(
        self,
        cfg: ChunkConfig,
        version: RvcModelVersion = RvcModelVersion.V2,
        f0_median_radius: int = 0,
        retrieval_index: Optional[Any] = None,
        compute_dtype: jnp.dtype = jnp.float32,
        keyshift: int = 0,
        phase_vocoder: bool = False,
        contentvec_cfg: Optional[ContentVecConfig] = None,
        rmvpe_cfg: Optional[RMVPEConfig] = None,
        synth_cfg: Optional[SynthesizerConfig] = None,
        pitch_algorithm: str = "rmvpe",
        crepe_cfg: Optional[CrepeConfig] = None,
        fcpe_cfg: Optional[FcpeConfig] = None,
        pallas_resblocks: Optional[bool] = None,
    ):
        self.cfg = cfg
        self.version = version
        self.f0_median_radius = f0_median_radius
        self.retrieval_index = retrieval_index
        #: static mel analysis keyshift in semitones — the "resonance shift"
        #: setting routed into the reference's dormant keyshift path
        #: (rmvpe.rs:170-201; plumbed-but-unused per SURVEY §2.2)
        self.keyshift = keyshift
        #: phase-corrected SOLA crossfade (the reference's lib.rs:778 TODO)
        self.phase_vocoder = phase_vocoder
        #: "rmvpe" (reference parity) or "crepe"/"fcpe" (upstream-RVC
        #: extras; the Rust reference has RMVPE only). All three share the
        #: hop-160 pitch-cache geometry; rmvpe/crepe decode on the same
        #: 360-bin/20-cent grid, fcpe on its own linspace grid
        #: (models/fcpe.py decode).
        if pitch_algorithm not in ("rmvpe", "crepe", "fcpe"):
            raise ValueError(f"unknown pitch_algorithm {pitch_algorithm!r}")
        if pitch_algorithm != "rmvpe" and keyshift:
            raise ValueError("resonance shift (mel keyshift) requires pitch_algorithm='rmvpe'")
        self.pitch_algorithm = pitch_algorithm

        if contentvec_cfg is None:
            contentvec_cfg = (
                ContentVecConfig.v1() if version is RvcModelVersion.V1 else ContentVecConfig.v2()
            )
        self.contentvec_cfg = dataclasses.replace(contentvec_cfg, dtype=compute_dtype)
        if pallas_resblocks is None:
            # fused Pallas kernels on real TPU backends only — on CPU they
            # would run in slow interpret mode (tests opt in explicitly).
            # bf16 compute only: the f32 variants blow Mosaic's 16 MB
            # scoped-VMEM budget (measured: tapdot C=64 f32 wants 21.9 MB —
            # every block/scratch doubles vs the bf16 layouts all kernel
            # crossovers were measured at)
            pallas_resblocks = (
                jax.default_backend() not in ("cpu",)
                and compute_dtype == jnp.bfloat16
            )
        # one switch gates every Mosaic kernel (synth resblock bank + RMVPE
        # U-Net chain) — it doubles as the remote-compile-hang escape hatch
        # (--no-pallas-resblocks)
        self.rmvpe_cfg = dataclasses.replace(
            rmvpe_cfg if rmvpe_cfg is not None else RMVPEConfig(),
            dtype=compute_dtype, pallas_unet=pallas_resblocks,
        )
        if synth_cfg is None:
            synth_cfg = SynthesizerConfig.for_sample_rate(
                cfg.model_sample_rate if not cfg.skip_inference else 40000,
                feature_dim=contentvec_cfg.out_dim,
            )
        self.synth_cfg = dataclasses.replace(
            synth_cfg, dtype=compute_dtype, pallas_resblocks=pallas_resblocks
        )

        self.contentvec = ContentVec(self.contentvec_cfg)
        self.rmvpe = RMVPE(self.rmvpe_cfg)
        self.crepe_cfg = dataclasses.replace(
            crepe_cfg if crepe_cfg is not None else CrepeConfig(), dtype=compute_dtype
        )
        self.crepe = Crepe(self.crepe_cfg)
        self.fcpe_cfg = dataclasses.replace(
            fcpe_cfg if fcpe_cfg is not None else FcpeConfig(), dtype=compute_dtype
        )
        self.fcpe = Fcpe(self.fcpe_cfg)
        self.synthesizer = Synthesizer(self.synth_cfg)
        self.mel = MelSpectrogram()
        if pitch_algorithm == "fcpe":
            # torchfcpe's Wav2Mel: librosa-default (Slaney) mel scale,
            # fmin 0 — vs RMVPE's HTK / fmin 30 (models/fcpe.py module doc)
            self.fcpe_mel = MelSpectrogram(f_min=0.0, htk=False)

        self._fade_in, self._fade_out = fade_windows(cfg.sola_buffer_frame_size)

        # hubert_length as the reference computes it (rvc.rs:153):
        # min(16k samples / 160, feature frames after 2x upsample)
        t50 = feature_frames(cfg.input_buffer_16k_size)
        self.feature_frames_100hz = 2 * t50 + 1
        self.hubert_length = min(
            cfg.input_buffer_16k_size // ZC_16K, self.feature_frames_100hz
        )
        cfg.validate()
        assert cfg.skip_head + cfg.return_length <= self.feature_frames_100hz

    def fingerprint(self) -> str:
        """Deterministic identity of every constructor input that shapes the
        traced program — the ``semantic_key`` base for
        :func:`obs_rvc_tpu.utils.exec_cache.cached_compile`. Callers append a
        call-site label (``"|jit_step"``, ``"|pool_fused"``, …) because the
        jit wrapper (donation, vmap axes) is part of the executable's
        identity but not of this fingerprint. Traced *code* changes are
        covered separately by ``traced_source_fingerprint()``."""
        r = self.retrieval_index
        retrieval = (
            "none"
            if r is None
            else f"k={r.k},mode={r.mode},probes={r.probes},nprobe={r.nprobe},"
            f"lcap={r.lcap},mesh={None if r.mesh is None else r.mesh.shape}"
        )
        return "|".join(
            [
                repr(self.cfg),
                str(self.version),
                f"median={self.f0_median_radius}",
                f"retrieval={retrieval}",
                f"keyshift={self.keyshift}",
                f"pvoc={self.phase_vocoder}",
                f"pitch={self.pitch_algorithm}",
                repr(self.contentvec_cfg),
                repr(self.rmvpe_cfg),
                repr(self.synth_cfg),
                repr(self.crepe_cfg),
                repr(self.fcpe_cfg),
            ]
        )

    # ------------------------------------------------------------------
    # parameter initialization
    # ------------------------------------------------------------------

    def init_params(self, rng: jax.Array) -> dict:
        """Random-init parameter pytree (tests / benchmarking; real use loads
        converted checkpoints via obs_rvc_tpu.models.weights)."""
        cfg = self.cfg
        r1, r2, r3 = jax.random.split(rng, 3)
        wav16 = jnp.zeros((1, cfg.input_buffer_16k_size))
        T = cfg.return_length
        phone = jnp.zeros((1, T, self.synth_cfg.feature_dim))
        pitch = jnp.ones((1, T), jnp.int32)
        pitchf = jnp.zeros((1, T))
        sid = jnp.zeros((1,), jnp.int32)
        out = {
            "contentvec": self.contentvec.init(r1, wav16),
            "synthesizer": self.synthesizer.init(r3, phone, pitch, pitchf, sid),
        }
        if self.pitch_algorithm == "crepe":
            frames = jnp.zeros((cfg.rmvpe_n_frames, 1024))
            out["crepe"] = self.crepe.init(r2, frames)
        elif self.pitch_algorithm == "fcpe":
            mel_t = jnp.zeros((cfg.rmvpe_n_frames, 128))
            out["fcpe"] = self.fcpe.init(r2, mel_t)
        else:
            mel = jnp.zeros((1, 128, cfg.rmvpe_n_frames))
            out["rmvpe"] = self.rmvpe.init(r2, mel)
        return out

    def init_params_fast(self, seed: int = 0) -> dict:
        """Compile-free random init: shapes via ``jax.eval_shape`` (pure
        tracing), values from host numpy. Use on TPU where each ``init``
        would otherwise trigger a device compile just to draw random
        weights (benchmarks, smoke tests; checkpoints for real use)."""
        import numpy as np

        cfg = self.cfg
        wav16 = jnp.zeros((1, cfg.input_buffer_16k_size))
        mel = jnp.zeros((1, 128, cfg.rmvpe_n_frames))
        T = cfg.return_length
        phone = jnp.zeros((1, T, self.synth_cfg.feature_dim))
        pitch = jnp.ones((1, T), jnp.int32)
        pitchf = jnp.zeros((1, T))
        sid = jnp.zeros((1,), jnp.int32)

        rng = jax.random.PRNGKey(0)
        shapes = {
            "contentvec": jax.eval_shape(self.contentvec.init, rng, wav16),
            "synthesizer": jax.eval_shape(
                self.synthesizer.init, rng, phone, pitch, pitchf, sid
            ),
        }
        if self.pitch_algorithm == "crepe":
            frames = jnp.zeros((cfg.rmvpe_n_frames, 1024))
            shapes["crepe"] = jax.eval_shape(self.crepe.init, rng, frames)
        elif self.pitch_algorithm == "fcpe":
            mel_t = jnp.zeros((cfg.rmvpe_n_frames, 128))
            shapes["fcpe"] = jax.eval_shape(self.fcpe.init, rng, mel_t)
        else:
            shapes["rmvpe"] = jax.eval_shape(self.rmvpe.init, rng, mel)
        host = np.random.default_rng(seed)

        def fill(leaf_path, s):
            name = jax.tree_util.keystr(leaf_path)
            if "scale" in name or ("batch_stats" in name and "var" in name):
                return np.ones(s.shape, s.dtype)
            if "bias" in name or ("batch_stats" in name and "mean" in name):
                return np.zeros(s.shape, s.dtype)
            return (host.standard_normal(s.shape) * 0.02).astype(s.dtype)

        return jax.tree_util.tree_map_with_path(fill, shapes)

    # ------------------------------------------------------------------
    # the per-chunk step (single stream; vmap for batches)
    # ------------------------------------------------------------------

    def step(
        self,
        params: dict,
        state: StreamState,
        chunk: jnp.ndarray,            # [sample_frame_size] device rate mono
        controls: StepControls,
        rnd: Optional[jnp.ndarray] = None,  # [T, 192] prior noise (None → zeros)
    ) -> tuple[StreamState, jnp.ndarray]:
        cfg = self.cfg

        # --- ring buffer slides (lib.rs:662-683) ---
        buf = jnp.concatenate([state.input_buffer[cfg.sample_frame_size :], chunk])

        window = buf[-cfg.downsample_window :]
        res16 = resample_poly(window, cfg.sample_rate, 16000)
        keep = cfg.downsample_keep_16k
        buf16 = jnp.concatenate(
            [
                state.input_buffer_16k[cfg.sample_frame_16k_size : cfg.input_buffer_16k_size - (keep - cfg.sample_frame_16k_size)],
                res16[-keep:],
            ]
        )

        if cfg.skip_inference:
            # passthrough (lib.rs:697-699): emit the 16 kHz buffer tail; the
            # engine (and its pitch cache) is not touched in this mode
            model_out = buf16[-cfg.model_return_size :]
            new_cache = state.cache_pitchf
        else:
            model_out, new_cache = self._infer(params, state, buf16, controls, rnd)

        # --- upsample model output to device rate (lib.rs:742-756) ---
        out = resample_poly(model_out, cfg.model_sample_rate, cfg.sample_rate)

        # --- RMS envelope mixing (lib.rs:758-765) ---
        out = envelope_mixing(
            buf[cfg.extra_frame_size :], out, cfg.sample_rate, controls.rms_mix_rate
        )

        # --- SOLA (lib.rs:768-791) ---
        offset = sola_offset(
            out, state.sola_buffer, cfg.sola_buffer_frame_size, cfg.sola_search_frame_size
        )
        emitted, new_sola = sola_crossfade(
            out, state.sola_buffer, offset, self._fade_in, self._fade_out,
            cfg.sample_frame_size, phase_vocoder=self.phase_vocoder,
        )

        new_state = StreamState(
            input_buffer=buf,
            input_buffer_16k=buf16,
            sola_buffer=new_sola,
            cache_pitchf=new_cache,
        )
        return new_state, emitted

    # --- neural stages -------------------------------------------------

    def _infer(
        self,
        params: dict,
        state: StreamState,
        buf16: jnp.ndarray,
        controls: StepControls,
        rnd: Optional[jnp.ndarray],
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg

        # ContentVec features at 100 Hz (rvc.rs:151,99-109)
        feats50 = self.contentvec.apply(params["contentvec"], buf16[None, :])
        feats = extract_feature(feats50)  # [1, 2T+1, C]
        phone = jax.lax.dynamic_slice_in_dim(feats, cfg.skip_head, cfg.return_length, axis=1)

        # retrieval blend — the reference's TODO (rvc.rs:159), done here
        if self.retrieval_index is not None:
            phone = self.retrieval_index.blend(params.get("index"), phone, controls.index_rate)

        # RMVPE pitch (rmvpe.rs:250-261) + cache (rvc.rs:164-182)
        new_cache, pitch, pitchf = self._pitch_cache_update(
            state.cache_pitchf, buf16, controls, params
        )

        audio = self.synthesizer.apply(
            params["synthesizer"],
            phone,
            pitch[None, :],
            pitchf[None, :],
            controls.sid[None],
            rnd[None] if rnd is not None else None,
        )
        return audio[0], new_cache

    def _pitch_frontend(self, buf16: jnp.ndarray) -> jnp.ndarray:
        """Cropped pitch window → per-algorithm network input: log-mel
        ``[128, T]`` (RMVPE, rmvpe.rs:256-260) or normalized 1024-sample
        frames ``[T, 1024]`` (CREPE) on the same hop-160 frame grid."""
        cfg = self.cfg
        rm_in = buf16[-cfg.rmvpe_frame_16k :]
        if self.pitch_algorithm == "crepe":
            return extract_crepe_frames(rm_in, cfg.rmvpe_n_frames)
        if self.pitch_algorithm == "fcpe":
            return self.fcpe_mel(rm_in).T  # [T, 128], Slaney-scale mel
        return self.mel(rm_in, keyshift=self.keyshift)

    def _pitch_net(self, params: dict, feat: jnp.ndarray) -> jnp.ndarray:
        """Network input → salience ``[T, 360]``."""
        if self.pitch_algorithm == "crepe":
            return self.crepe.apply(params["crepe"], feat)
        if self.pitch_algorithm == "fcpe":
            return self.fcpe.apply(params["fcpe"], feat)
        return self.rmvpe.apply(params["rmvpe"], feat[None])[0]

    def _decode_salience(self, salience: jnp.ndarray) -> jnp.ndarray:
        """Salience → f0 Hz, per-algorithm decode (grids differ; see
        models/fcpe.py vs dsp/f0.py)."""
        if self.pitch_algorithm == "fcpe":
            return decode_f0_fcpe(salience, threshold=0.05)
        return decode_f0(salience, threshold=0.03)

    def _pitch_cache_update(
        self,
        cache: jnp.ndarray,
        buf16: jnp.ndarray,
        controls: StepControls,
        params: dict,
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        cfg = self.cfg
        # frontend → salience → f0 for the cropped pitch window
        salience = self._pitch_net(params, self._pitch_frontend(buf16))
        f0 = self._decode_salience(salience)
        f0 = apply_pitch_shift(f0, controls.pitch_shift)
        if self.f0_median_radius >= 3:
            f0 = median_filter_f0(f0, self.f0_median_radius)

        # sliding cache (rvc.rs:164-182)
        shift = cfg.sample_frame_16k_size // RMVPE_HOP
        cache = slide_pitch_cache(cache, f0, shift)

        start = cfg.pitch_cache_len - self.hubert_length + cfg.skip_head
        pitchf = jax.lax.dynamic_slice_in_dim(cache, start, cfg.return_length)
        pitch, pitchf = get_f0_post(pitchf)
        return cache, pitch, pitchf

    # ------------------------------------------------------------------
    # staged execution (per-stage jits)
    # ------------------------------------------------------------------
    #
    # Semantically identical to ``step`` but compiled as seven small XLA
    # programs instead of one monolith. Per-dispatch overhead on-chip is
    # <0.5 ms, so the runtime cost is a few ms at most, while compile time
    # drops ~13× (observed: ~35 s total vs ~8 min fused — and the remote
    # compile service has been seen hanging on the monolith). Also yields
    # per-stage timing for the metrics the reference printed per session
    # (rvc.rs:217 "hubert/pitch/inference").

    def _stage_pre(self, state_in16: jnp.ndarray, state_buf: jnp.ndarray, chunk: jnp.ndarray):
        cfg = self.cfg
        buf = jnp.concatenate([state_buf[cfg.sample_frame_size :], chunk])
        window = buf[-cfg.downsample_window :]
        res16 = resample_poly(window, cfg.sample_rate, 16000)
        keep = cfg.downsample_keep_16k
        buf16 = jnp.concatenate(
            [
                state_in16[
                    cfg.sample_frame_16k_size : cfg.input_buffer_16k_size
                    - (keep - cfg.sample_frame_16k_size)
                ],
                res16[-keep:],
            ]
        )
        return buf, buf16

    def _stage_features(self, params, buf16, index_rate):
        cfg = self.cfg
        feats50 = self.contentvec.apply(params["contentvec"], buf16[None, :])
        feats = extract_feature(feats50)
        phone = jax.lax.dynamic_slice_in_dim(feats, cfg.skip_head, cfg.return_length, axis=1)
        if self.retrieval_index is not None:
            phone = self.retrieval_index.blend(params.get("index"), phone, index_rate)
        return phone

    def _stage_synth(self, params, phone, pitch, pitchf, sid, rnd):
        audio = self.synthesizer.apply(
            params["synthesizer"], phone, pitch[None, :], pitchf[None, :], sid[None],
            rnd[None] if rnd is not None else None,
        )
        return audio[0]

    def _stage_post(self, buf, model_out, sola_buffer, rms_mix_rate):
        cfg = self.cfg
        out = resample_poly(model_out, cfg.model_sample_rate, cfg.sample_rate)
        out = envelope_mixing(buf[cfg.extra_frame_size :], out, cfg.sample_rate, rms_mix_rate)
        offset = sola_offset(
            out, sola_buffer, cfg.sola_buffer_frame_size, cfg.sola_search_frame_size
        )
        return sola_crossfade(
            out, sola_buffer, offset, self._fade_in, self._fade_out,
            cfg.sample_frame_size, phase_vocoder=self.phase_vocoder,
        )

    @functools.cached_property
    def _staged_jits(self):
        return self._make_staged_jits(batched=False)

    @functools.cached_property
    def _staged_jits_donated(self):
        """Single-stream stage jits with state buffers donated (old ring /
        cache / SOLA buffers alias the new ones in-place). Only safe when the
        caller discards the pre-step state afterwards — the StreamSession
        does; the pool does NOT (its masked merge reads the old state)."""
        return self._make_staged_jits(batched=False, donate=True)

    @functools.cached_property
    def _staged_jits_batch(self):
        return self._make_staged_jits(batched=True)

    def _stage_mel(self, buf16):
        # "mel" historically; under pitch_algorithm="crepe" this is the
        # normalized-frames frontend instead (same stage slot/axes)
        return self._pitch_frontend(buf16)

    def _stage_salience(self, params, feat):
        return self._pitch_net(params, feat)

    def _stage_pitch_post(self, cache, salience, controls):
        cfg = self.cfg
        f0 = self._decode_salience(salience)
        f0 = apply_pitch_shift(f0, controls.pitch_shift)
        if self.f0_median_radius >= 3:
            f0 = median_filter_f0(f0, self.f0_median_radius)
        cache = slide_pitch_cache(cache, f0, cfg.sample_frame_16k_size // RMVPE_HOP)
        start = cfg.pitch_cache_len - self.hubert_length + cfg.skip_head
        pitchf = jax.lax.dynamic_slice_in_dim(cache, start, cfg.return_length)
        pitch, pitchf = get_f0_post(pitchf)
        return cache, pitch, pitchf

    def _make_staged_jits(self, batched: bool, donate: bool = False):
        stages = {
            "pre": self._stage_pre,
            "features": self._stage_features,
            "mel": self._stage_mel,
            "salience": self._stage_salience,
            "pitch_post": self._stage_pitch_post,
            "synth": self._stage_synth,
            "post": self._stage_post,
        }
        if batched:
            axes = {
                "pre": (0, 0, 0),
                "features": (None, 0, 0),
                "mel": (0,),
                "salience": (None, 0),
                "pitch_post": (0, 0, 0),
                "synth": (None, 0, 0, 0, 0, None),
                "post": (0, 0, 0, 0),
            }
            stages = {k: jax.vmap(f, in_axes=axes[k]) for k, f in stages.items()}
        # donation map: only buffers that die with the pre-step state —
        # pre's old rings (→ new rings), pitch_post's old cache (→ new
        # cache), post's model_out + old sola tail (→ emitted + new tail).
        # ``buf``/``buf16`` are NOT donatable in post/features/mel: they live
        # on as the new state's ring buffers.
        donate_argnums = {
            "pre": (0, 1), "pitch_post": (0,), "post": (1, 2),
        } if donate else {}
        return {
            k: jax.jit(f, donate_argnums=donate_argnums.get(k, ()))
            for k, f in stages.items()
        }

    def staged_step(
        self,
        params: dict,
        state: StreamState,
        chunk: jnp.ndarray,
        controls: StepControls,
        rnd: Optional[jnp.ndarray] = None,
        batched: bool = False,
        stage_times: Optional[dict] = None,
        donate: bool = False,
    ) -> tuple[StreamState, jnp.ndarray]:
        """Same contract as :meth:`step` (or the vmapped batch step when
        ``batched``), host-orchestrated across the seven stage executables.

        ``stage_times``: pass a dict to collect per-stage wall ms into it
        (each stage is then synchronized with ``block_until_ready`` — use for
        diagnostics, not peak throughput; async dispatch pipelining is lost).

        ``donate``: donate the pre-step state's buffers into the new state
        (single-stream only). The caller must discard ``state`` afterwards.
        """
        cfg = self.cfg
        if batched:
            j = self._staged_jits_batch
        else:
            j = self._staged_jits_donated if donate else self._staged_jits
        if stage_times is not None:
            import time as _time

            raw = j

            class _Timed:
                def __getitem__(_self, name):
                    fn = raw[name]

                    def run(*args):
                        t0 = _time.perf_counter()
                        out = jax.block_until_ready(fn(*args))
                        stage_times[name] = (_time.perf_counter() - t0) * 1000.0
                        return out

                    return run

            j = _Timed()
        buf, buf16 = j["pre"](state.input_buffer_16k, state.input_buffer, chunk)
        if cfg.skip_inference:
            model_out = buf16[..., -cfg.model_return_size :]
            new_cache = state.cache_pitchf
        else:
            phone = j["features"](params, buf16, controls.index_rate)
            mel = j["mel"](buf16)
            salience = j["salience"](params, mel)
            new_cache, pitch, pitchf = j["pitch_post"](
                state.cache_pitchf, salience, controls
            )
            model_out = j["synth"](params, phone, pitch, pitchf, controls.sid, rnd)
        emitted, new_sola = j["post"](buf, model_out, state.sola_buffer, controls.rms_mix_rate)
        return (
            StreamState(
                input_buffer=buf,
                input_buffer_16k=buf16,
                sola_buffer=new_sola,
                cache_pitchf=new_cache,
            ),
            emitted,
        )

    # ------------------------------------------------------------------
    # jitted entry points
    # ------------------------------------------------------------------

    @functools.cached_property
    def jit_step(self):
        """Single-stream jitted step with donated state."""
        return jax.jit(self.step, donate_argnums=(1,))

    @functools.cached_property
    def jit_step_batch(self):
        """Batched (DP) jitted step: state/chunk/controls carry a leading
        stream axis, params are broadcast."""
        vstep = jax.vmap(self.step, in_axes=(None, 0, 0, 0), out_axes=0)
        return jax.jit(vstep, donate_argnums=(1,))

    # ------------------------------------------------------------------
    # offline conversion (BASELINE config 1: single-utterance convert)
    # ------------------------------------------------------------------

    def convert_offline(
        self,
        params: dict,
        wav: jnp.ndarray,
        controls: Optional[StepControls] = None,
    ) -> jnp.ndarray:
        """Convert a whole utterance by streaming it chunk-by-chunk; returns
        device-rate audio of the same length (rounded down to whole chunks)."""
        cfg = self.cfg
        if controls is None:
            controls = StepControls.default()
        n_chunks = wav.shape[0] // cfg.sample_frame_size
        state = StreamState.init(cfg)
        outs = []
        for i in range(n_chunks):
            chunk = jax.lax.dynamic_slice_in_dim(
                wav, i * cfg.sample_frame_size, cfg.sample_frame_size
            )
            state, out = self.jit_step(params, state, chunk, controls)
            outs.append(out)
        return jnp.concatenate(outs) if outs else jnp.zeros((0,), jnp.float32)

    @functools.cached_property
    def jit_convert_scan(self):
        """Whole-utterance conversion as ONE executable: the chunk loop is a
        ``lax.scan`` over the step, so offline conversion costs a single
        dispatch regardless of clip length. Input ``[n_chunks,
        sample_frame_size]`` (host pre-chunked), output flattened audio."""

        def convert(params, wav_chunks, controls):
            state = jax.tree.map(jnp.asarray, StreamState.init(self.cfg))

            def body(state, chunk):
                return self.step(params, state, chunk, controls)

            _, outs = jax.lax.scan(body, state, wav_chunks)
            return outs.reshape(-1)

        return jax.jit(convert)
