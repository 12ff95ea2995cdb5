"""Static stream geometry and user-facing settings.

This module is the TPU-native replacement for the reference's settings store +
frame-size math. The reference recomputes every buffer size inside the OBS
filter (``/root/reference/obs-rvc/src/lib.rs:200-227`` at create,
``lib.rs:513-584`` on update). Here the same algebra lives in one frozen,
hashable dataclass (:class:`ChunkConfig`) so it can be a static argument to
``jax.jit`` — changing geometry produces a *new* config (and a new compiled
executable) instead of mutating buffers under a mutex.

Settings follow the reference's three-tier hot-reload semantics
(``obs-rvc/src/lib.rs:428-589``):

- **live**     pitch_shift / index_rate / rms_mix_rate / resonance? — plain
               traced scalars, picked up next chunk, no recompile.
- **geometry** sample_length / fade_length / extra_inference_time /
               dest_sample_rate / skip_inference — derive a new
               :class:`ChunkConfig` → re-jit (compile-cached).
- **model**    model path / version / pitch algorithm — reload weights.
"""

from __future__ import annotations

import dataclasses
import enum
import math
from typing import Optional


class RvcModelVersion(enum.Enum):
    """RVC model generation (reference ``rvc-common/src/enums.rs:3-23``)."""

    V1 = 1
    V2 = 2

    @property
    def text_encoder_in_channels(self) -> int:
        """Feature dim fed to the synthesizer (``enums.rs:10-15``)."""
        return 256 if self is RvcModelVersion.V1 else 768

    @property
    def output_layers(self) -> int:
        """ContentVec transformer layer tapped for features (``enums.rs:17-22``)."""
        return 9 if self is RvcModelVersion.V1 else 12

    @classmethod
    def from_str(cls, s: str) -> "RvcModelVersion":
        return {"v1": cls.V1, "v2": cls.V2}.get(s.lower(), cls.V2)

    def __str__(self) -> str:
        return "v1" if self is RvcModelVersion.V1 else "v2"


class PitchAlgorithm(enum.Enum):
    """Pitch extraction algorithm. The reference enum has RMVPE only
    (``rvc-common/src/enums.rs:26-28``; its int/string conversions map every
    unknown value to RMVPE — preserved here so reference wire values decode
    identically). CREPE/FCPE are beyond-reference additions
    (``models/crepe.py`` / ``models/fcpe.py``)."""

    RMVPE = 1
    CREPE = 2
    FCPE = 3

    @classmethod
    def from_str(cls, s: str) -> "PitchAlgorithm":
        return {"crepe": cls.CREPE, "fcpe": cls.FCPE}.get(s.lower(), cls.RMVPE)

    @classmethod
    def from_int(cls, i: int) -> "PitchAlgorithm":
        try:
            return cls(i)
        except ValueError:
            return cls.RMVPE

    def __str__(self) -> str:
        return self.name.lower()


#: 16 kHz model-side samples per 10 ms block (the reference hard-codes 160
#: throughout, e.g. ``obs-rvc/src/lib.rs:205,217``).
ZC_16K = 160

#: RMVPE analysis hop at 16 kHz (``rvc/src/f0/rmvpe.rs:220``).
RMVPE_HOP = 160


@dataclasses.dataclass(frozen=True)
class StreamSettings:
    """User-facing knobs — mirrors the reference's 13 OBS settings
    (``obs-rvc/src/lib.rs:77-89``, defaults ``lib.rs:174-185``) plus ranges
    from the properties panel (``lib.rs:324-425``)."""

    model_path: Optional[str] = None
    index_path: Optional[str] = None
    model_version: RvcModelVersion = RvcModelVersion.V2
    pitch_algorithm: PitchAlgorithm = PitchAlgorithm.RMVPE
    #: synthesizer output sample rate, 16000..=48000 (``lib.rs:347-353``).
    dest_sample_rate: int = 40000
    #: semitones, -24..=24 (``lib.rs:360-367``).
    pitch_shift: int = 12
    #: formant/resonance shift in semitones, -5..=5. Plumbed-but-unused in the
    #: reference (``lib.rs:80,446-450``; SURVEY §2.2) — wired here through the
    #: mel keyshift path (``rvc/src/f0/rmvpe.rs:170-201``).
    resonance_shift: float = 0.0
    #: retrieval blend 0..=1 (reference TODO, ``rvc/src/rvc.rs:159``).
    index_rate: float = 0.0
    #: loudness factor / RMS mix rate 0..=1 (``lib.rs:385-391``).
    rms_mix_rate: float = 0.5
    #: chunk length in seconds, 0.01..=1.5 (``lib.rs:393-399``).
    sample_length: float = 0.30
    #: crossfade length in seconds, 0.01..=0.15 (``lib.rs:401-407``).
    fade_length: float = 0.07
    #: left context given to the models, seconds, 0..=5 (``lib.rs:409-415``).
    extra_inference_time: float = 2.00
    #: bypass the neural stages (``lib.rs:89,185,224-227,697-699``).
    skip_inference: bool = False

    def chunk_config(self, sample_rate: int = 48000) -> "ChunkConfig":
        return ChunkConfig.build(
            sample_rate=sample_rate,
            model_sample_rate=self.dest_sample_rate,
            sample_length=self.sample_length,
            fade_length=self.fade_length,
            extra_inference_time=self.extra_inference_time,
            skip_inference=self.skip_inference,
            feature_dim=self.model_version.text_encoder_in_channels,
        )


@dataclasses.dataclass(frozen=True)
class ChunkConfig:
    """All static sizes of the streaming pipeline, in device-rate samples
    unless suffixed otherwise.

    Derived exactly as the reference does at
    ``obs-rvc/src/lib.rs:200-227`` / ``lib.rs:522-578``:

    .. code-block:: text

        zc                 = sample_rate / 100                  (10 ms)
        sample_frame_size  = round(sample_length*sr/zc) * zc
        crossfade_frame    = round(fade_length*sr/zc)   * zc
        sola_buffer_frame  = min(crossfade_frame, 4*zc)
        sola_search_frame  = zc
        extra_frame        = round(extra_time*sr/zc)    * zc
        input_buffer       = extra + crossfade + search + sample
        model_return_length= (sample + sola_buffer + search) / zc
        model_return_size  = model_return_length * model_sr/100
    """

    sample_rate: int
    model_sample_rate: int
    feature_dim: int
    skip_inference: bool

    # --- derived sizes (device rate) ---
    zc: int
    sample_frame_size: int
    crossfade_frame_size: int
    sola_buffer_frame_size: int
    sola_search_frame_size: int
    extra_frame_size: int
    input_buffer_size: int
    model_return_length: int
    model_return_size: int

    # --- derived sizes (16 kHz model-input rate) ---
    sample_frame_16k_size: int
    input_buffer_16k_size: int

    @staticmethod
    def build(
        sample_rate: int = 48000,
        model_sample_rate: int = 40000,
        sample_length: float = 0.30,
        fade_length: float = 0.07,
        extra_inference_time: float = 2.00,
        skip_inference: bool = False,
        feature_dim: int = 768,
    ) -> "ChunkConfig":
        if sample_rate % 100 != 0:
            raise ValueError(f"sample_rate must be a multiple of 100, got {sample_rate}")
        zc = sample_rate // 100

        sample_frame_time = round(sample_length * sample_rate / zc)
        if sample_frame_time < 1:
            raise ValueError("sample_length too small for one 10 ms block")
        sample_frame_size = sample_frame_time * zc
        sample_frame_16k = sample_frame_time * ZC_16K

        crossfade_frame_size = round(fade_length * sample_rate / zc) * zc
        sola_buffer_frame_size = min(crossfade_frame_size, 4 * zc)
        sola_search_frame_size = zc
        extra_frame_size = round(extra_inference_time * sample_rate / zc) * zc

        input_buffer_size = (
            extra_frame_size + crossfade_frame_size + sola_search_frame_size + sample_frame_size
        )
        input_buffer_16k_size = ZC_16K * input_buffer_size // zc

        model_return_length = (
            sample_frame_size + sola_buffer_frame_size + sola_search_frame_size
        ) // zc
        model_sr = model_sample_rate
        if skip_inference:
            # passthrough emits 16 kHz buffer samples (``lib.rs:224-227``)
            model_sr = 16000
        model_return_size = model_return_length * (model_sr // 100)

        return ChunkConfig(
            sample_rate=sample_rate,
            model_sample_rate=model_sr,
            feature_dim=feature_dim,
            skip_inference=skip_inference,
            zc=zc,
            sample_frame_size=sample_frame_size,
            crossfade_frame_size=crossfade_frame_size,
            sola_buffer_frame_size=sola_buffer_frame_size,
            sola_search_frame_size=sola_search_frame_size,
            extra_frame_size=extra_frame_size,
            input_buffer_size=input_buffer_size,
            model_return_length=model_return_length,
            model_return_size=model_return_size,
            sample_frame_16k_size=sample_frame_16k,
            input_buffer_16k_size=input_buffer_16k_size,
        )

    @staticmethod
    def for_request(
        input_16k_len: int,
        sample_frame_16k_size: int,
        skip_head: int,
        return_length: int,
        model_sample_rate: int = 40000,
        feature_dim: int = 768,
        sample_rate: int = 48000,
    ) -> "ChunkConfig":
        """Geometry for one engine/RPC request, from the raw numbers the wire
        protocol carries (``rvc/src/rvc.rs:133-220``: input length,
        ``sample_frame_16k_size``, ``skip_head``, ``return_length``). The
        reference serves whatever geometry each request specifies; this
        constructor lets :class:`~obs_rvc_tpu.stream.engine.RvcEngine` do the
        same with a per-geometry compiled-executable cache. Only the
        16 kHz-side fields are meaningful — the device-rate fields are
        engine-unused (the 48 kHz resample/SOLA half lives client-side in
        this serving mode) and set to consistent placeholders."""
        if sample_frame_16k_size % ZC_16K != 0:
            raise ValueError(
                f"sample_frame_16k_size must be a multiple of {ZC_16K}, "
                f"got {sample_frame_16k_size}"
            )
        zc = sample_rate // 100
        frames_in = -(-input_16k_len // ZC_16K)  # ceil; 48k-side placeholder
        return ChunkConfig(
            sample_rate=sample_rate,
            model_sample_rate=model_sample_rate,
            feature_dim=feature_dim,
            skip_inference=False,
            zc=zc,
            sample_frame_size=(sample_frame_16k_size // ZC_16K) * zc,
            crossfade_frame_size=4 * zc,
            sola_buffer_frame_size=4 * zc,
            sola_search_frame_size=zc,
            extra_frame_size=skip_head * zc,
            input_buffer_size=frames_in * zc,
            model_return_length=return_length,
            model_return_size=return_length * (model_sample_rate // 100),
            sample_frame_16k_size=sample_frame_16k_size,
            input_buffer_16k_size=input_16k_len,
        )

    # --- quantities used by the pipeline ---

    @property
    def skip_head(self) -> int:
        """Leading 10 ms feature frames dropped from model output
        (``obs-rvc/src/lib.rs:694``)."""
        return self.extra_frame_size // self.zc

    @property
    def return_length(self) -> int:
        return self.model_return_length

    @property
    def rmvpe_frame_16k(self) -> int:
        """16 kHz samples RMVPE actually sees per chunk:
        ``5120*ceil((n16k+800)/5120) - 160`` (``rvc/src/f0/rmvpe.rs:256``)."""
        n = self.sample_frame_16k_size
        return 5120 * ((n + 800 - 1) // 5120 + 1) - RMVPE_HOP

    @property
    def rmvpe_n_frames(self) -> int:
        """RMVPE mel/pitch frames per chunk: ``1 + L // hop``. By construction
        ``L = 5120k - 160`` so this is always a multiple of 32 (the reference's
        pad-to-32 at ``rmvpe.rs:225-232`` is a no-op; we rely on it statically)."""
        return 1 + self.rmvpe_frame_16k // RMVPE_HOP

    @property
    def pitch_cache_len(self) -> int:
        """Sliding f0 cache length (``rvc/src/rvc.rs:42``)."""
        return 1024

    @property
    def downsample_window(self) -> int:
        """48k→16k resampler input window per chunk (``lib.rs:236-237,673``)."""
        return self.sample_frame_size + 2 * self.zc

    @property
    def downsample_keep_16k(self) -> int:
        """16 kHz samples written to the tail of the 16 k ring per chunk
        (``lib.rs:677-678``): ``(sample_frame/zc + 1) * 160``."""
        return (self.sample_frame_size // self.zc + 1) * ZC_16K

    @property
    def latency_seconds(self) -> float:
        """Algorithmic latency contributed by chunking (one chunk)."""
        return self.sample_frame_size / self.sample_rate

    def validate(self) -> None:
        assert self.input_buffer_size % self.zc == 0
        assert self.model_return_size % (self.model_sample_rate // 100) == 0
        assert self.sola_buffer_frame_size <= 4 * self.zc
        hubert_len = self.input_buffer_16k_size // ZC_16K
        assert self.skip_head + self.return_length <= hubert_len, (
            "model slice exceeds available feature frames; increase extra_inference_time"
        )


def gcd_ratio(sr_in: int, sr_out: int) -> tuple[int, int]:
    """Reduced (up, down) resampling ratio."""
    g = math.gcd(sr_in, sr_out)
    return sr_out // g, sr_in // g


class ReloadTier(enum.IntEnum):
    """What a settings change requires — the reference's three change
    classes in ``UpdateSource::update`` (``obs-rvc/src/lib.rs:428-589``)."""

    NONE = 0      #: identical settings
    LIVE = 1      #: traced scalars; picked up next chunk (lib.rs:440-462)
    GEOMETRY = 2  #: recalculate_input_buffer → new ChunkConfig / re-jit (lib.rs:513-584)
    MODEL = 3     #: reload_rvc → new weights / new pipeline (lib.rs:586-588)


#: settings fields by reload tier (mirrors which branch each key takes in
#: the reference's update()).
_LIVE_FIELDS = frozenset({"pitch_shift", "index_rate", "rms_mix_rate"})
_GEOMETRY_FIELDS = frozenset(
    {
        "sample_length",
        "fade_length",
        "extra_inference_time",
        "dest_sample_rate",
        "skip_inference",
        "resonance_shift",  # static mel keyshift → re-jit (wired here; unused in ref)
    }
)
_MODEL_FIELDS = frozenset({"model_path", "index_path", "model_version", "pitch_algorithm"})


def diff_settings(old: "StreamSettings", new: "StreamSettings") -> ReloadTier:
    """Classify a settings change by the most invasive tier it touches."""
    tier = ReloadTier.NONE
    for f in dataclasses.fields(StreamSettings):
        if getattr(old, f.name) == getattr(new, f.name):
            continue
        if f.name in _MODEL_FIELDS:
            return ReloadTier.MODEL
        if f.name in _GEOMETRY_FIELDS:
            tier = max(tier, ReloadTier.GEOMETRY)
        elif f.name in _LIVE_FIELDS:
            tier = max(tier, ReloadTier.LIVE)
        else:  # pragma: no cover — new fields must be classified
            raise ValueError(f"unclassified setting {f.name!r}")
    return tier
