"""Three-tier hot-reload classification (reference update(), lib.rs:428-589)."""

import dataclasses

from obs_rvc_tpu.config import ReloadTier, RvcModelVersion, StreamSettings, diff_settings


def test_no_change():
    s = StreamSettings()
    assert diff_settings(s, s) is ReloadTier.NONE


def test_live_changes():
    s = StreamSettings()
    assert diff_settings(s, dataclasses.replace(s, pitch_shift=5)) is ReloadTier.LIVE
    assert diff_settings(s, dataclasses.replace(s, index_rate=0.5)) is ReloadTier.LIVE
    assert diff_settings(s, dataclasses.replace(s, rms_mix_rate=0.1)) is ReloadTier.LIVE


def test_geometry_changes():
    s = StreamSettings()
    for kw in (
        {"sample_length": 0.2},
        {"fade_length": 0.05},
        {"extra_inference_time": 1.0},
        {"dest_sample_rate": 48000},
        {"skip_inference": True},
        {"resonance_shift": 2.0},
    ):
        assert diff_settings(s, dataclasses.replace(s, **kw)) is ReloadTier.GEOMETRY, kw


def test_model_changes_dominate():
    s = StreamSettings()
    new = dataclasses.replace(
        s, model_path="/x.pth", sample_length=0.2, pitch_shift=3
    )
    assert diff_settings(s, new) is ReloadTier.MODEL
    assert (
        diff_settings(s, dataclasses.replace(s, model_version=RvcModelVersion.V1))
        is ReloadTier.MODEL
    )


def test_live_plus_geometry_is_geometry():
    s = StreamSettings()
    new = dataclasses.replace(s, pitch_shift=3, fade_length=0.03)
    assert diff_settings(s, new) is ReloadTier.GEOMETRY
