"""Frame-size algebra parity with obs-rvc/src/lib.rs:200-227."""

import pytest

from obs_rvc_tpu.config import ChunkConfig, RvcModelVersion, StreamSettings


def test_default_geometry_matches_reference():
    # defaults: 48 kHz device rate, 40 kHz model, 0.30/0.07/2.00 s
    cfg = StreamSettings().chunk_config(48000)
    assert cfg.zc == 480
    assert cfg.sample_frame_size == 14400
    assert cfg.sample_frame_16k_size == 4800
    assert cfg.crossfade_frame_size == 3360
    assert cfg.sola_buffer_frame_size == 1920  # min(3360, 4*480)
    assert cfg.sola_search_frame_size == 480
    assert cfg.extra_frame_size == 96000
    assert cfg.input_buffer_size == 114240
    assert cfg.input_buffer_16k_size == 38080
    assert cfg.model_return_length == 35
    assert cfg.model_return_size == 14000  # 35 * 400 @ 40k
    assert cfg.skip_head == 200
    cfg.validate()


def test_rmvpe_window_sizes():
    cfg = StreamSettings().chunk_config(48000)
    # 5120*ceil((4800+800)/5120) - 160 = 10080 (rmvpe.rs:256)
    assert cfg.rmvpe_frame_16k == 10080
    assert cfg.rmvpe_n_frames == 64
    assert cfg.rmvpe_n_frames % 32 == 0  # pad-to-32 statically a no-op


def test_skip_inference_geometry():
    cfg = StreamSettings(skip_inference=True).chunk_config(48000)
    # passthrough swaps model rate to 16 kHz (lib.rs:224-227)
    assert cfg.model_sample_rate == 16000
    assert cfg.model_return_size == 35 * 160


@pytest.mark.parametrize("sr", [44100, 48000])
@pytest.mark.parametrize("sample_length", [0.01, 0.1, 0.35, 1.5])
@pytest.mark.parametrize("model_sr", [32000, 40000, 48000])
def test_geometry_consistency(sr, sample_length, model_sr):
    if sr % 100:
        pytest.skip("reference requires sr multiple of 100")
    cfg = ChunkConfig.build(
        sample_rate=sr, model_sample_rate=model_sr, sample_length=sample_length
    )
    cfg.validate()
    assert cfg.downsample_window == cfg.sample_frame_size + 2 * cfg.zc
    assert cfg.downsample_keep_16k == (cfg.sample_frame_size // cfg.zc + 1) * 160
    assert cfg.rmvpe_n_frames % 32 == 0


def test_model_versions():
    assert RvcModelVersion.V1.text_encoder_in_channels == 256
    assert RvcModelVersion.V1.output_layers == 9
    assert RvcModelVersion.V2.text_encoder_in_channels == 768
    assert RvcModelVersion.V2.output_layers == 12
    assert RvcModelVersion.from_str("v1") is RvcModelVersion.V1


def test_pitch_algorithm_enum_conversions():
    """Reference semantics preserved: unknown ints/strings decode to RMVPE
    (rvc-common/src/enums.rs:95-123); crepe/fcpe are beyond-reference
    additions with stable wire values 2/3."""
    from obs_rvc_tpu.config import PitchAlgorithm as PA

    assert PA.from_str("rmvpe") is PA.RMVPE
    assert PA.from_str("crepe") is PA.CREPE
    assert PA.from_str("FCPE") is PA.FCPE
    assert PA.from_str("harvest") is PA.RMVPE  # unknown → RMVPE, like the reference
    assert PA.from_int(1) is PA.RMVPE
    assert PA.from_int(2) is PA.CREPE
    assert PA.from_int(3) is PA.FCPE
    assert PA.from_int(99) is PA.RMVPE
    assert str(PA.CREPE) == "crepe" and str(PA.FCPE) == "fcpe"
