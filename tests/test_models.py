"""Shape/contract tests for the three JAX models.

The ONNX I/O contracts being reproduced:
- contentvec: source [1,1,L] → embed [1,T,C] (rvc/src/rvc.rs:92-96);
  fixture input_wav.npy (38240 samples) → feats.npy [1,239,768] after the
  2× upsample (rvc/src/tests/hubert.rs).
- rmvpe: input [1,128,T] → output [1,T,360] (rvc/src/f0/rmvpe.rs:235-240).
- synthesizer: phone [1,T,C], pitch [1,T] i32, pitchf [1,T] f32 → audio
  [T*sr/100] (rvc/src/rvc.rs:193-215).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from obs_rvc_tpu.models import (
    ContentVec,
    ContentVecConfig,
    RMVPE,
    RMVPEConfig,
    Synthesizer,
    SynthesizerConfig,
)
from obs_rvc_tpu.models.contentvec import extract_feature, feature_frames


def test_feature_frames_matches_fixture_geometry():
    # 38240 samples → 119 frames @50 Hz → 239 after 2× (+1) upsampling
    assert feature_frames(38240) == 119
    # default chunk: 38080 16k samples → 118 frames → 237 (= min with 238 in rvc.rs:153)
    assert feature_frames(38080) == 118


def test_contentvec_v2_shapes():
    cfg = ContentVecConfig.v2()
    model = ContentVec(cfg)
    wav = jnp.zeros((1, 3600))  # 11 frames
    params = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(params, wav)
    assert out.shape == (1, feature_frames(3600), 768)
    up = extract_feature(out)
    assert up.shape == (1, 2 * out.shape[1] + 1, 768)
    # 2x upsample semantics: up[2k] == up[2k+1] == raw[k] (index min(k//2, T-1))
    np.testing.assert_array_equal(np.asarray(up)[:, 0], np.asarray(out)[:, 0])
    np.testing.assert_array_equal(np.asarray(up)[:, 1], np.asarray(out)[:, 0])
    np.testing.assert_array_equal(np.asarray(up)[:, -1], np.asarray(out)[:, -1])


def test_contentvec_v1_shapes():
    cfg = ContentVecConfig.v1()
    model = ContentVec(cfg)
    wav = jnp.zeros((1, 3600))
    params = model.init(jax.random.PRNGKey(0), wav)
    out = model.apply(params, wav)
    assert out.shape == (1, feature_frames(3600), 256)


def test_rmvpe_shapes():
    model = RMVPE(RMVPEConfig())
    mel = jnp.zeros((1, 128, 32))
    params = model.init(jax.random.PRNGKey(0), mel)
    out = model.apply(params, mel)
    assert out.shape == (1, 32, 360)
    out_np = np.asarray(out)
    assert ((out_np >= 0) & (out_np <= 1)).all()  # sigmoid output


def test_rmvpe_batch_and_determinism():
    model = RMVPE(RMVPEConfig())
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 128, 32)), dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(1), mel)
    a = model.apply(params, mel)
    b = model.apply(params, mel)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # batch independence
    single = model.apply(params, mel[:1])
    np.testing.assert_allclose(np.asarray(a)[0], np.asarray(single)[0], atol=1e-5)


@pytest.mark.parametrize("sr,expected_upp", [(32000, 320), (40000, 400), (48000, 480)])
def test_synthesizer_geometries(sr, expected_upp):
    cfg = SynthesizerConfig.for_sample_rate(sr)
    assert cfg.upp == expected_upp


def test_synthesizer_forward():
    cfg = SynthesizerConfig.for_sample_rate(40000)
    model = Synthesizer(cfg)
    T = 35
    rng = jax.random.PRNGKey(0)
    phone = jnp.zeros((1, T, 768))
    pitch = jnp.ones((1, T), dtype=jnp.int32)
    pitchf = jnp.full((1, T), 220.0)
    sid = jnp.zeros((1,), dtype=jnp.int32)
    params = model.init(rng, phone, pitch, pitchf, sid)
    audio = model.apply(params, phone, pitch, pitchf, sid)
    assert audio.shape == (1, T * 400)  # model_return_size for the default chunk
    audio_np = np.asarray(audio)
    assert np.isfinite(audio_np).all()
    assert (np.abs(audio_np) <= 1.0).all()  # tanh output


def test_sine_source_voiced_unvoiced():
    from obs_rvc_tpu.models.synthesizer import sine_source

    T, upp = 8, 400
    f0 = jnp.concatenate([jnp.full((1, T // 2), 200.0), jnp.zeros((1, T // 2))], axis=1)
    src = np.asarray(sine_source(f0, upp, 40000, rng=None))
    assert src.shape == (1, T * upp)
    # voiced half oscillates at amp 0.1; unvoiced half is silent (no rng)
    assert np.abs(src[0, : T * upp // 2]).max() > 0.05
    np.testing.assert_allclose(src[0, T * upp // 2 + 10 :], 0.0, atol=1e-6)
    # fundamental frequency via FFT peak of the voiced region
    voiced = src[0, : T * upp // 2]
    spec = np.abs(np.fft.rfft(voiced * np.hanning(len(voiced))))
    peak_hz = np.argmax(spec) * 40000 / len(voiced)
    assert abs(peak_hz - 200.0) < 30.0
