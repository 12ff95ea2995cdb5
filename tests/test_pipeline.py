"""Streaming pipeline tests: buffer slides, pitch cache semantics, the
skip-inference passthrough, and the full neural step with random weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from obs_rvc_tpu.config import ChunkConfig, RvcModelVersion
from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState
from obs_rvc_tpu.stream.pipeline import slide_pitch_cache


def small_cfg(skip_inference=False, model_sr=40000):
    # small geometry to keep CPU tests fast: 0.1 s chunks, 0.5 s context
    return ChunkConfig.build(
        sample_rate=48000,
        model_sample_rate=model_sr,
        sample_length=0.10,
        fade_length=0.07,
        extra_inference_time=0.50,
        skip_inference=skip_inference,
    )


def test_slide_pitch_cache_matches_reference_semantics():
    # numpy model of rvc.rs:164-182 (copy_within + tail write)
    rng = np.random.default_rng(0)
    cache = rng.standard_normal(1024).astype(np.float32)
    f0 = rng.standard_normal(64).astype(np.float32)
    shift = 30

    expected = cache.copy()
    expected[: 1024 - shift] = expected[shift:]  # copy_within(shift.., 0)
    start = 1024 + 4 - 64
    expected[start:] = f0[3:63]

    got = np.asarray(slide_pitch_cache(jnp.asarray(cache), jnp.asarray(f0), shift))
    np.testing.assert_array_equal(got, expected)


def test_state_init_shapes():
    cfg = small_cfg()
    st = StreamState.init(cfg)
    assert st.input_buffer.shape == (cfg.input_buffer_size,)
    assert st.input_buffer_16k.shape == (cfg.input_buffer_16k_size,)
    assert st.sola_buffer.shape == (cfg.sola_buffer_frame_size,)
    assert st.cache_pitchf.shape == (1024,)
    stb = StreamState.init_batch(cfg, 4)
    assert stb.input_buffer.shape == (4, cfg.input_buffer_size)


def test_passthrough_streaming_reconstructs_tone():
    """skip_inference: 48k tone → 16k → back to 48k through the full chunk
    machinery (ring buffers, SOLA, crossfade) should reproduce the tone."""
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    controls = StepControls.default()

    sr, f = 48000, 440.0
    n_chunks = 8
    t = np.arange(n_chunks * cfg.sample_frame_size) / sr
    wav = np.sin(2 * np.pi * f * t).astype(np.float32)

    state = StreamState.init(cfg)
    outs = []
    for i in range(n_chunks):
        chunk = jnp.asarray(wav[i * cfg.sample_frame_size : (i + 1) * cfg.sample_frame_size])
        state, out = pipe.jit_step({}, state, chunk, controls)
        outs.append(np.asarray(out))
    out = np.concatenate(outs)

    # after warmup the output must be a clean 440 Hz tone (unit amplitude)
    tail = out[3 * cfg.sample_frame_size :]
    spec = np.abs(np.fft.rfft(tail * np.hanning(len(tail))))
    peak_hz = np.argmax(spec) * sr / len(tail)
    assert abs(peak_hz - f) < 5.0, peak_hz
    rms = np.sqrt(np.mean(tail**2))
    assert abs(rms - 1 / np.sqrt(2)) < 0.05, rms
    # chunk-boundary continuity: no sample-to-sample jump larger than the
    # tone's own max slope (2*pi*f/sr ≈ 0.058)
    max_jump = np.abs(np.diff(tail)).max()
    assert max_jump < 0.12, max_jump


@pytest.mark.slow
def test_full_neural_step_shapes_and_state():
    cfg = small_cfg()
    pipe = RvcPipeline(cfg, RvcModelVersion.V2)
    params = pipe.init_params(jax.random.PRNGKey(0))
    controls = StepControls.default(pitch_shift=12.0, rms_mix_rate=0.5)

    state = StreamState.init(cfg)
    chunk = jnp.asarray(
        np.random.default_rng(0).standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1
    )
    new_state, out = pipe.jit_step(params, state, chunk, controls)
    assert out.shape == (cfg.sample_frame_size,)
    assert np.isfinite(np.asarray(out)).all()
    # state advanced: 48k ring ends with the chunk
    np.testing.assert_allclose(
        np.asarray(new_state.input_buffer[-cfg.sample_frame_size :]), np.asarray(chunk)
    )
    # second step runs from the new state (shape stability / no retrace)
    _, out2 = pipe.jit_step(params, new_state, chunk, controls)
    assert out2.shape == (cfg.sample_frame_size,)


@pytest.mark.slow
def test_staged_step_matches_fused():
    cfg = small_cfg()
    pipe = RvcPipeline(cfg, RvcModelVersion.V2)
    params = pipe.init_params(jax.random.PRNGKey(0))
    controls = StepControls.default(pitch_shift=7.0, rms_mix_rate=0.4)
    chunk = jnp.asarray(
        np.random.default_rng(5).standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1
    )

    s_fused, out_fused = pipe.jit_step(params, StreamState.init(cfg), chunk, controls)
    s_staged, out_staged = pipe.staged_step(params, StreamState.init(cfg), chunk, controls)

    np.testing.assert_allclose(np.asarray(out_staged), np.asarray(out_fused), atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(s_staged.cache_pitchf), np.asarray(s_fused.cache_pitchf), atol=1e-4
    )


def test_staged_step_batched_passthrough():
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    B = 2
    controls1 = StepControls.default()
    controlsB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), controls1)
    chunks = jnp.asarray(
        np.random.default_rng(6).standard_normal((B, cfg.sample_frame_size)).astype(np.float32)
    )
    state = StreamState.init_batch(cfg, B)
    new_state, out = pipe.staged_step({}, state, chunks, controlsB, batched=True)
    assert out.shape == (B, cfg.sample_frame_size)

    _, out0 = pipe.staged_step({}, StreamState.init(cfg), chunks[0], controls1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out0), atol=1e-5)


@pytest.mark.slow
def test_batched_step_matches_single():
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    controls1 = StepControls.default()
    B = 3
    controlsB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), controls1)

    rng = np.random.default_rng(1)
    chunks = jnp.asarray(rng.standard_normal((B, cfg.sample_frame_size)).astype(np.float32))

    stateB = StreamState.init_batch(cfg, B)
    stateB, outB = pipe.jit_step_batch({}, stateB, chunks, controlsB)

    state1 = StreamState.init(cfg)
    _, out0 = pipe.jit_step({}, state1, chunks[0], controls1)
    np.testing.assert_allclose(np.asarray(outB[0]), np.asarray(out0), atol=1e-5)


def test_convert_scan_matches_loop():
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    controls = StepControls.default()
    rng = np.random.default_rng(7)
    wav = rng.standard_normal(5 * cfg.sample_frame_size).astype(np.float32) * 0.3

    loop_out = np.asarray(pipe.convert_offline({}, jnp.asarray(wav), controls))
    chunks = jnp.asarray(wav.reshape(5, cfg.sample_frame_size))
    scan_out = np.asarray(pipe.jit_convert_scan({}, chunks, controls))
    np.testing.assert_allclose(scan_out, loop_out, atol=1e-5)


def test_pipeline_with_retrieval_index():
    from obs_rvc_tpu.retrieval import RetrievalIndex

    cfg = small_cfg()
    from obs_rvc_tpu.models import ContentVecConfig, RMVPEConfig, SynthesizerConfig

    pipe = RvcPipeline(
        cfg,
        RvcModelVersion.V2,
        retrieval_index=RetrievalIndex(),
        contentvec_cfg=ContentVecConfig(
            dim=64, num_layers=2, tap_layer=2, num_heads=4, ffn_dim=128, out_dim=64
        ),
        rmvpe_cfg=RMVPEConfig(n_blocks=1, inter_layers=1, en_out_channels=2, gru_hidden=16),
        synth_cfg=SynthesizerConfig.for_sample_rate(40000, feature_dim=64),
    )
    params = pipe.init_params_fast(0)
    rng = np.random.default_rng(8)
    params["index"] = RetrievalIndex.make_params(
        rng.standard_normal((500, 64)).astype(np.float32)
    )
    controls = StepControls.default(index_rate=0.75)
    chunk = jnp.asarray(rng.standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1)
    state, out = pipe.jit_step(params, StreamState.init(cfg), chunk, controls)
    assert out.shape == (cfg.sample_frame_size,)
    assert np.isfinite(np.asarray(out)).all()
    # index_rate=0 must equal the no-index pipeline output
    controls0 = StepControls.default(index_rate=0.0)
    state2, out0 = pipe.jit_step(params, StreamState.init(cfg), chunk, controls0)
    pipe_noidx = RvcPipeline(
        cfg,
        RvcModelVersion.V2,
        contentvec_cfg=pipe.contentvec_cfg,
        rmvpe_cfg=pipe.rmvpe_cfg,
        synth_cfg=pipe.synth_cfg,
    )
    _, out_ref = pipe_noidx.jit_step(params, StreamState.init(cfg), chunk, controls0)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out_ref), atol=1e-5)


def test_v1_model_family_step():
    """v1: 256-dim features via final_proj, 9-layer tap — full step runs."""
    from obs_rvc_tpu.models import ContentVecConfig, RMVPEConfig, SynthesizerConfig

    cfg = small_cfg()
    pipe = RvcPipeline(
        cfg,
        RvcModelVersion.V1,
        contentvec_cfg=ContentVecConfig(
            dim=64, num_layers=3, tap_layer=2, num_heads=4, ffn_dim=128,
            out_dim=32, final_proj=True,
        ),
        rmvpe_cfg=RMVPEConfig(n_blocks=1, inter_layers=1, en_out_channels=2, gru_hidden=16),
        synth_cfg=SynthesizerConfig.for_sample_rate(40000, feature_dim=32),
    )
    params = pipe.init_params_fast(0)
    controls = StepControls.default(pitch_shift=-12.0)
    chunk = jnp.asarray(
        np.random.default_rng(9).standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1
    )
    _, out = pipe.jit_step(params, StreamState.init(cfg), chunk, controls)
    assert out.shape == (cfg.sample_frame_size,)
    assert np.isfinite(np.asarray(out)).all()


def test_pitch_cache_multi_chunk_simulation():
    """Iterate slide_pitch_cache over many chunks against a pure-numpy
    simulation of rvc.rs:164-182 (copy_within + tail write + slice)."""
    rng = np.random.default_rng(12)
    cache_np = np.zeros(1024, np.float32)
    cache_jx = jnp.zeros(1024)
    shift, pitch_len = 30, 64
    hubert_length, skip_head, return_length = 237, 200, 35

    for step in range(12):
        f0 = rng.random(pitch_len).astype(np.float32) * 400

        cache_np[: 1024 - shift] = cache_np[shift:]
        start = 1024 + 4 - pitch_len
        cache_np[start:] = f0[3 : pitch_len - 1]
        s0 = 1024 - hubert_length + skip_head
        want_slice = cache_np[s0 : s0 + return_length]

        cache_jx = slide_pitch_cache(cache_jx, jnp.asarray(f0), shift)
        got_slice = np.asarray(cache_jx)[s0 : s0 + return_length]

        np.testing.assert_array_equal(np.asarray(cache_jx), cache_np)
        np.testing.assert_array_equal(got_slice, want_slice)


def test_staged_step_donated_matches_plain():
    """Donated stage jits (session fast path) are bit-identical to the
    non-donating ones across a multi-chunk run."""
    cfg = small_cfg()
    pipe = RvcPipeline(cfg, RvcModelVersion.V2)
    params = pipe.init_params(jax.random.PRNGKey(0))
    controls = StepControls.default(pitch_shift=3.0, rms_mix_rate=0.6)
    rng = np.random.default_rng(11)
    chunks = [
        jnp.asarray(rng.standard_normal(cfg.sample_frame_size).astype(np.float32) * 0.1)
        for _ in range(3)
    ]

    s_a, s_b = StreamState.init(cfg), StreamState.init(cfg)
    for chunk in chunks:
        s_a, out_a = pipe.staged_step(params, s_a, chunk, controls)
        s_b, out_b = pipe.staged_step(params, s_b, chunk, controls, donate=True)
        np.testing.assert_array_equal(np.asarray(out_a), np.asarray(out_b))
    np.testing.assert_array_equal(
        np.asarray(s_a.cache_pitchf), np.asarray(s_b.cache_pitchf)
    )
    np.testing.assert_array_equal(
        np.asarray(s_a.input_buffer_16k), np.asarray(s_b.input_buffer_16k)
    )
