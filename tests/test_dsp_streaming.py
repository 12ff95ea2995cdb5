"""Parity tests for SOLA, RMS envelope mixing, f0 decode, and resampling.

Golden data: the reference's in-tree .npy fixtures
(obs-rvc/src/tests/*.npy) loaded read-only from /root/reference, plus the
inline expected vectors of rt_utils.rs:134-159."""

import numpy as np
import pytest
import jax.numpy as jnp

from obs_rvc_tpu.dsp import (
    CENTS_MAPPING,
    decode_f0,
    envelope_mixing,
    get_f0_post,
    linear_interpolate_align_corners,
    median_filter_f0,
    resample_poly,
    rms_envelope,
    sola_crossfade,
    sola_offset,
    to_local_average_cents,
)
from obs_rvc_tpu.dsp.window import fade_windows


# ---------- SOLA ----------

def test_sola_offset_fixture(ref_fixture):
    # obs-rvc/src/tests/sola.rs: expected offset 321
    infer_wav = jnp.asarray(ref_fixture("obs-rvc/src/tests/infer_wav.npy"))
    sola_buffer = jnp.asarray(ref_fixture("obs-rvc/src/tests/sola_buffer.npy"))
    off = int(sola_offset(infer_wav, sola_buffer, 1920, 480))
    assert off == 321


def test_sola_offset_finds_known_shift():
    rng = np.random.default_rng(2)
    tail = rng.standard_normal(1920).astype(np.float32)
    shift = 123
    out = np.concatenate([
        rng.standard_normal(shift).astype(np.float32) * 0.05,
        tail * 2.0,  # scaled copy — normalized correlation should still lock on
        rng.standard_normal(20000 - shift - 1920).astype(np.float32) * 0.05,
    ])
    off = int(sola_offset(jnp.asarray(out), jnp.asarray(tail), 1920, 480))
    assert off == shift


def test_sola_crossfade_contract():
    cfg_buffer, cfg_sample, search = 1920, 14400, 480
    total = cfg_sample + cfg_buffer + search
    rng = np.random.default_rng(3)
    out = jnp.asarray(rng.standard_normal(total).astype(np.float32))
    tail = jnp.asarray(rng.standard_normal(cfg_buffer).astype(np.float32))
    fade_in, fade_out = fade_windows(cfg_buffer)

    emitted, next_tail = sola_crossfade(out, tail, jnp.int32(7), fade_in, fade_out, cfg_sample)
    assert emitted.shape == (cfg_sample,)
    assert next_tail.shape == (cfg_buffer,)
    # head of emitted = crossfade of aligned output with saved tail
    expected_head = np.asarray(out)[7 : 7 + cfg_buffer] * np.asarray(fade_in) + np.asarray(
        tail
    ) * np.asarray(fade_out)
    np.testing.assert_allclose(np.asarray(emitted)[:cfg_buffer], expected_head, rtol=1e-6)
    # saved tail comes from the aligned region after the emitted frame
    np.testing.assert_allclose(
        np.asarray(next_tail),
        np.asarray(out)[7 + cfg_sample : 7 + cfg_sample + cfg_buffer],
        rtol=1e-6,
    )


# ---------- RMS envelope ----------

def test_rms_reference_vector():
    # rt_utils.rs:138-148
    y = jnp.arange(1.0, 11.0)
    out = np.asarray(rms_envelope(y, 4, 2))
    np.testing.assert_allclose(
        out, [1.118034, 2.738613, 4.6368093, 6.595453, 8.573215, 6.726812], rtol=1e-5
    )


def test_linear_interpolate_reference_vectors():
    # rt_utils.rs:151-158
    x = jnp.asarray(
        [0.2353, 0.9068, 0.7870, 0.5878, 0.0097, 0.7160, 0.5812, 0.8901, 0.8822, 0.8547]
    )
    out3 = np.asarray(linear_interpolate_align_corners(x, 3))
    np.testing.assert_allclose(out3, [0.2353, 0.36285, 0.8547], rtol=1e-5)
    out15 = np.asarray(linear_interpolate_align_corners(x, 15))
    expected15 = [
        0.2353, 0.66697854, 0.8725714, 0.79555714, 0.6731714, 0.4639215, 0.09228568,
        0.36285, 0.6967429, 0.6100857, 0.7135856, 0.8895357, 0.8844571, 0.8723786, 0.8547,
    ]
    np.testing.assert_allclose(out15, expected15, rtol=1e-4)


def test_envelope_rms_fixtures(ref_fixture):
    # obs-rvc/src/tests/envelop_mixing.rs (eps 1e-6 there)
    input_wav = ref_fixture("obs-rvc/src/tests/envelop_input_wav.npy")
    infer_wav = ref_fixture("obs-rvc/src/tests/envelop_infer_wav.npy")
    rms1_expected = ref_fixture("obs-rvc/src/tests/envelop_rms1.npy")
    rms2_expected = ref_fixture("obs-rvc/src/tests/envelop_rms2.npy")

    zc = 480
    out_len = len(infer_wav)
    rms1 = rms_envelope(jnp.asarray(input_wav[:out_len]), 4 * zc, zc)
    rms2 = rms_envelope(jnp.asarray(infer_wav), 4 * zc, zc)
    rms1 = linear_interpolate_align_corners(rms1, out_len + 1)
    rms2 = jnp.maximum(linear_interpolate_align_corners(rms2, out_len + 1), 1e-3)

    # fixtures store the first out_len samples of the (out_len+1)-point
    # interpolation (the slice actually consumed by the mix)
    np.testing.assert_allclose(np.asarray(rms1)[:out_len], rms1_expected, atol=2e-5)
    np.testing.assert_allclose(np.asarray(rms2)[:out_len], rms2_expected, atol=2e-5)


def test_envelope_mixing_full(ref_fixture):
    input_wav = ref_fixture("obs-rvc/src/tests/envelop_input_wav.npy")
    infer_wav = ref_fixture("obs-rvc/src/tests/envelop_infer_wav.npy")
    mixed = np.asarray(
        envelope_mixing(jnp.asarray(input_wav), jnp.asarray(infer_wav), 48000, 0.8)
    )
    assert mixed.shape == infer_wav.shape
    assert np.isfinite(mixed).all()
    # mix_rate=1 must be the identity (reference skips the call; we're branch-free)
    ident = np.asarray(
        envelope_mixing(jnp.asarray(input_wav), jnp.asarray(infer_wav), 48000, 1.0)
    )
    np.testing.assert_allclose(ident, infer_wav, atol=1e-6)


# ---------- f0 decode ----------

def test_cents_mapping_reference():
    assert CENTS_MAPPING.shape == (368,)
    np.testing.assert_allclose(CENTS_MAPPING[4], 1997.3794084376191, rtol=1e-6)
    np.testing.assert_allclose(CENTS_MAPPING[5] - CENTS_MAPPING[4], 20.0, rtol=1e-6)


def test_to_local_average_cents_peak():
    # single sharp peak at bin b → cents ≈ cents_mapping[b+4]
    T, b = 8, 100
    sal = np.zeros((T, 360), dtype=np.float32)
    sal[:, b] = 1.0
    cents = np.asarray(to_local_average_cents(jnp.asarray(sal), 0.03))
    np.testing.assert_allclose(cents, CENTS_MAPPING[b + 4], rtol=1e-6)


def test_to_local_average_cents_threshold_gate():
    sal = np.full((4, 360), 0.01, dtype=np.float32)
    cents = np.asarray(to_local_average_cents(jnp.asarray(sal), 0.03))
    np.testing.assert_array_equal(cents, 0.0)


def test_to_local_average_cents_edge_bins_no_oob():
    # peak at the last bin — the reference Rust would index OOB here
    sal = np.zeros((2, 360), dtype=np.float32)
    sal[:, 359] = 1.0
    cents = np.asarray(to_local_average_cents(jnp.asarray(sal), 0.03))
    np.testing.assert_allclose(cents, CENTS_MAPPING[363], rtol=1e-6)


def test_decode_f0_roundtrip():
    # salience peak at the bin whose cents encode 220 Hz
    target_cents = 1200.0 * np.log2(220.0 / 10.0)
    b = int(round((target_cents - 1997.3794084376191) / 20.0 + 4.0)) - 4
    sal = np.zeros((3, 360), dtype=np.float32)
    sal[:, b] = 1.0
    f0 = np.asarray(decode_f0(jnp.asarray(sal)))
    np.testing.assert_allclose(f0, 10.0 * 2 ** (CENTS_MAPPING[b + 4] / 1200.0), rtol=1e-5)
    assert abs(f0[0] - 220.0) < 3.0  # within one 20-cent bin


def test_get_f0_post_quantization():
    f0 = jnp.asarray([0.0, 50.0, 220.0, 500.0, 1000.0])
    coarse, f0_out = get_f0_post(f0)
    coarse = np.asarray(coarse)
    assert coarse[0] == 1       # unvoiced clamps to 1
    assert coarse[1] == 1       # f0_min maps to 1
    assert coarse[3] == 255     # f0_max maps to 255
    assert coarse[4] == 255     # clamped above
    assert 1 < coarse[2] < 255
    np.testing.assert_allclose(np.asarray(f0_out), np.asarray(f0))


def test_median_filter_f0():
    f0 = jnp.asarray([100.0, 100.0, 500.0, 100.0, 100.0])  # single-frame glitch
    out = np.asarray(median_filter_f0(f0, 3))
    np.testing.assert_allclose(out, 100.0)
    np.testing.assert_allclose(np.asarray(median_filter_f0(f0, 1)), np.asarray(f0))


# ---------- resampling ----------

def test_resample_sine_tone_down():
    # 48k → 16k on a 440 Hz tone: interior must match the ideal tone closely
    sr_in, sr_out, n = 48000, 16000, 15360
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), sr_in, sr_out))
    assert y.shape == (n // 3,)
    t_out = np.arange(len(y)) / sr_out
    ideal = np.sin(2 * np.pi * 440.0 * t_out)
    interior = slice(100, len(y) - 100)
    err = np.abs(y[interior] - ideal[interior]).max()
    assert err < 1e-3, err


def test_resample_sine_tone_up():
    # 40k → 48k (model → device rate), non-integer 6/5 ratio
    sr_in, sr_out, n = 40000, 48000, 14000
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * 440.0 * t).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), sr_in, sr_out))
    assert y.shape == (16800,)
    t_out = np.arange(len(y)) / sr_out
    ideal = np.sin(2 * np.pi * 440.0 * t_out)
    interior = slice(200, len(y) - 200)
    assert np.abs(y[interior] - ideal[interior]).max() < 1e-3


def test_resample_antialiasing():
    # a tone above the target Nyquist must be strongly attenuated
    sr_in, sr_out, n = 48000, 16000, 15360
    t = np.arange(n) / sr_in
    x = np.sin(2 * np.pi * 11000.0 * t).astype(np.float32)  # > 8 kHz Nyquist
    y = np.asarray(resample_poly(jnp.asarray(x), sr_in, sr_out))
    assert np.sqrt(np.mean(y[200:-200] ** 2)) < 1e-3


def test_resample_batched():
    x = np.random.default_rng(0).standard_normal((4, 15360)).astype(np.float32)
    y = np.asarray(resample_poly(jnp.asarray(x), 48000, 16000))
    assert y.shape == (4, 5120)
    y0 = np.asarray(resample_poly(jnp.asarray(x[0]), 48000, 16000))
    np.testing.assert_allclose(y[0], y0, atol=1e-6)


# ---------- phase vocoder ----------

def test_phase_vocoder_identical_signals_identity():
    from obs_rvc_tpu.dsp import phase_vocoder_blend
    from obs_rvc_tpu.dsp.window import fade_windows

    n = 1920
    t = np.arange(n) / 48000
    a = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    fade_in, fade_out = fade_windows(n)
    out = np.asarray(
        phase_vocoder_blend(jnp.asarray(a), jnp.asarray(a), fade_out, fade_in)
    )
    # blending a signal with itself must reproduce it (phases agree)
    np.testing.assert_allclose(out, a, atol=5e-3)


def test_phase_vocoder_smooths_phase_jump():
    from obs_rvc_tpu.dsp import phase_vocoder_blend
    from obs_rvc_tpu.dsp.window import fade_windows

    n, sr, f = 1920, 48000, 440.0
    t = np.arange(n) / sr
    a = np.sin(2 * np.pi * f * t).astype(np.float32)
    b = np.sin(2 * np.pi * f * t + np.pi / 2).astype(np.float32)  # 90° jump
    fade_in, fade_out = fade_windows(n)

    plain = a * np.asarray(fade_out) + b * np.asarray(fade_in)
    pv = np.asarray(phase_vocoder_blend(jnp.asarray(a), jnp.asarray(b), fade_out, fade_in))

    # amplitude-only crossfade of out-of-phase tones dips in energy; the
    # phase vocoder should preserve it much better in the middle region
    mid = slice(n // 4, 3 * n // 4)
    ref_rms = 1 / np.sqrt(2)
    plain_rms = np.sqrt(np.mean(plain[mid] ** 2))
    pv_rms = np.sqrt(np.mean(pv[mid] ** 2))
    assert abs(pv_rms - ref_rms) < abs(plain_rms - ref_rms)
    assert np.isfinite(pv).all()


# ---------- upstream-Python RMVPE decode parity (fuzz) ----------

def _python_rmvpe_to_local_average_cents(salience, thred=0.03):
    """numpy replica of upstream Python RVC's RMVPE.to_local_average_cents
    (the semantic target; the reference Rust diverges — see dsp/f0.py)."""
    cents_mapping = np.asarray(CENTS_MAPPING)
    center = np.argmax(salience, axis=1)  # [T]
    salience_pad = np.pad(salience, ((0, 0), (4, 4)))
    center = center + 4
    todo_salience = []
    todo_cents_mapping = []
    starts = center - 4
    ends = center + 5
    for idx in range(salience.shape[0]):
        todo_salience.append(salience_pad[idx, starts[idx] : ends[idx]])
        todo_cents_mapping.append(cents_mapping[starts[idx] : ends[idx]])
    todo_salience = np.array(todo_salience)
    todo_cents_mapping = np.array(todo_cents_mapping)
    product_sum = np.sum(todo_salience * todo_cents_mapping, 1)
    weight_sum = np.sum(todo_salience, 1)
    devided = product_sum / weight_sum
    maxx = np.max(salience, axis=1)
    devided[maxx <= thred] = 0
    return devided


def test_to_local_average_cents_fuzz_vs_python_rmvpe():
    rng = np.random.default_rng(11)
    for _ in range(20):
        sal = rng.random((16, 360)).astype(np.float32)
        # sprinkle sharp peaks incl. at the edges
        for t in range(16):
            sal[t, rng.integers(0, 360)] += rng.random() * 3
        sal[0, 0] += 5.0
        sal[1, 359] += 5.0
        want = _python_rmvpe_to_local_average_cents(sal)
        got = np.asarray(to_local_average_cents(jnp.asarray(sal), 0.03))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_resample_phase_bank_matches_dilated_conv():
    """The production phase-bank polyphase conv (no lhs_dilation) must equal
    the textbook zero-stuff formulation to f32 rounding for every rate pair
    the pipeline uses (and a non-trivial 44.1k case)."""
    import numpy as np
    import jax.numpy as jnp

    from obs_rvc_tpu.dsp.resample import resample_poly, resample_poly_dilated

    rng = np.random.default_rng(0)
    for sr_in, sr_out, n in [
        (48000, 16000, 17760),   # pre-stage down path
        (40000, 48000, 17280),   # post-stage up path (40k model)
        (32000, 48000, 9600),    # 32k model
        (16000, 48000, 4800),    # skip-inference passthrough
        (44100, 48000, 4410),    # large up/down (147/160)
    ]:
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        a = np.asarray(resample_poly(x, sr_in, sr_out))
        b = np.asarray(resample_poly_dilated(x, sr_in, sr_out))
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-6)
    # batched input follows the same path
    xb = jnp.asarray(rng.standard_normal((3, 17280)).astype(np.float32))
    ab = np.asarray(resample_poly(xb, 40000, 48000))
    bb = np.asarray(resample_poly_dilated(xb, 40000, 48000))
    np.testing.assert_allclose(ab, bb, atol=2e-6)


def test_linear_interpolate_ramp_path_matches_gather_path():
    """The gather-free integral-factor fast path must agree with the general
    formulation (which itself matches torch align_corners=True)."""
    rng = np.random.default_rng(0)
    for n, r in [(31, 480), (5, 3), (2, 7)]:
        x = jnp.asarray(rng.standard_normal(n).astype(np.float32))
        size = (n - 1) * r + 1
        fast = np.asarray(linear_interpolate_align_corners(x, size))
        # force the general path by asking for size+1 then comparing on the
        # shared grid is awkward; instead recompute the reference directly
        pos = np.arange(size) * ((n - 1) / (size - 1))
        lo = np.clip(np.floor(pos).astype(int), 0, n - 1)
        hi = np.clip(np.ceil(pos).astype(int), 0, n - 1)
        frac = (pos - lo).astype(np.float32)
        ref = np.asarray(x)[lo] * (1 - frac) + np.asarray(x)[hi] * frac
        np.testing.assert_allclose(fast, ref, atol=2e-6)
        assert fast[0] == np.asarray(x)[0] and fast[-1] == np.asarray(x)[-1]
