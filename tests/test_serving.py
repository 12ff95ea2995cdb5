"""Host-side serving layer: ring buffers, stream session, RPC wire protocol,
metrics, audio IO, checkpoint loader plumbing."""

import io
import threading

import numpy as np
import pytest
import jax

from obs_rvc_tpu.config import ChunkConfig
from obs_rvc_tpu.stream import RvcEngine, RvcPipeline, StepControls, StreamSession
from obs_rvc_tpu.stream.ringbuf import NativeRingBuffer, PyRingBuffer, _LIB, make_ring_buffer


def small_cfg(**kw):
    return ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50, **kw
    )


# ---------- ring buffers ----------

@pytest.mark.parametrize("cls", [PyRingBuffer] + ([NativeRingBuffer] if _LIB else []))
def test_ringbuffer_contract(cls):
    rb = cls(1000)
    assert rb.capacity >= 1000 and (rb.capacity & (rb.capacity - 1)) == 0
    x = np.arange(300, dtype=np.float32)
    assert rb.push(x) == 300
    assert rb.available() == 300
    assert rb.pop_exact(400) is None  # not enough → nothing consumed
    got = rb.pop_exact(200)
    np.testing.assert_array_equal(got, x[:200])
    assert rb.available() == 100
    got = rb.pop(500)  # partial pop
    np.testing.assert_array_equal(got, x[200:300])


@pytest.mark.skipif(_LIB is None, reason="native lib not built")
def test_native_ringbuffer_wraparound_and_threads():
    rb = NativeRingBuffer(1 << 12)
    total = 200_000
    chunk = 997  # prime size to exercise wraparound

    def producer():
        sent = 0
        while sent < total:
            n = min(chunk, total - sent)
            data = np.arange(sent, sent + n, dtype=np.float32)
            pushed = rb.push(data)
            sent += pushed

    received = []
    t = threading.Thread(target=producer)
    t.start()
    got = 0
    while got < total:
        out = rb.pop(4096)
        if out.size:
            received.append(out)
            got += out.size
    t.join()
    all_data = np.concatenate(received)
    np.testing.assert_array_equal(all_data, np.arange(total, dtype=np.float32))


# ---------- stream session ----------

def test_stream_session_passthrough():
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    sess = StreamSession(pipe, params={})

    sr, f = 48000, 330.0
    n = 6 * cfg.sample_frame_size
    wav = np.sin(2 * np.pi * f * np.arange(n) / sr).astype(np.float32)

    # push in odd-sized frames like an audio callback would (lib.rs:592-643)
    frame = 1024
    out = []
    for i in range(0, n, frame):
        sess.push_audio(wav[i : i + frame])
        sess.process_pending()
        out.append(sess.pull_audio(frame))
    sess.process_pending()
    out.append(sess.pull_audio(n))
    got = np.concatenate(out)

    assert got.size >= 4 * cfg.sample_frame_size
    tail = got[2 * cfg.sample_frame_size :]
    spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
    peak_hz = np.argmax(spec) * sr / tail.size
    assert abs(peak_hz - f) < 5.0
    snap = sess.metrics.snapshot()
    assert snap.chunks >= 4
    assert snap.p50_ms > 0


def test_stream_session_failure_emits_silence():
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    sess = StreamSession(pipe, params={})

    # sabotage the step to throw (engine-crash path, lib.rs:716-727)
    def boom(*a, **k):
        raise RuntimeError("injected failure")

    sess.pipeline = type("P", (), {"cfg": cfg, "jit_step": staticmethod(boom)})()
    sess.push_audio(np.ones(cfg.sample_frame_size, np.float32))
    assert sess.process_pending() == 1
    out = sess.pull_audio(cfg.sample_frame_size)
    np.testing.assert_array_equal(out, 0.0)


def test_stream_session_update_controls():
    cfg = small_cfg(skip_inference=True)
    sess = StreamSession(RvcPipeline(cfg), params={})
    sess.update_controls(pitch_shift=5.0, rms_mix_rate=0.25)
    assert float(sess.controls.pitch_shift) == 5.0
    assert float(sess.controls.rms_mix_rate) == 0.25


# ---------- RPC wire protocol ----------

def test_rpc_roundtrip_wire_format():
    from obs_rvc_tpu.serve.rpc import RpcClient, serve_stream

    cfg = small_cfg()

    class FakeEngine:
        def infer(self, samples, n16k, pitch, skip, ret):
            assert samples.dtype == np.float32
            assert (n16k, pitch, skip, ret) == (1600, -12, 50, 15)
            return samples[:100] * 2.0

    req = io.BytesIO()
    client_out = RpcClient(io.BytesIO(), req)
    samples = np.random.default_rng(0).standard_normal(3200).astype(np.float32)
    # write request, then serve it, then parse response
    client_out._rout.write(__import__("struct").pack("<I", samples.size))
    client_out._rout.write(samples.astype("<f4").tobytes())
    client_out._rout.write(__import__("struct").pack("<IiII", 1600, -12, 50, 15))

    resp = io.BytesIO()
    req.seek(0)
    try:
        serve_stream(FakeEngine(), req, resp)
    except EOFError:
        pass
    resp.seek(0)
    client_in = RpcClient(resp, io.BytesIO())
    import struct as _s

    (n,) = _s.unpack("<I", resp.read(4))
    out = np.frombuffer(resp.read(4 * n), dtype="<f4")
    np.testing.assert_allclose(out, samples[:100] * 2.0, atol=1e-6)


def test_engine_geometry_validation():
    from obs_rvc_tpu.stream.engine import EngineError

    cfg = small_cfg()
    pipe = RvcPipeline(cfg)
    eng = RvcEngine(pipe, params=None)
    # model not loaded
    with pytest.raises(EngineError):
        eng.infer(np.zeros(cfg.input_buffer_16k_size, np.float32),
                  cfg.sample_frame_16k_size, 0, cfg.skip_head, cfg.return_length)
    eng.load_params({"dummy": 1})
    # invalid: requested slice exceeds available feature frames
    with pytest.raises(EngineError):
        eng.infer(np.zeros(17, np.float32), cfg.sample_frame_16k_size, 0,
                  cfg.skip_head, cfg.return_length)
    # invalid: n16k not a multiple of 160
    with pytest.raises(EngineError):
        eng.infer(np.zeros(cfg.input_buffer_16k_size, np.float32), 123, 0,
                  cfg.skip_head, cfg.return_length)


def test_engine_serves_arbitrary_request_geometry():
    """The engine must honor per-request geometry like the reference
    (``rvc/src/rvc.rs:133-220`` recomputes everything per call), not just
    the launch-time ChunkConfig — with a compiled-executable cache keyed on
    the request's (input_len, n16k, skip_head, return_length)."""
    import jax

    cfg = small_cfg()  # launch geometry: 0.10 s chunks, 0.5 s extra
    pipe = RvcPipeline(cfg)
    eng = RvcEngine(pipe, pipe.init_params_fast())

    # launch geometry works
    out1 = eng.infer(
        np.zeros(cfg.input_buffer_16k_size, np.float32),
        cfg.sample_frame_16k_size, 0, cfg.skip_head, cfg.return_length,
    )
    assert out1.shape == (cfg.return_length * cfg.model_sample_rate // 100,)

    # a different geometry (longer chunk, shorter context — what a legacy
    # client with non-default sample_length/extra_time sends) also works
    cfg2 = ChunkConfig.build(
        sample_rate=48000, sample_length=0.20, extra_inference_time=0.30
    )
    assert (cfg2.input_buffer_16k_size, cfg2.sample_frame_16k_size,
            cfg2.skip_head, cfg2.return_length) != (
        cfg.input_buffer_16k_size, cfg.sample_frame_16k_size,
        cfg.skip_head, cfg.return_length)
    out2 = eng.infer(
        np.zeros(cfg2.input_buffer_16k_size, np.float32),
        cfg2.sample_frame_16k_size, 2, cfg2.skip_head, cfg2.return_length,
    )
    assert out2.shape == (cfg2.return_length * cfg.model_sample_rate // 100,)

    # pitch cache persists across geometries (engine-level, rvc.rs:42)
    assert eng.cache_pitchf.shape == (cfg.pitch_cache_len,)

    # the same geometry hits the cached executable (no third entry)
    eng.infer(
        np.zeros(cfg2.input_buffer_16k_size, np.float32),
        cfg2.sample_frame_16k_size, 0, cfg2.skip_head, cfg2.return_length,
    )
    assert len(eng._infer_cache) == 2


# ---------- metrics ----------

def test_metrics_snapshot():
    from obs_rvc_tpu.serve.metrics import ChunkMetrics

    m = ChunkMetrics(chunk_seconds=0.3)
    for v in [10.0, 20.0, 30.0, 40.0, 50.0]:
        m.record(v)
    m.record_underrun()
    snap = m.snapshot()
    assert snap.chunks == 5
    assert snap.p50_ms == 30.0
    assert snap.underruns == 1
    assert snap.rtf == pytest.approx(0.1)
    assert snap.audio_seconds_per_second == pytest.approx(10.0)


# ---------- audio io ----------

def test_wav_roundtrip(tmp_path):
    from obs_rvc_tpu.utils import downmix_to_mono, read_wav, upmix_from_mono, write_wav

    rng = np.random.default_rng(0)
    audio = np.clip(rng.standard_normal((2, 4800)) * 0.3, -0.99, 0.99).astype(np.float32)
    write_wav(tmp_path / "t.wav", audio, 48000)
    back, sr = read_wav(tmp_path / "t.wav")
    assert sr == 48000
    assert back.shape == (2, 4800)
    np.testing.assert_allclose(back, audio, atol=1.5 / 32768)

    mono = downmix_to_mono(audio)
    np.testing.assert_allclose(mono, audio.mean(axis=0), atol=1e-6)
    up = upmix_from_mono(mono, 2)
    assert up.shape == (2, 4800)
    np.testing.assert_array_equal(up[0], up[1])


# ---------- duplex stream server ----------

def test_stream_server_duplex_tone():
    import socket as socket_mod
    import threading
    import time as time_mod

    from obs_rvc_tpu.serve.stream_server import StreamClient, serve_connection

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    # pre-compile the step so the socket loop isn't racing a cold jit
    from obs_rvc_tpu.stream import StepControls, StreamState
    import jax.numpy as jnp

    pipe.jit_step({}, StreamState.init(cfg), jnp.zeros(cfg.sample_frame_size),
                  StepControls.default())
    session = StreamSession(pipe, params={})

    server_sock, client_sock = socket_mod.socketpair()
    t = threading.Thread(
        target=serve_connection,
        args=(session, server_sock.makefile("rb"), server_sock.makefile("wb")),
        daemon=True,
    )
    t.start()

    client = StreamClient(client_sock.makefile("rb"), client_sock.makefile("wb"))
    client.update_controls(pitch_shift=3.0, rms_mix_rate=1.0)

    sr, f = 48000, 440.0
    n = 8 * cfg.sample_frame_size
    wav = np.sin(2 * np.pi * f * np.arange(n) / sr).astype(np.float32)

    out = []
    frame = 2400
    total = 0
    i = 0
    while i < n:
        got = client.send_audio(wav[i : i + frame])
        out.append(got)
        total += got.size
        i += frame
        time_mod.sleep(0.002)  # pace roughly; let the worker drain
    # keep feeding silence until enough converted audio has come back
    deadline = time_mod.time() + 60
    while total < 5 * cfg.sample_frame_size and time_mod.time() < deadline:
        got = client.send_audio(np.zeros(frame, np.float32))
        out.append(got)
        total += got.size
        time_mod.sleep(0.01)
    client.close()
    t.join(timeout=10)

    got = np.concatenate(out)
    assert got.size >= 5 * cfg.sample_frame_size
    tail = got[2 * cfg.sample_frame_size : 5 * cfg.sample_frame_size]
    spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
    peak_hz = np.argmax(spec) * sr / tail.size
    assert abs(peak_hz - f) < 6.0
    # control update landed
    assert float(session.controls.pitch_shift) == 3.0


# ---------- multi-stream pool ----------

def test_stream_pool_multi_voice():
    import jax.numpy as jnp

    from obs_rvc_tpu.stream import StreamPool, StepControls

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    pool = StreamPool(pipe, params={}, capacity=3)

    s0 = pool.attach(StepControls.default())
    s1 = pool.attach(StepControls.default())
    assert {s0, s1} == {0, 1}

    sr = 48000
    n = 6 * cfg.sample_frame_size
    t = np.arange(n) / sr
    wav0 = np.sin(2 * np.pi * 330.0 * t).astype(np.float32)
    wav1 = np.sin(2 * np.pi * 550.0 * t).astype(np.float32)

    for i in range(0, n, cfg.sample_frame_size):
        pool.push_audio(s0, wav0[i : i + cfg.sample_frame_size])
        pool.push_audio(s1, wav1[i : i + cfg.sample_frame_size])
        pool.process_pending()

    out0 = pool.pull_audio(s0, n)
    out1 = pool.pull_audio(s1, n)
    assert out0.size >= 4 * cfg.sample_frame_size
    assert out1.size >= 4 * cfg.sample_frame_size

    def peak(x):
        tail = x[2 * cfg.sample_frame_size :]
        spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
        return np.argmax(spec) * sr / tail.size

    # each stream keeps its own tone — no cross-slot bleed
    assert abs(peak(out0) - 330.0) < 6.0
    assert abs(peak(out1) - 550.0) < 6.0

    # detach + reattach clears the slot
    pool.detach(s0)
    s2 = pool.attach()
    assert s2 == s0
    assert pool.pull_audio(s2, 100).size == 0


def test_stream_pool_full():
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pool = StreamPool(RvcPipeline(cfg), params={}, capacity=1)
    pool.attach()
    with pytest.raises(RuntimeError):
        pool.attach()


def test_stream_pool_starved_slot_freezes():
    """A starved active slot's state must freeze, not slide over silence:
    after stalling for several ticks (while another slot keeps the pool
    stepping), its resumed output must be identical to an uninterrupted run
    (the reference accumulates and waits, lib.rs:811-828)."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    n_chunks = 6
    chunk = cfg.sample_frame_size
    rng = np.random.default_rng(0)
    wav = rng.standard_normal(n_chunks * chunk).astype(np.float32) * 0.1

    def run(starve_after=None, starve_ticks=0):
        pool = StreamPool(pipe, params={}, capacity=2)
        s = pool.attach()
        other = pool.attach()  # keeps the pool ticking while s is starved
        out = []
        fed = 0
        ticks = 0
        while fed < n_chunks:
            starving = starve_after is not None and fed == starve_after and ticks < starve_ticks
            if not starving:
                pool.push_audio(s, wav[fed * chunk : (fed + 1) * chunk])
                fed += 1
            pool.push_audio(other, np.zeros(chunk, np.float32))
            ticks += 1
            pool.process_pending()
        out.append(pool.pull_audio(s, n_chunks * chunk))
        return np.concatenate(out)

    uninterrupted = run()
    starved = run(starve_after=3, starve_ticks=4)
    np.testing.assert_array_equal(starved, uninterrupted)


def test_stream_pool_fused_matches_staged(tmp_path, monkeypatch):
    """Pool fused mode (one monolithic batched executable + exec cache —
    serve.server --pool N --step-mode fused) must produce the staged pool's
    exact outputs, including across a starved tick (the masked merge needs
    the PRE-step states, so the fused step must not donate them)."""
    monkeypatch.setenv("OBS_RVC_EXEC_CACHE_DIR", str(tmp_path))
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    n_chunks = 4
    chunk = cfg.sample_frame_size
    rng = np.random.default_rng(7)
    wav = rng.standard_normal(n_chunks * chunk).astype(np.float32) * 0.1

    def run(mode, exec_cache=False):
        pool = StreamPool(pipe, params={}, capacity=2, mode=mode,
                          exec_cache=exec_cache)
        s = pool.attach()
        other = pool.attach()  # keeps the pool ticking while s starves
        fed = ticks = 0
        while fed < n_chunks:
            starving = fed == 2 and ticks == 2  # one starved tick mid-stream
            if not starving:
                pool.push_audio(s, wav[fed * chunk : (fed + 1) * chunk])
                fed += 1
            pool.push_audio(other, np.zeros(chunk, np.float32))
            ticks += 1
            pool.process_pending()
        assert pool.metrics.snapshot().errors == 0
        return pool.pull_audio(s, n_chunks * chunk)

    staged = run("staged")
    fused = run("fused", exec_cache=True)
    np.testing.assert_allclose(fused, staged, atol=1e-6)
    assert list(tmp_path.glob("*.exe.pkl")), "pool fused executable not persisted"

    with pytest.raises(ValueError):
        StreamPool(pipe, params={}, capacity=1, mode="bogus")


def test_stream_pool_int16_wire_matches_float32():
    """io_dtype='int16' ships 16-bit PCM across the host↔device link (halves
    the per-tick transfer bytes — serve.server --pool-io-dtype int16). The
    cast pair is fused into the batched executable; output must match the
    float32 wire within 1 LSB of int16 on both the quantized input and the
    quantized output (≈6e-5 here: the step is linear in the input for the
    passthrough geometry)."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    n_chunks = 3
    chunk = cfg.sample_frame_size
    rng = np.random.default_rng(11)
    wav = rng.standard_normal(n_chunks * chunk).astype(np.float32) * 0.1

    def run(io_dtype):
        pool = StreamPool(pipe, params={}, capacity=1, mode="fused",
                          io_dtype=io_dtype)
        s = pool.attach()
        for i in range(n_chunks):
            pool.push_audio(s, wav[i * chunk : (i + 1) * chunk])
            pool.process_pending()
        assert pool.metrics.snapshot().errors == 0
        return pool.pull_audio(s, n_chunks * chunk)

    f32 = run("float32")
    i16 = run("int16")
    assert i16.size == f32.size > 0
    np.testing.assert_allclose(i16, f32, atol=1e-4)

    with pytest.raises(ValueError):  # int16 needs the fused executable
        StreamPool(pipe, params={}, capacity=1, mode="staged", io_dtype="int16")


def test_stream_pool_pipelined_matches_sync():
    """pipelined=True (double-buffered output pulls — serve.server
    --pool-pipelined) must deliver byte-identical per-slot audio, one tick
    late: tick k's output lands after tick k+1's dispatch (or on
    flush_pending/stop). Covers a starved tick and the quiescent flush."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    n_chunks = 4
    chunk = cfg.sample_frame_size
    rng = np.random.default_rng(13)
    wavs = [rng.standard_normal(n_chunks * chunk).astype(np.float32) * 0.1
            for _ in range(2)]

    def run(pipelined):
        pool = StreamPool(pipe, params={}, capacity=2, mode="fused",
                          pipelined=pipelined)
        slots = [pool.attach() for _ in wavs]
        fed = [0, 0]
        ticks = 0
        lagged = False
        while min(fed) < n_chunks:
            for k, s in enumerate(slots):
                starving = k == 0 and fed[0] == 2 and ticks == 2
                if not starving and fed[k] < n_chunks:
                    pool.push_audio(s, wavs[k][fed[k] * chunk : (fed[k] + 1) * chunk])
                    fed[k] += 1
            ticks += 1
            pool.process_pending()
            if pipelined and ticks == 1:
                # the defining behavior: first tick's audio is still on device
                lagged = pool.pull_audio(slots[0], chunk).size == 0
        if pipelined:
            assert lagged, "pipelined pool delivered synchronously"
        pool.stop()  # flushes the stashed tick
        assert pool.metrics.snapshot().errors == 0
        return [pool.pull_audio(s, n_chunks * chunk) for s in slots]

    sync = run(False)
    pipe_out = run(True)
    for a, b in zip(pipe_out, sync):
        assert a.size == b.size == n_chunks * chunk
        np.testing.assert_allclose(a, b, atol=1e-6)

    with pytest.raises(ValueError):  # pipelined needs the fused executable
        StreamPool(pipe, params={}, capacity=1, mode="staged", pipelined=True)


def test_stream_pool_pristine_attach_skips_state_write():
    """Attaching to never-stepped slots must not issue device writes (the
    resident batch state is already fresh zeros) — attaching 64 streams used
    to cost 256 eager at[i].set dispatches before the first tick. A slot
    that actually carried state (stepped, then detached/re-attached) still
    gets zeroed."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    pool = StreamPool(pipe, params={}, capacity=3)

    before = pool._states
    a = pool.attach()
    b = pool.attach()
    assert pool._states is before  # no device write for pristine slots

    rng = np.random.default_rng(3)
    pool.push_audio(a, rng.standard_normal(cfg.sample_frame_size).astype(np.float32))
    pool.push_audio(b, rng.standard_normal(cfg.sample_frame_size).astype(np.float32))
    pool.process_pending()
    assert any(np.asarray(l[a]).any() for l in jax.tree.leaves(pool._states))

    pool.detach(a)  # dirty slot: the clear must really zero it
    for leaf in jax.tree.leaves(pool._states):
        assert not np.asarray(leaf[a]).any()
    # slot b untouched by a's clear
    assert any(np.asarray(l[b]).any() for l in jax.tree.leaves(pool._states))


def test_stream_pool_failure_observable():
    """A failing batched step logs, bumps the error counter, and emits
    silence for fed slots (reference's logged recovery, lib.rs:716-727)."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pool = StreamPool(RvcPipeline(cfg), params={}, capacity=2)
    s = pool.attach()

    def boom(*a, **k):
        raise RuntimeError("injected failure")

    pool.pipeline = type("P", (), {"cfg": cfg, "staged_step": staticmethod(boom)})()
    pool.push_audio(s, np.ones(cfg.sample_frame_size, np.float32))
    assert pool.process_pending() == 1
    assert pool.metrics.errors == 1
    out = pool.pull_audio(s, cfg.sample_frame_size)
    np.testing.assert_array_equal(out, 0.0)


def test_stream_session_failure_observable():
    cfg = small_cfg(skip_inference=True)
    sess = StreamSession(RvcPipeline(cfg), params={})

    def boom(*a, **k):
        raise RuntimeError("injected failure")

    sess.pipeline = type("P", (), {"cfg": cfg, "jit_step": staticmethod(boom),
                                   "staged_step": staticmethod(boom)})()
    sess.push_audio(np.ones(cfg.sample_frame_size, np.float32))
    sess.process_pending()
    assert sess.metrics.errors == 1


def test_stream_pool_attach_detach_hammer():
    """Attach/detach churn concurrent with the batched worker must not
    corrupt slot bookkeeping (per-slot epoch guard)."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pool = StreamPool(RvcPipeline(cfg), params={}, capacity=4)
    anchor = pool.attach()  # keeps ticks happening
    stop = threading.Event()
    errors = []

    def churn():
        try:
            while not stop.is_set():
                slot = pool.attach()
                pool.push_audio(slot, np.zeros(cfg.sample_frame_size, np.float32))
                pool.detach(slot)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    t = threading.Thread(target=churn)
    t.start()
    try:
        for _ in range(30):
            pool.push_audio(anchor, np.zeros(cfg.sample_frame_size, np.float32))
            pool.process_pending()
    finally:
        stop.set()
        t.join(timeout=10)
    assert not errors
    assert pool.metrics.errors == 0


def test_stream_pool_stale_epoch_fixup_deterministic():
    """A slot detached WHILE the batched step computes must come out of the
    tick with its cleared (zero) state and no output — deterministically
    exercising the stale-epoch fixup that the hammer test only races.
    Round 4 moved the frozen-slot merge inside the batched executable; the
    epoch guard is now a post-step fixup that restores the cleared state,
    so a regression here would silently resurrect a detached slot's
    pre-clear context."""
    import jax

    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    pool = StreamPool(pipe, params={})
    a = pool.attach()
    b = pool.attach()
    rng = np.random.default_rng(7)
    for s in (a, b):
        pool.push_audio(s, rng.standard_normal(cfg.sample_frame_size).astype(np.float32))

    orig = pipe.staged_step

    def racing(*args, **kwargs):
        out = orig(*args, **kwargs)
        pool.detach(b)  # epoch bump lands mid-tick, after the snapshot
        return out

    pipe.staged_step = racing
    try:
        assert pool.process_pending() == 2
    finally:
        pipe.staged_step = orig

    # detached slot: cleared state, no audio
    for leaf in jax.tree.leaves(pool._states):
        assert not np.asarray(leaf[b]).any()
    assert pool.pull_audio(b, cfg.sample_frame_size).size == 0
    # surviving slot: state advanced and one chunk delivered
    assert any(np.asarray(leaf[a]).any() for leaf in jax.tree.leaves(pool._states))
    assert pool.pull_audio(a, cfg.sample_frame_size).size == cfg.sample_frame_size


def test_stream_session_stage_timing_metrics():
    """stage_timing=True surfaces per-stage p50 wall times in the metrics
    snapshot (the reference's per-session stage timers, rvc.rs:217)."""
    cfg = small_cfg(skip_inference=True)
    sess = StreamSession(RvcPipeline(cfg), params={}, stage_timing=True)
    for _ in range(3):
        sess.push_audio(np.zeros(cfg.sample_frame_size, np.float32))
        sess.process_pending()
    snap = sess.metrics.snapshot()
    # passthrough geometry still runs pre + post
    assert set(snap.stage_p50_ms) == {"pre", "post"}
    assert all(v >= 0.0 for v in snap.stage_p50_ms.values())
    assert "stage_p50_ms" in snap.as_dict()


def test_stream_pool_batching_gate():
    """should_step waits for batch_min ready slots, then fires; a lone ready
    slot fires once its wait exceeds batch_deadline_ms."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pool = StreamPool(
        RvcPipeline(cfg), params={}, capacity=4, batch_min=2, batch_deadline_ms=50.0
    )
    a = pool.attach()
    b = pool.attach()
    assert not pool.should_step(now=0.0)  # nothing ready

    pool.push_audio(a, np.zeros(cfg.sample_frame_size, np.float32))
    assert not pool.should_step(now=0.0)      # 1 ready < batch_min
    assert not pool.should_step(now=0.040)    # still under deadline
    assert pool.should_step(now=0.060)        # deadline exceeded -> fire

    # second ready slot satisfies batch_min immediately
    pool.push_audio(b, np.zeros(cfg.sample_frame_size, np.float32))
    assert pool.should_step(now=0.061)
    assert pool.process_pending() == 2
    # consumed: gate resets
    assert not pool.should_step(now=0.062)


def test_stream_pool_batch_min_capped_by_active():
    """batch_min larger than the active-slot count must not deadlock."""
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pool = StreamPool(RvcPipeline(cfg), params={}, capacity=4, batch_min=8)
    s = pool.attach()
    pool.push_audio(s, np.zeros(cfg.sample_frame_size, np.float32))
    assert pool.should_step(now=0.0)  # min(batch_min, n_active) == 1


# ---------- WebSocket front door ----------

def test_ws_accept_key_rfc_vector():
    from obs_rvc_tpu.serve.ws import ws_accept_key

    # RFC 6455 §1.3 worked example
    assert ws_accept_key("dGhlIHNhbXBsZSBub25jZQ==") == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="


def test_ws_frame_roundtrip_all_length_classes():
    import io

    from obs_rvc_tpu.serve.ws import OP_BINARY, read_frame, write_frame

    for size in (0, 1, 125, 126, 65535, 65536):
        for mask in (False, True):
            buf = io.BytesIO()
            payload = bytes(i % 251 for i in range(size))
            write_frame(buf, OP_BINARY, payload, mask=mask)
            buf.seek(0)
            op, got = read_frame(buf)
            assert op == OP_BINARY and got == payload, (size, mask)


def test_ws_fragmented_message_reassembly():
    import io

    from obs_rvc_tpu.serve.ws import OP_BINARY, read_frame

    # text/binary message split across a non-FIN first frame + continuation
    buf = io.BytesIO()
    buf.write(bytes([0x02, 3]) + b"abc")        # FIN=0, opcode=binary
    buf.write(bytes([0x80, 3]) + b"def")        # FIN=1, opcode=continuation
    buf.seek(0)
    op, got = read_frame(buf)
    assert op == OP_BINARY and got == b"abcdef"


def test_ws_duplex_tone_and_controls():
    """End-to-end over a real socket: handshake, masked frames, audio tone
    through the passthrough pipeline, live control update, clean close."""
    import socket as socket_mod
    import threading
    import time as time_mod

    from obs_rvc_tpu.serve.ws import WsStreamClient, serve_ws_connection, server_handshake

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    from obs_rvc_tpu.stream import StepControls, StreamState
    import jax.numpy as jnp

    pipe.jit_step({}, StreamState.init(cfg), jnp.zeros(cfg.sample_frame_size),
                  StepControls.default())
    session = StreamSession(pipe, params={})

    server_sock, client_sock = socket_mod.socketpair()

    def serve():
        with server_sock, server_sock.makefile("rb") as rin, server_sock.makefile("wb") as rout:
            server_handshake(rin, rout)
            serve_ws_connection(session, rin, rout)

    t = threading.Thread(target=serve, daemon=True)
    t.start()

    from obs_rvc_tpu.serve.ws import client_handshake

    rin, rout = client_sock.makefile("rb"), client_sock.makefile("wb")
    client_handshake(rin, rout, "test")
    client = WsStreamClient(rin, rout)
    client.update_controls(pitch_shift=2.0)

    sr, f = 48000, 440.0
    n = 6 * cfg.sample_frame_size
    wav = np.sin(2 * np.pi * f * np.arange(n) / sr).astype(np.float32)
    out, total, frame = [], 0, 2400
    for i in range(0, n, frame):
        got = client.send_audio(wav[i : i + frame])
        out.append(got)
        total += got.size
        time_mod.sleep(0.002)
    deadline = time_mod.time() + 60
    while total < 4 * cfg.sample_frame_size and time_mod.time() < deadline:
        got = client.send_audio(np.zeros(frame, np.float32))
        out.append(got)
        total += got.size
        time_mod.sleep(0.01)
    client.close()
    t.join(timeout=10)

    got = np.concatenate(out)
    assert got.size >= 4 * cfg.sample_frame_size
    tail = got[2 * cfg.sample_frame_size : 4 * cfg.sample_frame_size]
    spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
    peak_hz = np.argmax(spec) * sr / tail.size
    assert abs(peak_hz - f) < 7.0
    assert float(session.controls.pitch_shift) == 2.0


def test_ws_rejects_non_upgrade_request():
    import io

    from obs_rvc_tpu.serve.ws import server_handshake

    rin = io.BytesIO(b"GET / HTTP/1.1\r\nHost: x\r\n\r\n")
    rout = io.BytesIO()
    with pytest.raises(ValueError):
        server_handshake(rin, rout)
    assert rout.getvalue().startswith(b"HTTP/1.1 400")


def test_server_entry_builds_pipeline_from_flags():
    from obs_rvc_tpu.serve.server import build_parser, build_pipeline

    args = build_parser().parse_args(
        ["--skip-inference", "--pitch-shift", "4", "--loudness-factor", "0.7",
         "--sample-length", "0.10", "--extra-inference-time", "0.5",
         "--dtype", "float32"]
    )
    pipe, params, controls = build_pipeline(args)
    assert pipe.cfg.skip_inference
    assert float(controls.pitch_shift) == 4.0
    assert abs(float(controls.rms_mix_rate) - 0.7) < 1e-6


def test_engine_pipeline_for_forwards_launch_options():
    """A per-geometry pipeline must be the launch pipeline at a different
    geometry, nothing else (ADVICE r2: a crepe/bf16 engine built rmvpe/f32
    per-geometry pipelines — KeyError 'rmvpe' on any non-launch request)."""
    import jax.numpy as jnp

    from obs_rvc_tpu.models.crepe import CrepeConfig

    cfg = small_cfg()
    pipe = RvcPipeline(
        cfg,
        pitch_algorithm="crepe",
        crepe_cfg=CrepeConfig(capacity="tiny"),
        compute_dtype=jnp.bfloat16,
        phase_vocoder=True,
        f0_median_radius=5,
        pallas_resblocks=False,
    )
    eng = RvcEngine(pipe, pipe.init_params_fast())

    cfg2 = ChunkConfig.build(
        sample_rate=48000, sample_length=0.20, extra_inference_time=0.30
    )
    key = (cfg2.input_buffer_16k_size, cfg2.sample_frame_16k_size,
           cfg2.skip_head, cfg2.return_length)
    p2 = eng._pipeline_for(key)
    assert p2 is not pipe
    assert p2.pitch_algorithm == "crepe"
    assert p2.crepe_cfg.capacity == "tiny"
    assert p2.contentvec_cfg.dtype == jnp.bfloat16
    assert p2.synth_cfg.dtype == jnp.bfloat16
    assert p2.phase_vocoder is True
    assert p2.f0_median_radius == 5
    assert p2.synth_cfg.pallas_resblocks is False

    # and the non-launch geometry actually serves (params hold 'crepe')
    out = eng.infer(
        np.zeros(cfg2.input_buffer_16k_size, np.float32),
        cfg2.sample_frame_16k_size, 0, cfg2.skip_head, cfg2.return_length,
    )
    assert out.shape == (cfg2.return_length * cfg.model_sample_rate // 100,)
    assert np.isfinite(out).all()


def test_stream_pool_default_controls_applied():
    """Pool slots start from the pool's default controls (the server's CLI
    flags), not StepControls.default() (ADVICE r2: --pitch-shift etc. were
    silently ignored in --pool mode until a client pushed TAG_CONTROL)."""
    from obs_rvc_tpu.stream import StreamPool, StepControls

    cfg = small_cfg(skip_inference=True)
    ctl = StepControls.default(pitch_shift=4.0, rms_mix_rate=0.7, sid=2)
    pool = StreamPool(RvcPipeline(cfg), params={}, capacity=2, default_controls=ctl)
    s = pool.attach()
    assert float(pool._controls[s].pitch_shift) == 4.0
    assert abs(float(pool._controls[s].rms_mix_rate) - 0.7) < 1e-6
    assert int(pool._controls[s].sid) == 2
    # explicit per-connection controls still win
    s2 = pool.attach(StepControls.default(pitch_shift=-2.0))
    assert float(pool._controls[s2].pitch_shift) == -2.0


# ---------- streaming-state snapshot / resume ----------
#
# The reference zeroes all streaming state on restart (clear_state,
# obs-rvc/src/lib.rs:906-913), so a respawn costs a ~2 s context warm-up
# glitch. StreamState.to_bytes/from_bytes carries the context instead; the
# gate is bit-identical continuation after a serialize → fresh pipeline →
# resume cycle.

def test_stream_state_bytes_roundtrip():
    import jax.numpy as jnp

    from obs_rvc_tpu.stream import StreamState

    cfg = small_cfg()
    rng = np.random.default_rng(11)
    state = StreamState(
        input_buffer=jnp.asarray(rng.standard_normal(cfg.input_buffer_size), jnp.float32),
        input_buffer_16k=jnp.asarray(rng.standard_normal(cfg.input_buffer_16k_size), jnp.float32),
        sola_buffer=jnp.asarray(rng.standard_normal(cfg.sola_buffer_frame_size), jnp.float32),
        cache_pitchf=jnp.asarray(rng.standard_normal(cfg.pitch_cache_len), jnp.float32),
    )
    back = StreamState.from_bytes(state.to_bytes())
    for name in ("input_buffer", "input_buffer_16k", "sola_buffer", "cache_pitchf"):
        a, b = np.asarray(getattr(state, name)), np.asarray(getattr(back, name))
        assert b.dtype == np.float32
        np.testing.assert_array_equal(a, b)


def test_stream_resume_drill_bit_identical():
    """Stream 6 chunks; separately stream 3, serialize, rebuild the pipeline
    object from scratch (fresh jits — a restarted process), resume, stream
    the other 3: outputs must be BIT-identical to the uninterrupted run."""
    import jax.numpy as jnp

    from obs_rvc_tpu.stream import StreamState

    cfg = small_cfg()
    pipe = RvcPipeline(cfg)
    params = pipe.init_params_fast()
    controls = StepControls.default(pitch_shift=3.0, rms_mix_rate=0.4)
    rng = np.random.default_rng(7)
    chunks = [
        (0.1 * rng.standard_normal(cfg.sample_frame_size)).astype(np.float32)
        for _ in range(6)
    ]

    state = StreamState.init(cfg)
    outs = []
    for c in chunks:
        state, o = pipe.jit_step(params, state, jnp.asarray(c), controls)
        outs.append(np.asarray(o))

    state1 = StreamState.init(cfg)
    for c in chunks[:3]:
        state1, _ = pipe.jit_step(params, state1, jnp.asarray(c), controls)
    blob = state1.to_bytes()

    pipe2 = RvcPipeline(cfg)  # fresh object: new executables, same math
    state2 = StreamState.from_bytes(blob)
    for i, c in enumerate(chunks[3:]):
        state2, o = pipe2.jit_step(params, state2, jnp.asarray(c), controls)
        np.testing.assert_array_equal(np.asarray(o), outs[3 + i])


def test_stream_session_snapshot_resume():
    """Session-level drill: N chunks through one session, snapshot, build a
    NEW session over a NEW pipeline, restore, continue — output identical to
    one uninterrupted session. Also: geometry mismatch is rejected."""
    from obs_rvc_tpu.stream import StreamSession

    cfg = small_cfg()
    pipe = RvcPipeline(cfg, pallas_resblocks=False)
    params = pipe.init_params_fast()
    controls = StepControls.default(pitch_shift=2.0)
    rng = np.random.default_rng(8)
    wav = (0.1 * rng.standard_normal(6 * cfg.sample_frame_size)).astype(np.float32)

    def run(sessions_split):
        out = []
        s = StreamSession(RvcPipeline(cfg, pallas_resblocks=False), params, controls)
        for i in range(6):
            if i == sessions_split:
                blob = s.snapshot()
                s = StreamSession(RvcPipeline(cfg, pallas_resblocks=False), params, controls)
                s.restore(blob)
            s.push_audio(wav[i * cfg.sample_frame_size : (i + 1) * cfg.sample_frame_size])
            assert s.process_pending() == 1
            out.append(s.pull_audio(cfg.sample_frame_size))
        return np.concatenate(out)

    uninterrupted = run(sessions_split=None)
    resumed = run(sessions_split=3)
    np.testing.assert_array_equal(uninterrupted, resumed)

    # wrong-geometry snapshot is rejected up front, not at step time
    other = StreamSession(
        RvcPipeline(ChunkConfig.build(sample_rate=48000, sample_length=0.20,
                                      extra_inference_time=0.30)),
        params, controls,
    )
    s = StreamSession(RvcPipeline(cfg), params, controls)
    with pytest.raises(ValueError, match="geometry mismatch"):
        other.restore(s.snapshot())


def test_engine_exec_cache_restart(tmp_path):
    """RvcEngine(exec_cache=True): a restarted engine (fresh process) reuses
    the persisted per-geometry executable — the deterministic replacement
    for the reference's ONNX EP engine/timing caches (models.rs:14-17,57).

    Runs in a 1-device CPU subprocess (the XLA:CPU AOT loader mis-addresses
    the suite's 8 virtual devices on deserialize; single-chip TPU is fine —
    validated on-chip, BENCHMARKS.md "compile behavior")."""
    import os
    import subprocess
    import sys
    import textwrap

    prog = textwrap.dedent(
        """
        import sys

        import numpy as np

        from obs_rvc_tpu.config import ChunkConfig
        from obs_rvc_tpu.stream import RvcPipeline
        from obs_rvc_tpu.stream.engine import RvcEngine

        cfg = ChunkConfig.build(
            sample_rate=48000, sample_length=0.10, extra_inference_time=0.50
        )
        pipe = RvcPipeline(cfg)
        params = pipe.init_params_fast()
        rng = np.random.default_rng(0)
        buf = (rng.standard_normal(cfg.input_buffer_16k_size) * 0.1).astype(
            np.float32
        )

        eng1 = RvcEngine(pipe, params, exec_cache=True)
        out1 = eng1.infer(buf, cfg.sample_frame_16k_size, 0, cfg.skip_head,
                          cfg.return_length)
        # "restart": a fresh engine object with an empty in-memory cache —
        # its first infer takes the disk-hit path through cached_compile
        eng2 = RvcEngine(pipe, params, exec_cache=True)
        eng2.cache_pitchf = eng1.cache_pitchf * 0  # reset state like eng1 had
        eng1b = RvcEngine(pipe, params, exec_cache=False)
        out_ref = eng1b.infer(buf, cfg.sample_frame_16k_size, 0, cfg.skip_head,
                              cfg.return_length)
        out2 = eng2.infer(buf, cfg.sample_frame_16k_size, 0, cfg.skip_head,
                          cfg.return_length)
        np.testing.assert_allclose(out2, out_ref, atol=1e-5, rtol=1e-5)
        np.testing.assert_allclose(out1, out_ref, atol=1e-5, rtol=1e-5)
        print("engine-exec-cache-ok")
        """
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        OBS_RVC_EXEC_CACHE_DIR=str(tmp_path),
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    out = subprocess.run(
        [sys.executable, "-c", prog],
        env=env, capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "engine-exec-cache-ok" in out.stdout
    assert list(tmp_path.glob("*.exe.pkl")), "no executable persisted"


def test_stream_session_fused_exec_cache(tmp_path, monkeypatch):
    """Fused-mode session with exec_cache: output matches the staged session
    and the compiled executable is persisted to disk (serve.server
    --step-mode fused --exec-cache). The disk-hit path is covered by
    test_engine_exec_cache_restart (1-device subprocess — the 8-virtual-
    device CPU AOT loader can't execute deserialized programs)."""
    monkeypatch.setenv("OBS_RVC_EXEC_CACHE_DIR", str(tmp_path))
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)

    rng = np.random.default_rng(5)
    n = 3 * cfg.sample_frame_size
    wav = (rng.standard_normal(n) * 0.1).astype(np.float32)

    outs = {}
    for mode, cache in (("staged", False), ("fused", True)):
        sess = StreamSession(pipe, params={}, mode=mode, exec_cache=cache)
        sess.push_audio(wav)
        sess.process_pending(max_chunks=3)
        outs[mode] = sess.pull_audio(n)
        assert sess.metrics.snapshot().errors == 0

    np.testing.assert_allclose(outs["fused"], outs["staged"], atol=1e-6)
    assert list(tmp_path.glob("*.exe.pkl")), "fused executable not persisted"
