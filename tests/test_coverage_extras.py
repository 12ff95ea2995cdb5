"""Coverage for remaining surfaces: CLI with retrieval, phase-vocoder
pipeline path, RPC stdio loop, global mesh helper, pool failure path."""

import io

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from obs_rvc_tpu.config import ChunkConfig
from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState


def small_cfg(**kw):
    return ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50, **kw
    )


def test_cli_with_index_and_metrics(tmp_path, capsys):
    from obs_rvc_tpu.serve.cli import main
    from obs_rvc_tpu.utils import read_wav, write_wav

    sr = 48000
    wav = (0.4 * np.sin(2 * np.pi * 220.0 * np.arange(sr) / sr)).astype(np.float32)
    write_wav(tmp_path / "in.wav", np.stack([wav, wav]), sr)  # stereo in

    # an .npy feature table as the index artifact
    table = np.random.default_rng(0).standard_normal((64, 768)).astype(np.float32)
    np.save(tmp_path / "voice.npy", table)

    main(
        [
            str(tmp_path / "in.wav"),
            str(tmp_path / "out.wav"),
            "--skip-inference",  # keep CPU cost small; index load still exercised
            "--index", str(tmp_path / "voice.npy"),
            "--index-rate", "0.5",
            "--sample-length", "0.10",
            "--extra-inference-time", "0.50",
            "--metrics-json",
        ]
    )
    out, out_sr = read_wav(tmp_path / "out.wav")
    assert out.shape[0] == 2 and out_sr == sr
    assert "rtf" in capsys.readouterr().err


def test_phase_vocoder_pipeline_tone():
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg, phase_vocoder=True)
    controls = StepControls.default()
    sr, f = 48000, 440.0
    n_chunks = 8
    wav = np.sin(2 * np.pi * f * np.arange(n_chunks * cfg.sample_frame_size) / sr).astype(
        np.float32
    )
    state = StreamState.init(cfg)
    outs = []
    for i in range(n_chunks):
        chunk = jnp.asarray(wav[i * cfg.sample_frame_size : (i + 1) * cfg.sample_frame_size])
        state, out = pipe.jit_step({}, state, chunk, controls)
        outs.append(np.asarray(out))
    tail = np.concatenate(outs)[3 * cfg.sample_frame_size :]
    spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
    peak_hz = np.argmax(spec) * sr / tail.size
    assert abs(peak_hz - f) < 5.0
    rms = np.sqrt(np.mean(tail**2))
    assert abs(rms - 1 / np.sqrt(2)) < 0.06


def test_rpc_stdio_loop():
    """serve_stream over in-memory pipes with a live (tiny) engine."""
    import struct

    from obs_rvc_tpu.models import ContentVecConfig, RMVPEConfig, SynthesizerConfig
    from obs_rvc_tpu.config import RvcModelVersion
    from obs_rvc_tpu.serve.rpc import serve_stream
    from obs_rvc_tpu.stream import RvcEngine

    cfg = small_cfg()
    pipe = RvcPipeline(
        cfg,
        RvcModelVersion.V2,
        contentvec_cfg=ContentVecConfig(
            dim=64, num_layers=2, tap_layer=2, num_heads=4, ffn_dim=128, out_dim=64
        ),
        rmvpe_cfg=RMVPEConfig(n_blocks=1, inter_layers=1, en_out_channels=2, gru_hidden=16),
        synth_cfg=SynthesizerConfig.for_sample_rate(40000, feature_dim=64),
    )
    engine = RvcEngine(pipe, pipe.init_params_fast(0))

    samples = np.zeros(cfg.input_buffer_16k_size, dtype="<f4")
    req = io.BytesIO()
    req.write(struct.pack("<I", samples.size))
    req.write(samples.tobytes())
    req.write(struct.pack("<IiII", cfg.sample_frame_16k_size, 0, cfg.skip_head, cfg.return_length))
    req.seek(0)
    resp = io.BytesIO()
    serve_stream(engine, req, resp)
    resp.seek(0)
    (n,) = struct.unpack("<I", resp.read(4))
    assert n == cfg.model_return_size


def test_global_mesh_helper():
    from obs_rvc_tpu.parallel import distributed

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = distributed.global_mesh(n_model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    assert distributed.local_stream_slots(mesh) >= 1


def test_pool_failure_resets_all_slots():
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    pool = StreamPool(pipe, params={}, capacity=2)
    s0 = pool.attach()

    def boom(*a, **k):
        raise RuntimeError("injected")

    pool.pipeline = type("P", (), {"cfg": cfg, "staged_step": staticmethod(boom)})()
    pool.push_audio(s0, np.ones(cfg.sample_frame_size, np.float32))
    assert pool.process_pending() == 1
    out = pool.pull_audio(s0, cfg.sample_frame_size)
    np.testing.assert_array_equal(out, 0.0)


def test_stream_server_on_pool():
    """Two duplex connections batched through one StreamPool."""
    import socket as socket_mod
    import threading
    import time as time_mod

    from obs_rvc_tpu.serve.stream_server import StreamClient, _PoolSlotAdapter, serve_connection
    from obs_rvc_tpu.stream import StreamPool

    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    # warm the batched staged step
    pool = StreamPool(pipe, params={}, capacity=2)
    pool.start()

    clients = []
    for _ in range(2):
        ssock, csock = socket_mod.socketpair()
        adapter = _PoolSlotAdapter(pool, pool.attach())
        threading.Thread(
            target=serve_connection,
            args=(adapter, ssock.makefile("rb"), ssock.makefile("wb")),
            daemon=True,
        ).start()
        clients.append(StreamClient(csock.makefile("rb"), csock.makefile("wb")))

    sr = 48000
    n = 6 * cfg.sample_frame_size
    t = np.arange(n) / sr
    wavs = [np.sin(2 * np.pi * f * t).astype(np.float32) for f in (330.0, 550.0)]

    outs = [[], []]
    frame = cfg.sample_frame_size
    for i in range(0, n, frame):
        for c, client in enumerate(clients):
            outs[c].append(client.send_audio(wavs[c][i : i + frame]))
        time_mod.sleep(0.005)
    deadline = time_mod.time() + 60
    while (
        min(sum(o.size for o in outs[c]) for c in range(2)) < 4 * cfg.sample_frame_size
        and time_mod.time() < deadline
    ):
        for c, client in enumerate(clients):
            outs[c].append(client.send_audio(np.zeros(frame, np.float32)))
        time_mod.sleep(0.01)
    for client in clients:
        client.close()
    pool.stop()

    for c, f in ((0, 330.0), (1, 550.0)):
        got = np.concatenate(outs[c])
        tail = got[2 * cfg.sample_frame_size : 4 * cfg.sample_frame_size]
        spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
        peak_hz = np.argmax(spec) * sr / tail.size
        assert abs(peak_hz - f) < 8.0, (c, peak_hz)


def test_health_endpoint():
    import urllib.request

    from obs_rvc_tpu.serve.health import start_health_server
    from obs_rvc_tpu.serve.metrics import ChunkMetrics

    m = ChunkMetrics(chunk_seconds=0.3)
    m.record(12.0)
    server, port = start_health_server(m)
    try:
        ok = urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz").read()
        assert ok == b"ok"
        import json as _json

        snap = _json.loads(urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics").read())
        assert snap["chunks"] == 1
        assert snap["p50_ms"] == 12.0
    finally:
        server.shutdown()


def test_exec_cache_manifest_fresh():
    """The COMMITTED exec-cache artifact must match the CURRENT sources.

    `.exec_cache/*.exe.pkl.gz` is a primed TPU executable committed so a
    fresh checkout (driver bench env) warm-starts bench.py. Its key hashes
    the traced-source files — an edit to any module in
    `exec_cache._TRACED_GLOBS` orphans the artifact SILENTLY (next bench
    falls back to a full remote compile). This test recomputes the digest
    on CPU from `.exec_cache/MANIFEST.json` (env parts captured on the TPU
    by scripts/exec_cache_manifest.py) and fails if the committed entry
    went stale: re-prime with `python bench.py` on the TPU, re-gzip, and
    re-run scripts/exec_cache_manifest.py.
    """
    import json
    import pathlib

    import jax.numpy as jnp

    from obs_rvc_tpu.config import StreamSettings
    from obs_rvc_tpu.stream import RvcPipeline
    from obs_rvc_tpu.utils import exec_cache as ec

    cache_dir = pathlib.Path(ec.DEFAULT_DIR)
    manifest_path = cache_dir / "MANIFEST.json"
    if not manifest_path.exists():
        import pytest

        pytest.skip("no committed exec-cache manifest")
    manifest = json.loads(manifest_path.read_text())
    assert manifest["entries"], "manifest exists but lists no entries"
    for entry in manifest["entries"]:
        # (a) the semantic key still matches a freshly-built pipeline
        # (pallas_resblocks=True + bf16 reproduces the TPU-resolved config)
        cfg = StreamSettings().chunk_config(48000)
        pipe = RvcPipeline(cfg, compute_dtype=jnp.bfloat16, pallas_resblocks=True)
        assert pipe.fingerprint() + "|jit_step" == entry["semantic_key"], (
            f"{entry['label']}: pipeline fingerprint drifted — the committed "
            "executable no longer matches the default bench config"
        )
        # (b) the full digest (incl. CURRENT traced-source hash) still names
        # the committed file
        digest = ec._digest(
            [entry["key_version"], "semantic", entry["semantic_key"],
             ec.traced_source_fingerprint()]
            + entry["env_parts"]
            + [entry["tag"]]
        )
        assert f"{digest}.exe.pkl.gz" == entry["file"], (
            f"{entry['label']}: traced sources changed since the artifact "
            "was primed — re-prime on the TPU (python bench.py), re-gzip, "
            "and re-run scripts/exec_cache_manifest.py"
        )
        assert (cache_dir / entry["file"]).exists(), (
            f"{entry['label']}: manifest names {entry['file']} but the "
            "artifact is not in the repo"
        )


def test_exec_cache_roundtrip(tmp_path):
    """cached_compile: miss compiles+persists, hit deserializes, outputs equal.

    Runs in a 1-device CPU subprocess: the XLA:CPU AOT loader mis-addresses
    the suite's 8 virtual devices on deserialize (execute_sharded wants 8
    shards despite single-device input shardings) — a CPU-loader quirk the
    single-chip TPU path does not have (scripts/exec_cache_probe.py is the
    on-chip drill).
    """
    import os
    import subprocess
    import sys
    import textwrap

    prog = textwrap.dedent(
        """
        import sys

        import jax
        import jax.numpy as jnp
        import numpy as np

        from obs_rvc_tpu.utils.exec_cache import cached_compile

        cache_dir = sys.argv[1]
        fn = jax.jit(lambda a, b: (a @ b).sum(axis=0) * 2.0)
        x = jnp.arange(12.0, dtype=jnp.float32).reshape(3, 4)
        y = jnp.ones((4, 5), jnp.float32) * 0.5

        exe1, status1 = cached_compile(fn, (x, y), cache_dir=cache_dir)
        assert status1 == "miss", status1
        want = np.asarray(exe1(x, y))

        exe2, status2 = cached_compile(fn, (x, y), cache_dir=cache_dir)
        assert status2 == "hit", status2
        np.testing.assert_array_equal(np.asarray(exe2(x, y)), want)

        # gzip fallback: a committed <entry>.exe.pkl.gz must serve a fresh
        # checkout (the driver's bench env resets to git-tracked state), and
        # the load rematerializes the raw form for later fast loads
        import gzip as _gzip
        import pathlib as _pl
        raw = next(_pl.Path(cache_dir).glob("*.exe.pkl"))
        gz = raw.with_name(raw.name + ".gz")
        gz.write_bytes(_gzip.compress(raw.read_bytes()))
        raw.unlink()
        exe2b, s2b = cached_compile(fn, (x, y), cache_dir=cache_dir)
        assert s2b == "hit", s2b
        np.testing.assert_array_equal(np.asarray(exe2b(x, y)), want)
        assert raw.exists(), "gz load must rematerialize the raw entry"

        # a different program must key differently (no false hits)
        fn3 = jax.jit(lambda a, b: (a @ b).sum(axis=0) * 3.0)
        exe3, status3 = cached_compile(fn3, (x, y), cache_dir=cache_dir)
        assert status3 == "miss", status3
        np.testing.assert_allclose(np.asarray(exe3(x, y)), want * 1.5, rtol=1e-6)

        # semantic-key scheme: a hit must need NO trace/lower at all — that
        # is the whole point (BENCH_r03: HLO-keyed lookups cost a 514 s
        # monolith lowering per process through the tunnel)
        exe4, s4 = cached_compile(fn, (x, y), cache_dir=cache_dir,
                                  semantic_key="prog-v1|test")
        assert s4 == "miss", s4

        class NoLower:
            def lower(self, *a, **k):
                raise AssertionError("semantic-key hit must not lower")

        exe5, s5 = cached_compile(NoLower(), (x, y), cache_dir=cache_dir,
                                  semantic_key="prog-v1|test")
        assert s5 == "hit", s5
        np.testing.assert_array_equal(np.asarray(exe5(x, y)), want)

        # different semantic key -> different entry (no false hits)
        exe6, s6 = cached_compile(fn3, (x, y), cache_dir=cache_dir,
                                  semantic_key="prog-v2|test")
        assert s6 == "miss", s6

        # args signature is still in the key: same semantic key, new shape
        x2 = jnp.ones((6, 4), jnp.float32)
        exe7, s7 = cached_compile(fn, (x2, y), cache_dir=cache_dir,
                                  semantic_key="prog-v1|test")
        assert s7 == "miss", s7

        # OBS_RVC_EXEC_CACHE_HLO_KEY forces the lowered-text scheme, which
        # finds the entry exe1 stored (same fn, same HLO)
        import os as _os
        _os.environ["OBS_RVC_EXEC_CACHE_HLO_KEY"] = "1"
        exe8, s8 = cached_compile(fn, (x, y), cache_dir=cache_dir,
                                  semantic_key="prog-v1|test")
        assert s8 == "hit", s8
        del _os.environ["OBS_RVC_EXEC_CACHE_HLO_KEY"]
        print("exec-cache-ok")
        """
    )
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
        XLA_FLAGS="--xla_force_host_platform_device_count=1",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    out = subprocess.run(
        [sys.executable, "-c", prog, str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "exec-cache-ok" in out.stdout
