"""End-to-end: RPC server over TCP with a live engine, and the CLI."""

import socket
import threading
import time

import numpy as np
import pytest
import jax

from obs_rvc_tpu.config import ChunkConfig, RvcModelVersion
from obs_rvc_tpu.stream import RvcEngine, RvcPipeline


def small_cfg(**kw):
    return ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50, **kw
    )


@pytest.mark.slow
def test_rpc_tcp_end_to_end():
    from obs_rvc_tpu.serve.rpc import RpcClient, serve_tcp

    cfg = small_cfg()
    pipe = RvcPipeline(cfg, RvcModelVersion.V2)
    engine = RvcEngine(pipe, pipe.init_params(jax.random.PRNGKey(0)))

    # pick a free port
    with socket.socket() as probe:
        probe.bind(("127.0.0.1", 0))
        port = probe.getsockname()[1]

    t = threading.Thread(target=serve_tcp, args=(engine, "127.0.0.1", port), daemon=True)
    t.start()
    for _ in range(50):
        try:
            client = RpcClient.connect_tcp("127.0.0.1", port)
            break
        except ConnectionRefusedError:
            time.sleep(0.1)
    else:
        pytest.fail("server did not come up")

    rng = np.random.default_rng(0)
    wav16 = (rng.standard_normal(cfg.input_buffer_16k_size) * 0.1).astype(np.float32)
    out = client.infer(
        wav16, cfg.sample_frame_16k_size, 12, cfg.skip_head, cfg.return_length
    )
    assert out.shape == (cfg.model_return_size,)
    assert np.isfinite(out).all()

    # second request exercises the sliding pitch cache on the server
    out2 = client.infer(
        wav16, cfg.sample_frame_16k_size, 12, cfg.skip_head, cfg.return_length
    )
    assert out2.shape == (cfg.model_return_size,)

    # geometry-mismatch request → error reply → client raises, server lives
    from obs_rvc_tpu.stream import EngineError

    with pytest.raises(EngineError):
        client.infer(wav16, 123, 0, cfg.skip_head, cfg.return_length)
    out3 = client.infer(
        wav16, cfg.sample_frame_16k_size, 0, cfg.skip_head, cfg.return_length
    )
    assert out3.shape == (cfg.model_return_size,)


def test_cli_skip_inference_roundtrip(tmp_path):
    from obs_rvc_tpu.serve.cli import main
    from obs_rvc_tpu.utils import read_wav, write_wav

    sr, f = 48000, 440.0
    n = 48000  # 1 s
    t = np.arange(n) / sr
    wav = (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)
    write_wav(tmp_path / "in.wav", wav, sr)

    main(
        [
            str(tmp_path / "in.wav"),
            str(tmp_path / "out.wav"),
            "--skip-inference",
            "--sample-length",
            "0.10",
            "--extra-inference-time",
            "0.50",
            "--loudness-factor",
            "1.0",
        ]
    )

    out, out_sr = read_wav(tmp_path / "out.wav")
    assert out_sr == sr
    assert out.shape[1] >= 8 * 4800
    tail = out[0, 3 * 4800 :]
    spec = np.abs(np.fft.rfft(tail * np.hanning(tail.size)))
    peak_hz = np.argmax(spec) * sr / tail.size
    assert abs(peak_hz - f) < 5.0


def test_synth_config_from_meta():
    from obs_rvc_tpu.models.checkpoints import synthesizer_config_from_meta

    # the RVC 40k v2 release config layout
    meta = {
        "config": [
            1025, 32, 192, 192, 768, 2, 6, 3, 0, "1",
            [3, 7, 11], [[1, 3, 5], [1, 3, 5], [1, 3, 5]],
            [10, 10, 2, 2], 512, [16, 16, 4, 4], 109, 256, "40k",
        ],
        "f0": 1,
        "version": "v2",
        "sr": "40k",
    }
    cfg = synthesizer_config_from_meta(meta)
    assert cfg.sample_rate == 40000
    assert cfg.upp == 400
    assert cfg.feature_dim == 768
    assert cfg.spk_embed_dim == 109

    # v1 32k without config list falls back to rate defaults
    cfg1 = synthesizer_config_from_meta({"sr": 32000, "version": "v1"})
    assert cfg1.sample_rate == 32000
    assert cfg1.feature_dim == 256
    assert cfg1.upp == 320


def test_cli_resonance_shift_reaches_pipeline(tmp_path):
    """--resonance-shift must actually change the output (it was once
    silently dropped between the flag and RvcPipeline(keyshift=...)), and
    must be rejected in combination with --pitch-algorithm crepe."""
    from obs_rvc_tpu.serve.cli import main
    from obs_rvc_tpu.utils import read_wav, write_wav

    sr = 48000
    rng = np.random.default_rng(0)
    wav = (0.2 * rng.standard_normal(sr)).astype(np.float32)
    write_wav(tmp_path / "in.wav", wav, sr)

    base = [
        str(tmp_path / "in.wav"), "", "--sample-length", "0.10",
        "--extra-inference-time", "0.50",
    ]
    base[1] = str(tmp_path / "a.wav")
    main(list(base))
    base[1] = str(tmp_path / "b.wav")
    main(list(base) + ["--resonance-shift", "2"])

    a, _ = read_wav(tmp_path / "a.wav")
    b, _ = read_wav(tmp_path / "b.wav")
    assert not np.allclose(a, b), "resonance shift had no effect"

    base[1] = str(tmp_path / "c.wav")
    with pytest.raises(ValueError, match="resonance shift"):
        main(list(base) + ["--resonance-shift", "2", "--pitch-algorithm", "crepe"])
