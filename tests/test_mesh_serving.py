"""Mesh-aware serving: the StreamPool (and the duplex server on top of it)
riding the ('data','model') mesh must reproduce the single-device pool.

This is the serving-surface half of BASELINE config 5 ("64 concurrent
voices, data-parallel pod slice") — the jit layer was already proven in
test_parallel.py; here the full chain client → pool tick → sharded batched
step → sharded resident StreamState carried across ticks runs on the
8-device virtual CPU mesh. The reference's analog is its single worker
thread (`obs-rvc/src/lib.rs:797-857`); it has no multi-device story at all.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from obs_rvc_tpu.config import ChunkConfig, RvcModelVersion
from obs_rvc_tpu.models import ContentVecConfig, RMVPEConfig, SynthesizerConfig
from obs_rvc_tpu.parallel import make_mesh, parse_mesh_spec
from obs_rvc_tpu.stream import RvcPipeline, StreamPool

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


def small_cfg(**kw):
    return ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50, **kw
    )


def tiny_pipeline(cfg):
    return RvcPipeline(
        cfg,
        RvcModelVersion.V2,
        contentvec_cfg=ContentVecConfig(
            dim=64, num_layers=2, tap_layer=2, num_heads=4, ffn_dim=128, out_dim=64
        ),
        rmvpe_cfg=RMVPEConfig(n_blocks=1, inter_layers=1, en_out_channels=2, gru_hidden=16),
        synth_cfg=SynthesizerConfig.for_sample_rate(40000, feature_dim=64),
    )


def test_parse_mesh_spec():
    mesh = parse_mesh_spec("data=4,model=2")
    assert mesh.shape == {"data": 4, "model": 2}
    assert parse_mesh_spec("model=2").shape == {"data": 4, "model": 2}
    assert parse_mesh_spec("data=-1,model=4").shape == {"data": 2, "model": 4}
    with pytest.raises(ValueError):
        parse_mesh_spec("rows=2")
    with pytest.raises(ValueError):
        parse_mesh_spec("data")


def test_pool_mesh_validation():
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    with pytest.raises(ValueError, match="divisible"):
        StreamPool(pipe, params={}, capacity=3, mesh=make_mesh(n_data=4, n_model=2))
    from jax.sharding import Mesh

    bad = Mesh(np.asarray(jax.devices()[:4]).reshape(4), ("rows",))
    with pytest.raises(ValueError, match="axes"):
        StreamPool(pipe, params={}, capacity=4, mesh=bad)


def _drive_pool(pool, wavs, n_chunks, starve=None):
    """Feed per-slot waveforms chunk-by-chunk through direct ticks, with one
    slot starved for a few ticks mid-stream; return per-slot outputs."""
    chunk = pool.pipeline.cfg.sample_frame_size
    slots = [pool.attach() for _ in wavs]
    fed = [0] * len(wavs)
    ticks = 0
    while min(fed) < n_chunks:
        for k, s in enumerate(slots):
            starving = (
                starve is not None
                and k == starve[0]
                and fed[k] == starve[1]
                and ticks < starve[2]
            )
            if not starving and fed[k] < n_chunks:
                pool.push_audio(s, wavs[k][fed[k] * chunk : (fed[k] + 1) * chunk])
                fed[k] += 1
        ticks += 1
        pool.process_pending()
    return [pool.pull_audio(s, n_chunks * chunk) for s in slots]


def test_stream_pool_mesh_matches_single_device():
    """Real (tiny-dim) model, staged mode: a 4x2-mesh pool with TP-sharded
    params and data-sharded resident state must reproduce the single-device
    pool bit-for-bit up to TP reduction order — including across a starved
    tick and a mid-run attach (state stays sharded across ticks)."""
    cfg = small_cfg()
    pipe = tiny_pipeline(cfg)
    params = pipe.init_params_fast(0)
    chunk = cfg.sample_frame_size
    n_chunks = 4
    rng = np.random.default_rng(3)
    wavs = [
        (rng.standard_normal(n_chunks * chunk) * 0.1).astype(np.float32)
        for _ in range(2)
    ]

    ref = _drive_pool(
        StreamPool(pipe, params, capacity=4), wavs, n_chunks, starve=(0, 2, 2)
    )

    mesh = make_mesh(n_data=4, n_model=2)
    pool = StreamPool(pipe, params, capacity=4, mesh=mesh)
    # the resident batched state must actually live sharded on the mesh
    leaf = jax.tree.leaves(pool._states)[0]
    assert not leaf.sharding.is_fully_replicated
    got = _drive_pool(pool, wavs, n_chunks, starve=(0, 2, 2))

    for r, g in zip(ref, got):
        assert r.size == g.size == n_chunks * chunk
        np.testing.assert_allclose(g, r, atol=2e-4)

    # attach after traffic: the scatter-reset must keep the state sharded
    extra = pool.attach()
    leaf = jax.tree.leaves(pool._states)[0]
    assert not leaf.sharding.is_fully_replicated
    pool.detach(extra)


def test_stream_pool_mesh_fused_exec_cache(tmp_path, monkeypatch):
    """Fused mode on the mesh (one monolithic sharded executable per tick)
    matches mesh-staged, and the executable persists/reloads through the
    exec cache with mesh shardings in the key."""
    monkeypatch.setenv("OBS_RVC_EXEC_CACHE_DIR", str(tmp_path))
    cfg = small_cfg(skip_inference=True)
    pipe = RvcPipeline(cfg)
    chunk = cfg.sample_frame_size
    n_chunks = 3
    rng = np.random.default_rng(11)
    wavs = [(rng.standard_normal(n_chunks * chunk) * 0.1).astype(np.float32)]

    mesh = make_mesh(n_data=4, n_model=2)
    staged = _drive_pool(
        StreamPool(pipe, params={}, capacity=4, mesh=mesh), wavs, n_chunks
    )
    fused = _drive_pool(
        StreamPool(pipe, params={}, capacity=4, mesh=mesh, mode="fused",
                   exec_cache=True),
        wavs, n_chunks,
    )
    np.testing.assert_allclose(fused[0], staged[0], atol=1e-6)
    assert list(tmp_path.glob("*.exe.pkl")), "mesh pool executable not persisted"

    # second pool: warm start from the serialized sharded executable
    pool2 = StreamPool(pipe, params={}, capacity=4, mesh=mesh, mode="fused",
                       exec_cache=True)
    again = _drive_pool(pool2, wavs, n_chunks)
    np.testing.assert_allclose(again[0], staged[0], atol=1e-6)


def test_stream_server_on_mesh_pool():
    """VERDICT r3 item 1's done-bar: real audio streamed through
    stream_server with mesh=4x2, output parity with the single-device pool.
    Output is a pure function of the input prefix (starved slots freeze), so
    the first n_chunks of output compare deterministically even though tick
    timing differs between runs."""
    import socket as socket_mod
    import threading
    import time as time_mod

    from obs_rvc_tpu.serve.stream_server import (
        StreamClient,
        _PoolSlotAdapter,
        serve_connection,
    )

    cfg = small_cfg()
    pipe = tiny_pipeline(cfg)
    params = pipe.init_params_fast(0)
    chunk = cfg.sample_frame_size
    n_chunks = 4
    sr = cfg.sample_rate
    t = np.arange(n_chunks * chunk) / sr
    wavs = [
        (0.2 * np.sin(2 * np.pi * f * t)).astype(np.float32) for f in (330.0, 550.0)
    ]

    def run(mesh):
        pool = StreamPool(pipe, params, capacity=4, mesh=mesh)
        pool.start()
        clients = []
        for _ in wavs:
            ssock, csock = socket_mod.socketpair()
            adapter = _PoolSlotAdapter(pool, pool.attach())
            threading.Thread(
                target=serve_connection,
                args=(adapter, ssock.makefile("rb"), ssock.makefile("wb")),
                daemon=True,
            ).start()
            clients.append(StreamClient(csock.makefile("rb"), csock.makefile("wb")))
        outs = [[] for _ in clients]
        for i in range(0, n_chunks * chunk, chunk):
            for c, client in enumerate(clients):
                outs[c].append(client.send_audio(wavs[c][i : i + chunk]))
            time_mod.sleep(0.002)
        deadline = time_mod.time() + 120
        while (
            min(sum(o.size for o in outs[c]) for c in range(len(clients)))
            < n_chunks * chunk
            and time_mod.time() < deadline
        ):
            time_mod.sleep(0.02)
            for c, client in enumerate(clients):
                outs[c].append(client.send_audio(np.zeros(chunk, np.float32)))
        for client in clients:
            client.close()
        pool.stop()
        return [np.concatenate(o)[: n_chunks * chunk] for o in outs]

    ref = run(mesh=None)
    got = run(mesh=make_mesh(n_data=4, n_model=2))
    for c in range(len(wavs)):
        assert got[c].size == n_chunks * chunk
        np.testing.assert_allclose(got[c], ref[c], atol=2e-4)
