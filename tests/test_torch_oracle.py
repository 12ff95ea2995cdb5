"""Full-model torch-oracle parity gates (VERDICT round-1 item 1).

Each of the three networks is run end-to-end against an independent PyTorch
implementation of the upstream architecture (``tests/torch_oracles.py``),
with weights flowing through the production export path
(``models.weights.export_*`` → ``load_state_dict(strict=True)``). This is
the gate the reference implements with its golden ``feats.npy`` fixture
(``rvc/src/tests/hubert.rs:11-19``) but for all three nets and without
needing real checkpoints: a wiring bug in attention plumbing, flow
ordering, or NSF phase handling produces O(1) errors and cannot pass.

``strict=True`` loading additionally proves the export/import surface is
key-complete against the upstream state-dict layout.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from obs_rvc_tpu.models import (
    ContentVec,
    ContentVecConfig,
    RMVPE,
    RMVPEConfig,
    Synthesizer,
    SynthesizerConfig,
)
from obs_rvc_tpu.models import weights as W

from torch_oracles import TorchContentVec, TorchRMVPE, TorchSynthesizer

torch.manual_seed(0)


def _randomize(variables, seed=0):
    """Perturb every leaf so degenerate inits (LN scale=1, bias=0, BN
    stats) can't mask copy/transpose bugs; keeps BN variances positive."""
    rng = np.random.default_rng(seed)

    def fill(path, leaf):
        name = jax.tree_util.keystr(path)
        arr = np.asarray(leaf, np.float32)
        if "batch_stats" in name and "var" in name:
            return rng.uniform(0.5, 1.5, arr.shape).astype(np.float32)
        if "scale" in name:
            return (1.0 + 0.2 * rng.standard_normal(arr.shape)).astype(np.float32)
        if "bias" in name or ("batch_stats" in name and "mean" in name):
            return (0.1 * rng.standard_normal(arr.shape)).astype(np.float32)
        return arr  # model-init random weights

    return jax.tree_util.tree_map_with_path(fill, variables)


def _load(oracle: torch.nn.Module, sd: dict) -> torch.nn.Module:
    """strict load modulo torch's BatchNorm ``num_batches_tracked`` counters
    (bookkeeping buffers with no numerical effect in eval)."""
    result = oracle.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=False,
    )
    assert not result.unexpected_keys, f"unexpected: {result.unexpected_keys}"
    real_missing = [k for k in result.missing_keys if not k.endswith("num_batches_tracked")]
    assert not real_missing, f"missing: {real_missing}"
    return oracle.eval()


# ---------------------------------------------------------------------------
# ContentVec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "version,gelu_approximate",
    [("v1", True), ("v2", True), ("v2", False)],
)
def test_contentvec_full_model_parity(version, gelu_approximate):
    """Gates both GELU flavors: tanh (serving default) and exact erf
    (fairseq semantics) — each against torch with the matching
    ``approximate=`` setting, so the gate stays exact either way."""
    cfg = ContentVecConfig.v1() if version == "v1" else ContentVecConfig.v2()
    cfg = dataclasses.replace(cfg, gelu_approximate=gelu_approximate)
    model = ContentVec(cfg)
    wav = np.random.default_rng(1).standard_normal((1, 16000)).astype(np.float32) * 0.1

    variables = _randomize(model.init(jax.random.PRNGKey(0), jnp.asarray(wav)))
    sd = W.export_contentvec(variables, cfg.num_layers, cfg.num_heads,
                             final_proj=cfg.final_proj)
    oracle = _load(
        TorchContentVec(
            num_layers=cfg.num_layers,
            dim=cfg.dim,
            heads=cfg.num_heads,
            ffn=cfg.ffn_dim,
            final_proj_dim=cfg.out_dim if cfg.final_proj else None,
            gelu="tanh" if gelu_approximate else "none",
        ),
        sd,
    )

    got = np.asarray(model.apply(variables, jnp.asarray(wav)))
    with torch.no_grad():
        want = oracle(torch.from_numpy(wav)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# RMVPE
# ---------------------------------------------------------------------------


def test_rmvpe_full_model_parity():
    cfg = RMVPEConfig()
    model = RMVPE(cfg)
    mel = np.random.default_rng(2).standard_normal((1, 128, 32)).astype(np.float32)

    variables = _randomize(model.init(jax.random.PRNGKey(0), jnp.asarray(mel)))
    sd = W.export_rmvpe(variables, cfg.n_blocks, cfg.en_de_layers, cfg.inter_layers)
    oracle = _load(TorchRMVPE(cfg.n_blocks, cfg.en_de_layers, cfg.inter_layers,
                              cfg.en_out_channels), sd)

    got = np.asarray(model.apply(variables, jnp.asarray(mel)))
    with torch.no_grad():
        want = oracle(torch.from_numpy(mel)).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Synthesizer — all three generator geometries, v1/v2 feature widths
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("sr,feature_dim", [(32000, 768), (40000, 768), (48000, 768),
                                            (40000, 256)])
def test_synthesizer_full_model_parity(sr, feature_dim):
    cfg = SynthesizerConfig.for_sample_rate(sr, feature_dim=feature_dim)
    model = Synthesizer(cfg)
    T = 20
    rng = np.random.default_rng(3)
    phone = rng.standard_normal((1, T, feature_dim)).astype(np.float32)
    pitch = rng.integers(1, 256, (1, T)).astype(np.int32)
    pitchf = np.where(
        rng.uniform(size=(1, T)) < 0.2, 0.0, rng.uniform(80.0, 400.0, (1, T))
    ).astype(np.float32)
    rnd = rng.standard_normal((1, T, cfg.inter_channels)).astype(np.float32)
    sid = np.array([5], np.int32)

    variables = _randomize(
        model.init(jax.random.PRNGKey(0), jnp.asarray(phone), jnp.asarray(pitch),
                   jnp.asarray(pitchf), jnp.asarray(sid))
    )
    sd = W.export_synthesizer(variables, cfg)
    oracle = _load(
        TorchSynthesizer(
            feature_dim=feature_dim,
            inter_channels=cfg.inter_channels,
            hidden_channels=cfg.hidden_channels,
            filter_channels=cfg.filter_channels,
            n_heads=cfg.n_heads,
            n_layers=cfg.n_layers,
            kernel_size=cfg.kernel_size,
            window=cfg.attn_window,
            resblock_kernel_sizes=cfg.resblock_kernel_sizes,
            resblock_dilation_sizes=cfg.resblock_dilation_sizes,
            upsample_rates=cfg.upsample_rates,
            upsample_initial_channel=cfg.upsample_initial_channel,
            upsample_kernel_sizes=cfg.upsample_kernel_sizes,
            spk_embed_dim=cfg.spk_embed_dim,
            gin_channels=cfg.gin_channels,
            sr=sr,
            flow_flows=cfg.flow_flows,
            flow_layers=cfg.flow_layers,
            flow_kernel=cfg.flow_kernel,
        ),
        sd,
    )

    got = np.asarray(
        model.apply(variables, jnp.asarray(phone), jnp.asarray(pitch),
                    jnp.asarray(pitchf), jnp.asarray(sid), jnp.asarray(rnd))
    )
    with torch.no_grad():
        want = oracle.infer(
            torch.from_numpy(phone),
            torch.from_numpy(pitch.astype(np.int64)),
            torch.from_numpy(pitchf),
            torch.from_numpy(sid.astype(np.int64)),
            torch.from_numpy(rnd.transpose(0, 2, 1)),
        )[:, 0, :].numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=1e-3)


# ---------------------------------------------------------------------------
# CREPE (beyond-reference pitch algorithm)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("capacity", ["full", "tiny"])
def test_crepe_full_model_parity(capacity):
    from obs_rvc_tpu.models import Crepe, CrepeConfig
    from torch_oracles import TorchCrepe

    model = Crepe(CrepeConfig(capacity=capacity))
    frames = np.random.default_rng(2).standard_normal((6, 1024)).astype(np.float32)

    variables = _randomize(model.init(jax.random.PRNGKey(0), jnp.asarray(frames)))
    ours = np.asarray(model.apply(variables, jnp.asarray(frames)))

    oracle = _load(TorchCrepe(capacity), W.export_crepe(variables))
    with torch.no_grad():
        ref = oracle(torch.from_numpy(frames)).numpy()

    assert ours.shape == ref.shape == (6, 360)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_crepe_frame_extraction_matches_torchcrepe_preprocess():
    """extract_crepe_frames == torchcrepe.preprocess semantics: centered
    1024 windows at hop 160, mean-centered, unbiased-std normalized."""
    from obs_rvc_tpu.models.crepe import extract_crepe_frames

    rng = np.random.default_rng(3)
    x = rng.standard_normal(3200).astype(np.float32) * 0.3
    n_frames = 20
    got = np.asarray(extract_crepe_frames(jnp.asarray(x), n_frames))

    padded = np.pad(x, (512, 512))
    for t in range(n_frames):
        fr = padded[t * 160 : t * 160 + 1024].astype(np.float64)
        fr = fr - fr.mean()
        fr = fr / max(fr.std(ddof=1), 1e-10)
        np.testing.assert_allclose(got[t], fr, atol=1e-4)


def test_crepe_pipeline_pitch_on_tone():
    """End-to-end: a CREPE-pipeline step runs and its decode grid matches
    RMVPE's (same cents mapping, same cache geometry)."""
    from obs_rvc_tpu.config import ChunkConfig
    from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState

    cfg = ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50
    )
    pipe = RvcPipeline(cfg, pitch_algorithm="crepe",
                       crepe_cfg=None)
    assert pipe.pitch_algorithm == "crepe"
    params = pipe.init_params(jax.random.PRNGKey(0))
    assert "crepe" in params and "rmvpe" not in params
    state = StreamState.init(cfg)
    chunk = jnp.asarray(
        np.sin(2 * np.pi * 220.0 * np.arange(cfg.sample_frame_size) / 48000)
        .astype(np.float32)
    )
    new_state, out = pipe.staged_step(params, state, chunk, StepControls.default())
    assert out.shape == (cfg.sample_frame_size,)
    assert np.isfinite(np.asarray(out)).all()
    # staged and fused agree in crepe mode too
    new_state_f, out_f = jax.jit(pipe.step)(params, state, chunk, StepControls.default())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_f), atol=1e-4)


@pytest.mark.parametrize("dims", [(512, 6), (64, 2)])
def test_fcpe_full_model_parity(dims):
    from obs_rvc_tpu.models import Fcpe, FcpeConfig
    from torch_oracles import TorchFcpe

    hidden, n_layers = dims
    model = Fcpe(FcpeConfig(hidden=hidden, n_layers=n_layers))
    mel = np.random.default_rng(4).standard_normal((8, 128)).astype(np.float32)

    variables = _randomize(model.init(jax.random.PRNGKey(0), jnp.asarray(mel)))
    # weight-norm g inits to ones — perturb it so a dropped/misrouted g
    # cannot cancel out
    g = np.asarray(variables["params"]["output_proj"]["g"])
    variables["params"]["output_proj"]["g"] = (
        1.0 + 0.3 * np.random.default_rng(5).standard_normal(g.shape)
    ).astype(np.float32)
    ours = np.asarray(model.apply(variables, jnp.asarray(mel)))

    oracle = _load(
        TorchFcpe(hidden=hidden, n_layers=n_layers),
        W.export_fcpe(variables, n_layers=n_layers),
    )
    with torch.no_grad():
        ref = oracle(torch.from_numpy(mel)[None])[0].numpy()

    assert ours.shape == ref.shape == (8, 360)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_fcpe_decode_matches_torch():
    """decode_f0_fcpe == torchfcpe's clamped local-argmax decoder, including
    edge frames (argmax at bin 0/359) and unvoiced thresholding."""
    from obs_rvc_tpu.models.fcpe import decode_f0_fcpe, fcpe_cent_table
    from torch_oracles import TorchFcpe

    rng = np.random.default_rng(6)
    sal = rng.uniform(0.0, 1.0, (32, 360)).astype(np.float32) * 0.04
    sal[0, 0] = 0.9      # clamp at the low edge
    sal[1, 359] = 0.8    # clamp at the high edge
    sal[2, 100] = 0.7
    # rows 3.. mostly stay below the 0.05 threshold → unvoiced

    ours = np.asarray(decode_f0_fcpe(jnp.asarray(sal), threshold=0.05))
    table = torch.from_numpy(fcpe_cent_table())
    with torch.no_grad():
        ref = TorchFcpe.decode_local_argmax(
            None, torch.from_numpy(sal), table, threshold=0.05
        ).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-3)
    assert ours[0] > 0 and ours[1] > 0 and ours[2] > 0


def test_fcpe_pipeline_pitch_on_tone():
    """End-to-end fcpe-mode step: Slaney-mel frontend feeds the conformer
    net, staged and fused paths agree, params carry 'fcpe' only."""
    from obs_rvc_tpu.config import ChunkConfig
    from obs_rvc_tpu.models import FcpeConfig
    from obs_rvc_tpu.stream import RvcPipeline, StepControls, StreamState

    cfg = ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50
    )
    pipe = RvcPipeline(
        cfg, pitch_algorithm="fcpe", fcpe_cfg=FcpeConfig(hidden=64, n_layers=2)
    )
    params = pipe.init_params(jax.random.PRNGKey(0))
    assert "fcpe" in params and "rmvpe" not in params and "crepe" not in params
    state = StreamState.init(cfg)
    chunk = jnp.asarray(
        np.sin(2 * np.pi * 220.0 * np.arange(cfg.sample_frame_size) / 48000)
        .astype(np.float32)
    )
    new_state, out = pipe.staged_step(params, state, chunk, StepControls.default())
    assert out.shape == (cfg.sample_frame_size,)
    assert np.isfinite(np.asarray(out)).all()
    new_state_f, out_f = jax.jit(pipe.step)(params, state, chunk, StepControls.default())
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_f), atol=2e-4)


def test_fcpe_rejects_resonance_shift():
    from obs_rvc_tpu.config import ChunkConfig
    from obs_rvc_tpu.stream import RvcPipeline

    cfg = ChunkConfig.build(
        sample_rate=48000, sample_length=0.10, extra_inference_time=0.50
    )
    with pytest.raises(ValueError, match="resonance"):
        RvcPipeline(cfg, pitch_algorithm="fcpe", keyshift=2)
