"""Full-model checkpoint conversion: synthetic state dicts in the exact
torch layouts (fairseq HuBERT / RMVPE E2E / RVC SynthesizerTrnMsNSFsid) are
converted and must match the Flax models' initialized trees leaf-for-leaf.

This validates converter key coverage and every layout transform end-to-end;
numerical parity of the primitives is covered in test_weights.py.
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
from obs_rvc_tpu.models import weights as W


def rnd(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


# ---------------------------------------------------------------------------
# fairseq HuBERT / ContentVec layout
# ---------------------------------------------------------------------------


def make_hubert_state_dict(rng, dim=768, layers=12, ffn=3072, final_proj_dim=None):
    sd = {}
    conv_defs = [(512, 10), (512, 3), (512, 3), (512, 3), (512, 3), (512, 2), (512, 2)]
    in_ch = 1
    for i, (out_ch, k) in enumerate(conv_defs):
        sd[f"feature_extractor.conv_layers.{i}.0.weight"] = rnd(rng, out_ch, in_ch, k)
        in_ch = out_ch
    sd["feature_extractor.conv_layers.0.2.weight"] = rnd(rng, 512)
    sd["feature_extractor.conv_layers.0.2.bias"] = rnd(rng, 512)
    sd["layer_norm.weight"] = rnd(rng, 512)
    sd["layer_norm.bias"] = rnd(rng, 512)
    sd["post_extract_proj.weight"] = rnd(rng, dim, 512)
    sd["post_extract_proj.bias"] = rnd(rng, dim)
    # weight-normed grouped pos conv (dim=2 for fairseq pos_conv weight norm,
    # but stored with weight_g/weight_v; fold handles the general case)
    sd["encoder.pos_conv.0.weight_v"] = rnd(rng, dim, dim // 16, 128)
    sd["encoder.pos_conv.0.weight_g"] = rnd(rng, dim, 1, 1) * 0.1 + 1.0
    sd["encoder.pos_conv.0.bias"] = rnd(rng, dim)
    sd["encoder.layer_norm.weight"] = rnd(rng, dim)
    sd["encoder.layer_norm.bias"] = rnd(rng, dim)
    for i in range(layers):
        p = f"encoder.layers.{i}"
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            sd[f"{p}.self_attn.{proj}.weight"] = rnd(rng, dim, dim)
            sd[f"{p}.self_attn.{proj}.bias"] = rnd(rng, dim)
        sd[f"{p}.self_attn_layer_norm.weight"] = rnd(rng, dim)
        sd[f"{p}.self_attn_layer_norm.bias"] = rnd(rng, dim)
        sd[f"{p}.fc1.weight"] = rnd(rng, ffn, dim)
        sd[f"{p}.fc1.bias"] = rnd(rng, ffn)
        sd[f"{p}.fc2.weight"] = rnd(rng, dim, ffn)
        sd[f"{p}.fc2.bias"] = rnd(rng, dim)
        sd[f"{p}.final_layer_norm.weight"] = rnd(rng, dim)
        sd[f"{p}.final_layer_norm.bias"] = rnd(rng, dim)
    if final_proj_dim:
        sd["final_proj.weight"] = rnd(rng, final_proj_dim, dim)
        sd["final_proj.bias"] = rnd(rng, final_proj_dim)
    return sd


@pytest.mark.parametrize("version", ["v1", "v2"])
def test_contentvec_conversion_shapes(version):
    rng = np.random.default_rng(0)
    if version == "v1":
        cfg = ContentVecConfig.v1()
        sd = make_hubert_state_dict(rng, layers=cfg.num_layers, final_proj_dim=256)
    else:
        cfg = ContentVecConfig.v2()
        sd = make_hubert_state_dict(rng, layers=cfg.num_layers)
    conv = W.convert_contentvec(sd, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                                final_proj=cfg.final_proj)

    model = ContentVec(cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3600)))
    W.assert_tree_shapes_match(conv, ref)

    # converted tree actually runs
    out = model.apply(jax.tree.map(jnp.asarray, conv), jnp.zeros((1, 3600)))
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# RMVPE E2E layout
# ---------------------------------------------------------------------------


def make_rmvpe_state_dict(rng, cfg: RMVPEConfig):
    # small weight scale — std-1 weights overflow f32 through 40+ conv layers
    def rnd(r, *shape):
        return (r.standard_normal(shape) * 0.05).astype(np.float32)

    sd = {}

    def bn(prefix, ch):
        sd[f"{prefix}.weight"] = rnd(rng, ch)
        sd[f"{prefix}.bias"] = rnd(rng, ch)
        sd[f"{prefix}.running_mean"] = rnd(rng, ch)
        sd[f"{prefix}.running_var"] = np.abs(rnd(rng, ch)) + 0.5

    def conv_block(prefix, cin, cout):
        sd[f"{prefix}.conv.0.weight"] = rnd(rng, cout, cin, 3, 3)
        bn(f"{prefix}.conv.1", cout)
        sd[f"{prefix}.conv.3.weight"] = rnd(rng, cout, cout, 3, 3)
        bn(f"{prefix}.conv.4", cout)
        if cin != cout:
            sd[f"{prefix}.shortcut.weight"] = rnd(rng, cout, cin, 1, 1)
            sd[f"{prefix}.shortcut.bias"] = rnd(rng, cout)

    def res_enc(prefix, cin, cout):
        for j in range(cfg.n_blocks):
            conv_block(f"{prefix}.conv.{j}", cin if j == 0 else cout, cout)

    bn("unet.encoder.bn", 1)
    ch = cfg.en_out_channels
    cin = 1
    for i in range(cfg.en_de_layers):
        res_enc(f"unet.encoder.layers.{i}", cin, ch)
        cin = ch
        ch *= 2
    for i in range(cfg.inter_layers):
        res_enc(f"unet.intermediate.layers.{i}", cin if i == 0 else ch, ch)
        cin = ch
    for i in range(cfg.en_de_layers):
        ch //= 2
        sd[f"unet.decoder.layers.{i}.conv1.0.weight"] = rnd(rng, ch * 2, ch, 3, 3)
        bn(f"unet.decoder.layers.{i}.conv1.1", ch)
        for j in range(cfg.n_blocks):
            conv_block(f"unet.decoder.layers.{i}.conv2.{j}", ch * 2 if j == 0 else ch, ch)

    sd["cnn.weight"] = rnd(rng, 3, cfg.en_out_channels, 3, 3)
    sd["cnn.bias"] = rnd(rng, 3)
    H = cfg.gru_hidden
    for suffix, _ in ((("",), 0), (("_reverse",), 1)):
        s = suffix[0]
        sd[f"fc.0.gru.weight_ih_l0{s}"] = rnd(rng, 3 * H, 3 * 128)
        sd[f"fc.0.gru.weight_hh_l0{s}"] = rnd(rng, 3 * H, H)
        sd[f"fc.0.gru.bias_ih_l0{s}"] = rnd(rng, 3 * H)
        sd[f"fc.0.gru.bias_hh_l0{s}"] = rnd(rng, 3 * H)
    sd["fc.1.weight"] = rnd(rng, 360, 2 * H)
    sd["fc.1.bias"] = rnd(rng, 360)
    return sd


def test_rmvpe_conversion_shapes():
    rng = np.random.default_rng(1)
    cfg = RMVPEConfig()
    sd = make_rmvpe_state_dict(rng, cfg)
    conv = W.convert_rmvpe(sd, n_blocks=cfg.n_blocks, en_de_layers=cfg.en_de_layers,
                           inter_layers=cfg.inter_layers)

    model = RMVPE(cfg)
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 128, 32)))
    W.assert_tree_shapes_match(conv, ref)

    out = model.apply(jax.tree.map(jnp.asarray, conv), jnp.zeros((1, 128, 32)))
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# RVC synthesizer layout
# ---------------------------------------------------------------------------


def make_synth_state_dict(rng, cfg: SynthesizerConfig):
    sd = {}
    C, H, F = cfg.inter_channels, cfg.hidden_channels, cfg.filter_channels
    half = C // 2

    sd["enc_p.emb_phone.weight"] = rnd(rng, H, cfg.feature_dim)
    sd["enc_p.emb_phone.bias"] = rnd(rng, H)
    sd["enc_p.emb_pitch.weight"] = rnd(rng, 256, H)
    head_dim = H // cfg.n_heads
    for i in range(cfg.n_layers):
        a = f"enc_p.encoder.attn_layers.{i}"
        for c in ("conv_q", "conv_k", "conv_v", "conv_o"):
            sd[f"{a}.{c}.weight"] = rnd(rng, H, H, 1)
            sd[f"{a}.{c}.bias"] = rnd(rng, H)
        sd[f"{a}.emb_rel_k"] = rnd(rng, 1, 2 * cfg.attn_window + 1, head_dim)
        sd[f"{a}.emb_rel_v"] = rnd(rng, 1, 2 * cfg.attn_window + 1, head_dim)
        sd[f"enc_p.encoder.norm_layers_1.{i}.gamma"] = rnd(rng, H)
        sd[f"enc_p.encoder.norm_layers_1.{i}.beta"] = rnd(rng, H)
        sd[f"enc_p.encoder.ffn_layers.{i}.conv_1.weight"] = rnd(rng, F, H, cfg.kernel_size)
        sd[f"enc_p.encoder.ffn_layers.{i}.conv_1.bias"] = rnd(rng, F)
        sd[f"enc_p.encoder.ffn_layers.{i}.conv_2.weight"] = rnd(rng, H, F, cfg.kernel_size)
        sd[f"enc_p.encoder.ffn_layers.{i}.conv_2.bias"] = rnd(rng, H)
        sd[f"enc_p.encoder.norm_layers_2.{i}.gamma"] = rnd(rng, H)
        sd[f"enc_p.encoder.norm_layers_2.{i}.beta"] = rnd(rng, H)
    sd["enc_p.proj.weight"] = rnd(rng, 2 * C, H, 1)
    sd["enc_p.proj.bias"] = rnd(rng, 2 * C)

    for fi in range(cfg.flow_flows):
        f = f"flow.flows.{2 * fi}"
        sd[f"{f}.pre.weight"] = rnd(rng, H, half, 1)
        sd[f"{f}.pre.bias"] = rnd(rng, H)
        sd[f"{f}.enc.cond_layer.weight_v"] = rnd(rng, 2 * H * cfg.flow_layers, cfg.gin_channels, 1)
        sd[f"{f}.enc.cond_layer.weight_g"] = np.abs(rnd(rng, 2 * H * cfg.flow_layers, 1, 1)) + 0.5
        sd[f"{f}.enc.cond_layer.bias"] = rnd(rng, 2 * H * cfg.flow_layers)
        for j in range(cfg.flow_layers):
            sd[f"{f}.enc.in_layers.{j}.weight_v"] = rnd(rng, 2 * H, H, cfg.flow_kernel)
            sd[f"{f}.enc.in_layers.{j}.weight_g"] = np.abs(rnd(rng, 2 * H, 1, 1)) + 0.5
            sd[f"{f}.enc.in_layers.{j}.bias"] = rnd(rng, 2 * H)
            rs = 2 * H if j < cfg.flow_layers - 1 else H
            sd[f"{f}.enc.res_skip_layers.{j}.weight_v"] = rnd(rng, rs, H, 1)
            sd[f"{f}.enc.res_skip_layers.{j}.weight_g"] = np.abs(rnd(rng, rs, 1, 1)) + 0.5
            sd[f"{f}.enc.res_skip_layers.{j}.bias"] = rnd(rng, rs)
        sd[f"{f}.post.weight"] = rnd(rng, half, H, 1)
        sd[f"{f}.post.bias"] = rnd(rng, half)

    U = cfg.upsample_initial_channel
    sd["dec.conv_pre.weight"] = rnd(rng, U, C, 7)
    sd["dec.conv_pre.bias"] = rnd(rng, U)
    sd["dec.cond.weight"] = rnd(rng, U, cfg.gin_channels, 1)
    sd["dec.cond.bias"] = rnd(rng, U)
    ch_in = U
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        ch = U // (2 ** (i + 1))
        sd[f"dec.ups.{i}.weight_v"] = rnd(rng, ch_in, ch, k)
        sd[f"dec.ups.{i}.weight_g"] = np.abs(rnd(rng, ch_in, 1, 1)) + 0.5
        sd[f"dec.ups.{i}.bias"] = rnd(rng, ch)
        if i + 1 < len(cfg.upsample_rates):
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1 :]))
            sd[f"dec.noise_convs.{i}.weight"] = rnd(rng, ch, 1, stride_f0 * 2)
        else:
            sd[f"dec.noise_convs.{i}.weight"] = rnd(rng, ch, 1, 1)
        sd[f"dec.noise_convs.{i}.bias"] = rnd(rng, ch)
        for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes)):
            r = f"dec.resblocks.{i * len(cfg.resblock_kernel_sizes) + j}"
            for l in range(len(rd)):
                sd[f"{r}.convs1.{l}.weight_v"] = rnd(rng, ch, ch, rk)
                sd[f"{r}.convs1.{l}.weight_g"] = np.abs(rnd(rng, ch, 1, 1)) + 0.5
                sd[f"{r}.convs1.{l}.bias"] = rnd(rng, ch)
                sd[f"{r}.convs2.{l}.weight_v"] = rnd(rng, ch, ch, rk)
                sd[f"{r}.convs2.{l}.weight_g"] = np.abs(rnd(rng, ch, 1, 1)) + 0.5
                sd[f"{r}.convs2.{l}.bias"] = rnd(rng, ch)
        ch_in = ch
    sd["dec.conv_post.weight"] = rnd(rng, 1, ch_in, 7)
    sd["dec.m_source.l_linear.weight"] = rnd(rng, 1, 1)
    sd["dec.m_source.l_linear.bias"] = rnd(rng, 1)
    sd["emb_g.weight"] = rnd(rng, cfg.spk_embed_dim, cfg.gin_channels)
    return sd


@pytest.mark.parametrize("sr", [32000, 40000, 48000])
def test_synthesizer_conversion_shapes(sr):
    rng = np.random.default_rng(2)
    cfg = SynthesizerConfig.for_sample_rate(sr)
    sd = make_synth_state_dict(rng, cfg)
    conv = W.convert_synthesizer(sd, n_layers=cfg.n_layers, flow_flows=cfg.flow_flows,
                                 flow_layers=cfg.flow_layers,
                                 n_ups=len(cfg.upsample_rates))

    model = Synthesizer(cfg)
    T = 8
    ref = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, T, cfg.feature_dim)),
        jnp.ones((1, T), jnp.int32),
        jnp.full((1, T), 200.0),
        jnp.zeros((1,), jnp.int32),
    )
    W.assert_tree_shapes_match(conv, ref)

    audio = model.apply(
        jax.tree.map(jnp.asarray, conv),
        jnp.zeros((1, T, cfg.feature_dim)),
        jnp.ones((1, T), jnp.int32),
        jnp.full((1, T), 200.0),
        jnp.zeros((1,), jnp.int32),
    )
    assert audio.shape == (1, T * cfg.upp)
    assert np.isfinite(np.asarray(audio)).all()


def test_rvc_release_checkpoint_format(tmp_path):
    """The small RVC release .pth {'weight': sd, 'config': [...], ...}
    loads through load_synthesizer_params with torch serialization."""
    torch = pytest.importorskip("torch")
    from obs_rvc_tpu.models.checkpoints import load_synthesizer_params, synthesizer_config_from_meta

    rng = np.random.default_rng(3)
    cfg = SynthesizerConfig.for_sample_rate(40000)
    sd = {k: torch.from_numpy(v) for k, v in make_synth_state_dict(rng, cfg).items()}
    ckpt = {
        "weight": sd,
        "config": [1025, 32, 192, 192, 768, 2, 6, 3, 0, "1", [3, 7, 11],
                   [[1, 3, 5]] * 3, [10, 10, 2, 2], 512, [16, 16, 4, 4], 109, 256, "40k"],
        "f0": 1,
        "version": "v2",
        "sr": "40k",
    }
    path = tmp_path / "model.pth"
    torch.save(ckpt, path)

    conv, meta = load_synthesizer_params(path)
    assert meta["version"] == "v2"
    scfg = synthesizer_config_from_meta(meta)
    assert scfg.sample_rate == 40000

    model = Synthesizer(scfg)
    ref = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 768)), jnp.ones((1, 4), jnp.int32),
        jnp.full((1, 4), 200.0), jnp.zeros((1,), jnp.int32),
    )
    W.assert_tree_shapes_match(conv, ref)


# ---------------------------------------------------------------------------
# export round-trips: params → torch-layout state dict → params (bit-exact)
# ---------------------------------------------------------------------------


def _leaves_equal(a, b):
    la = jax.tree_util.tree_leaves_with_path(a)
    bmap = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(b)}
    assert len(la) == len(bmap)
    for k, v in la:
        np.testing.assert_array_equal(np.asarray(v), np.asarray(bmap[jax.tree_util.keystr(k)]),
                                      err_msg=jax.tree_util.keystr(k))


def test_synthesizer_export_roundtrip(tmp_path):
    cfg = SynthesizerConfig.for_sample_rate(40000)
    model = Synthesizer(cfg)
    var = model.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 4, cfg.feature_dim)), jnp.ones((1, 4), jnp.int32),
        jnp.full((1, 4), 200.0), jnp.zeros((1,), jnp.int32),
    )
    sd = W.export_synthesizer(var, cfg)
    back = W.convert_synthesizer(sd, n_layers=cfg.n_layers, flow_flows=cfg.flow_flows,
                                 flow_layers=cfg.flow_layers, n_ups=len(cfg.upsample_rates))
    _leaves_equal(var, back)

    # and through the ONNX weights container
    from obs_rvc_tpu.models.onnx_reader import read_onnx_initializers, write_onnx_weights

    write_onnx_weights(tmp_path / "m.onnx", sd)
    back2 = W.convert_synthesizer(read_onnx_initializers(tmp_path / "m.onnx"),
                                  n_layers=cfg.n_layers, flow_flows=cfg.flow_flows,
                                  flow_layers=cfg.flow_layers, n_ups=len(cfg.upsample_rates))
    _leaves_equal(var, back2)


def test_contentvec_export_roundtrip():
    cfg = ContentVecConfig.v1()
    model = ContentVec(cfg)
    var = model.init(jax.random.PRNGKey(2), jnp.zeros((1, 3600)))
    sd = W.export_contentvec(var, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                             final_proj=cfg.final_proj)
    back = W.convert_contentvec(sd, num_layers=cfg.num_layers, num_heads=cfg.num_heads,
                                final_proj=cfg.final_proj)
    _leaves_equal(var, back)


def test_rmvpe_export_roundtrip():
    cfg = RMVPEConfig()
    model = RMVPE(cfg)
    var = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 128, 32)))
    sd = W.export_rmvpe(var, n_blocks=cfg.n_blocks, en_de_layers=cfg.en_de_layers,
                        inter_layers=cfg.inter_layers)
    back = W.convert_rmvpe(sd, n_blocks=cfg.n_blocks, en_de_layers=cfg.en_de_layers,
                           inter_layers=cfg.inter_layers)
    _leaves_equal(var, back)


def test_fcpe_export_roundtrip():
    from obs_rvc_tpu.models import Fcpe, FcpeConfig

    cfg = FcpeConfig(hidden=64, n_layers=2)
    model = Fcpe(cfg)
    var = model.init(jax.random.PRNGKey(3), jnp.zeros((5, 128)))
    sd = W.export_fcpe(var, n_layers=cfg.n_layers)
    back = W.convert_fcpe(sd, n_layers=cfg.n_layers)
    _leaves_equal(var, back)


def test_cast_params_for_serving():
    """Pre-cast float weights -> bf16 (serving): identical arithmetic to
    flax's per-op cast under bf16 compute; index subtree and integer leaves
    untouched."""
    from obs_rvc_tpu.config import ChunkConfig, RvcModelVersion
    from obs_rvc_tpu.models import ContentVecConfig, RMVPEConfig, SynthesizerConfig
    from obs_rvc_tpu.models.checkpoints import cast_params_for_serving
    from obs_rvc_tpu.stream import RvcPipeline

    cfg = ChunkConfig.build(sample_rate=48000, sample_length=0.10, extra_inference_time=0.50)
    pipe = RvcPipeline(
        cfg,
        RvcModelVersion.V2,
        compute_dtype=jnp.bfloat16,
        contentvec_cfg=ContentVecConfig(
            dim=64, num_layers=2, tap_layer=2, num_heads=4, ffn_dim=128, out_dim=64,
            dtype=jnp.bfloat16,
        ),
        rmvpe_cfg=RMVPEConfig(n_blocks=1, inter_layers=1, en_out_channels=2,
                              gru_hidden=16, dtype=jnp.bfloat16),
        synth_cfg=SynthesizerConfig.for_sample_rate(40000, feature_dim=64),
    )
    params = pipe.init_params_fast(0)
    params["index"] = {"vectors": np.zeros((4, 64), np.float32),
                      "norms": np.zeros(4, np.float32)}
    cast = cast_params_for_serving(params)

    leaves = jax.tree.leaves(cast["contentvec"]) + jax.tree.leaves(cast["rmvpe"])
    assert all(l.dtype == jnp.bfloat16 for l in leaves if jnp.issubdtype(l.dtype, jnp.floating))
    assert cast["index"]["vectors"].dtype == np.float32  # untouched

    wav = jnp.asarray(np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32) * 0.1)
    y_f32params = pipe.contentvec.apply(params["contentvec"], wav)
    y_castparams = pipe.contentvec.apply(cast["contentvec"], wav)
    np.testing.assert_array_equal(np.asarray(y_f32params), np.asarray(y_castparams))
