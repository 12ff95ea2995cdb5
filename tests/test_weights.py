"""Converter parity: torch layers vs our JAX modules with converted weights.

These are the strongest checkpoint-fidelity gates available without real RVC
weights in the image: every layout transform in weights.py is exercised
against the corresponding torch op with random weights.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from obs_rvc_tpu.models import weights as W
from obs_rvc_tpu.models.layers import conv_transpose_torch


def test_linear_parity():
    lin = torch.nn.Linear(12, 7)
    x = torch.randn(3, 12)
    want = lin(x).detach().numpy()
    p = W.linear({"w.weight": lin.weight, "w.bias": lin.bias}, "w")
    got = np.asarray(jnp.asarray(x.numpy()) @ p["kernel"] + p["bias"])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_conv1d_parity():
    conv = torch.nn.Conv1d(4, 6, 5, padding=2, dilation=2)
    x = torch.randn(2, 4, 20)
    want = conv(x).detach().numpy()  # [B, out, T]

    sd = {"c.weight": conv.weight, "c.bias": conv.bias}
    p = W.conv1d(sd, "c")
    y = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 1)),
        jnp.asarray(p["kernel"]),
        window_strides=(1,),
        padding=((2, 2),),
        rhs_dilation=(2,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    ) + p["bias"]
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), want, atol=1e-5)


@pytest.mark.parametrize("k,s,p_,op", [(16, 10, 3, 0), (4, 2, 1, 0), (3, 2, 1, 1)])
def test_conv_transpose1d_parity(k, s, p_, op):
    conv = torch.nn.ConvTranspose1d(6, 4, k, stride=s, padding=p_, output_padding=op)
    x = torch.randn(2, 6, 15)
    want = conv(x).detach().numpy()

    sd = {"c.weight": conv.weight, "c.bias": conv.bias}
    cp = W.conv_transpose1d(sd, "c")
    y = conv_transpose_torch(
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(cp["kernel"]), (s,), (p_,), (op,)
    ) + cp["bias"]
    np.testing.assert_allclose(np.asarray(y).transpose(0, 2, 1), want, atol=1e-4)


def test_conv_transpose2d_parity():
    conv = torch.nn.ConvTranspose2d(5, 3, 3, stride=2, padding=1, output_padding=1, bias=False)
    x = torch.randn(1, 5, 8, 16)
    want = conv(x).detach().numpy()  # NCHW

    cp = W.conv_transpose2d({"c.weight": conv.weight}, "c", bias=False)
    y = conv_transpose_torch(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), jnp.asarray(cp["kernel"]),
        (2, 2), (1, 1), (1, 1),
    )
    np.testing.assert_allclose(np.asarray(y).transpose(0, 3, 1, 2), want, atol=1e-4)
    assert want.shape[-2:] == (16, 32)  # exact 2x upsample


def test_weight_norm_fold():
    conv = torch.nn.utils.weight_norm(torch.nn.Conv1d(4, 8, 3))
    sd = {f"c.{k}": v for k, v in conv.state_dict().items()}
    w = W.fold_weight_norm(sd, "c")
    # effective torch weight
    want = conv.weight.detach().numpy()
    np.testing.assert_allclose(w, want, atol=1e-6)


def test_gru_parity():
    torch.manual_seed(0)
    gru = torch.nn.GRU(12, 8, num_layers=1, bidirectional=True, batch_first=True)
    x = torch.randn(2, 9, 12)
    want, _ = gru(x)
    want = want.detach().numpy()  # [B, T, 16]

    from obs_rvc_tpu.models.rmvpe import BiGRU

    sd = gru.state_dict()
    params = {
        "params": {
            "l0_d0_w_ih": sd["weight_ih_l0"].numpy(),
            "l0_d0_w_hh": sd["weight_hh_l0"].numpy(),
            "l0_d0_b_ih": sd["bias_ih_l0"].numpy(),
            "l0_d0_b_hh": sd["bias_hh_l0"].numpy(),
            "l0_d1_w_ih": sd["weight_ih_l0_reverse"].numpy(),
            "l0_d1_w_hh": sd["weight_hh_l0_reverse"].numpy(),
            "l0_d1_b_ih": sd["bias_ih_l0_reverse"].numpy(),
            "l0_d1_b_hh": sd["bias_hh_l0_reverse"].numpy(),
        }
    }
    model = BiGRU(hidden=8, num_layers=1)
    got = np.asarray(model.apply(params, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_mha_parity():
    torch.manual_seed(1)
    E, H, T, B = 16, 4, 6, 2
    mha = torch.nn.MultiheadAttention(E, H, batch_first=True)
    x = torch.randn(B, T, E)
    want, _ = mha(x, x, x, need_weights=False)
    want = want.detach().numpy()

    # split torch's packed in_proj into fairseq-style separate projections
    sd = mha.state_dict()
    qw, kw, vw = sd["in_proj_weight"].chunk(3)
    qb, kb, vb = sd["in_proj_bias"].chunk(3)
    fake = {
        "a.q_proj.weight": qw, "a.q_proj.bias": qb,
        "a.k_proj.weight": kw, "a.k_proj.bias": kb,
        "a.v_proj.weight": vw, "a.v_proj.bias": vb,
        "a.out_proj.weight": sd["out_proj.weight"], "a.out_proj.bias": sd["out_proj.bias"],
    }
    p = W.mha_from_separate_qkv(fake, "a", H)

    from obs_rvc_tpu.models.contentvec import ContentVecConfig, FusedSelfAttention

    mod = FusedSelfAttention(ContentVecConfig(dim=E, num_heads=H))
    got = np.asarray(mod.apply({"params": p}, jnp.asarray(x.numpy())))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_batch_norm_parity():
    bn = torch.nn.BatchNorm2d(6)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
        bn.weight.normal_()
        bn.bias.normal_()
    x = torch.randn(2, 6, 4, 4)
    want = bn(x).detach().numpy()

    import flax.linen as nn

    params, stats = W.batch_norm({f"b.{k}": v for k, v in bn.state_dict().items()}, "b")
    mod = nn.BatchNorm(use_running_average=True, epsilon=1e-5)
    got = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want, atol=1e-5)


def test_conv1x1_as_dense_parity():
    conv = torch.nn.Conv1d(5, 9, 1)
    x = torch.randn(2, 5, 7)
    want = conv(x).detach().numpy()
    p = W.conv1x1_as_dense({"c.weight": conv.weight, "c.bias": conv.bias}, "c")
    got = np.asarray(jnp.asarray(x.numpy().transpose(0, 2, 1)) @ p["kernel"] + p["bias"])
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, atol=1e-5)


def test_onnx_reader_roundtrip(tmp_path):
    from obs_rvc_tpu.models.onnx_reader import read_onnx_initializers, write_onnx_weights

    rng = np.random.default_rng(0)
    tensors = {
        "enc_p.emb_phone.weight": rng.standard_normal((192, 768)).astype(np.float32),
        "dec.ups.0.bias": rng.standard_normal(256).astype(np.float32),
        "some.int64.param": np.arange(7, dtype=np.int64),
        "half.precision": rng.standard_normal((4, 5)).astype(np.float16),
    }
    path = tmp_path / "weights.onnx"
    write_onnx_weights(path, tensors)
    back = read_onnx_initializers(path)
    assert set(back) == set(tensors)
    np.testing.assert_array_equal(back["enc_p.emb_phone.weight"], tensors["enc_p.emb_phone.weight"])
    np.testing.assert_array_equal(back["some.int64.param"], tensors["some.int64.param"])
    # f16 is widened to f32 on read
    np.testing.assert_allclose(back["half.precision"], tensors["half.precision"].astype(np.float32))


def test_onnx_reader_rejects_garbage(tmp_path):
    from obs_rvc_tpu.models.onnx_reader import read_onnx_initializers

    p = tmp_path / "bad.onnx"
    p.write_bytes(b"\x08\x05")  # valid protobuf, no graph
    with pytest.raises(ValueError):
        read_onnx_initializers(p)


@pytest.mark.parametrize("k,s,cin,cout", [(16, 10, 6, 4), (24, 12, 4, 2), (4, 2, 3, 5), (20, 10, 2, 2)])
def test_conv_transpose_frames_matches_torch(k, s, cin, cout):
    from obs_rvc_tpu.models.layers import conv_transpose_1d_frames

    p_ = (k - s) // 2
    conv = torch.nn.ConvTranspose1d(cin, cout, k, stride=s, padding=p_, bias=False)
    x = torch.randn(2, cin, 13)
    want = conv(x).detach().numpy()

    cp = W.conv_transpose1d({"c.weight": conv.weight}, "c", bias=False)
    got = conv_transpose_1d_frames(
        jnp.asarray(x.numpy().transpose(0, 2, 1)), jnp.asarray(cp["kernel"]), s, p_
    )
    assert got.shape == (2, 13 * s, cout)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), want, atol=1e-4)
