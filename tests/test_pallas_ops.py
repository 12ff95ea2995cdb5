"""Pallas kernel parity vs the XLA reference implementations.

On CPU these run in interpret mode (the tests' environment); on TPU the same
code paths compile via Mosaic. Each kernel's numerical contract is gated
against the dsp/retrieval reference ops.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from obs_rvc_tpu.dsp import MelSpectrogram
from obs_rvc_tpu.ops import log_mel_pallas

INTERPRET = jax.default_backend() != "tpu"


def test_log_mel_pallas_matches_reference():
    rng = np.random.default_rng(0)
    sig = jnp.asarray(rng.standard_normal(10080).astype(np.float32))

    ref = np.asarray(MelSpectrogram()(sig))
    got = np.asarray(log_mel_pallas(sig, interpret=INTERPRET))

    assert got.shape == ref.shape == (128, 64)
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=1e-4)


def test_log_mel_pallas_silence():
    sig = jnp.zeros(10080 - 160)  # non-multiple-of-8 frame count path
    got = np.asarray(log_mel_pallas(sig, interpret=INTERPRET))
    assert got.shape == (128, 63)
    np.testing.assert_allclose(got, np.log(1e-5), atol=1e-5)


# ---------------------------------------------------------------------------
# fused resblock bank (ops/resblock.py)
# ---------------------------------------------------------------------------


def _resblock_fixture(dtype, C=32, L=256, B=2, seed=0):
    import dataclasses

    from obs_rvc_tpu.models.synthesizer import ResBlock1

    rng = np.random.default_rng(seed)
    kernel_sizes = (3, 7, 11)
    dilations = (1, 3, 5)
    x = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32) * 0.3, dtype)
    banks, variables = [], []
    for j, k in enumerate(kernel_sizes):
        m = ResBlock1(C, k, dilations, dtype)
        v = m.init(jax.random.PRNGKey(j), x)
        # non-degenerate biases so bias plumbing can't silently cancel
        v = jax.tree.map(
            lambda a: a + 0.01 * np.float32(rng.standard_normal()), v
        )
        banks.append(m)
        variables.append(v)
    return x, banks, variables, kernel_sizes, dilations


@pytest.mark.parametrize("dtype,atol", [(jnp.float32, 2e-5), (jnp.bfloat16, 3e-2)])
def test_resblock_bank_matches_flax(dtype, atol):
    from obs_rvc_tpu.ops.resblock import resblock_bank

    x, banks, variables, ks, dil = _resblock_fixture(dtype)
    ref = None
    params = []
    for m, v in zip(banks, variables):
        y = m.apply(v, x)
        ref = y if ref is None else ref + y
        params.append(m.apply(v, x, params_only=True))
    ref = np.asarray((ref / len(banks)).astype(jnp.float32))

    got = np.asarray(
        resblock_bank(x, params, ks, dil, interpret=INTERPRET).astype(jnp.float32)
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)


# bf16 gate is wider than the im2col bank's: tapdot accumulates the k
# tap-dots in f32 where XLA's conv accumulates across k*C at once — after 9
# residual convs the reassociation shows up as a few elements ~2 bf16 ULPs
# apart (observed 11/32000 at rel 1.2e-2 on the C=64 fixture)
@pytest.mark.parametrize(
    "dtype,atol,rtol", [(jnp.float32, 2e-5, 1e-3), (jnp.bfloat16, 3e-2, 2e-2)]
)
def test_resblock_bank_tapdot_matches_flax(dtype, atol, rtol):
    """The C=64 tapdot variant: same contract as the im2col bank."""
    from obs_rvc_tpu.ops.resblock import resblock_bank_tapdot

    x, banks, variables, ks, dil = _resblock_fixture(dtype, C=64, L=250)
    ref = None
    params = []
    for m, v in zip(banks, variables):
        y = m.apply(v, x)
        ref = y if ref is None else ref + y
        params.append(m.apply(v, x, params_only=True))
    ref = np.asarray((ref / len(banks)).astype(jnp.float32))

    got = np.asarray(
        resblock_bank_tapdot(x, params, ks, dil, interpret=INTERPRET).astype(
            jnp.float32
        )
    )
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=atol, rtol=rtol)


def test_generator_pallas_resblocks_matches_flax():
    """GeneratorNSF with pallas_resblocks on (interpret) == off, same params."""
    import dataclasses

    from obs_rvc_tpu.models.synthesizer import GeneratorNSF, SynthesizerConfig

    cfg = SynthesizerConfig.for_sample_rate(40000)
    # shrink: keep the channel halving (512→…→32 would be huge) — use a tiny
    # initial channel so the last levels hit the C<=64 pallas path
    cfg = dataclasses.replace(
        cfg, upsample_initial_channel=128, upsample_rates=(4, 4),
        upsample_kernel_sizes=(8, 8),
    )
    rng = np.random.default_rng(3)
    B, T = 2, 16
    z = jnp.asarray(rng.standard_normal((B, T, cfg.inter_channels)).astype(np.float32) * 0.3)
    f0 = jnp.full((B, T), 150.0, jnp.float32)
    g = jnp.asarray(rng.standard_normal((B, cfg.gin_channels)).astype(np.float32) * 0.3)

    gen_off = GeneratorNSF(dataclasses.replace(cfg, pallas_resblocks=False))
    v = gen_off.init(jax.random.PRNGKey(0), z, f0, g, None)
    want = np.asarray(gen_off.apply(v, z, f0, g, None))

    gen_on = GeneratorNSF(dataclasses.replace(cfg, pallas_resblocks=True))
    got = np.asarray(gen_on.apply(v, z, f0, g, None))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


# ---------------------------------------------------------------------------
# fused U-Net ConvBlockRes chain (ops/unet_block.py)
# ---------------------------------------------------------------------------


def _chain_ref(x, blocks):
    """Pure-XLA reference of the folded ConvBlockRes chain."""
    dn = ("NHWC", "HWIO", "NHWC")
    for w1, b1, w2, b2, wsc, bsc in blocks:
        y = jax.lax.conv_general_dilated(x, w1, (1, 1), "SAME", dimension_numbers=dn)
        y = jax.nn.relu(y + b1)
        y = jax.lax.conv_general_dilated(y, w2, (1, 1), "SAME", dimension_numbers=dn)
        y = jax.nn.relu(y + b2)
        if wsc is not None:
            sc = jax.lax.conv_general_dilated(
                x, wsc.reshape(1, 1, *wsc.shape[-2:]), (1, 1), "SAME",
                dimension_numbers=dn) + bsc
        else:
            sc = x
        x = sc + y
    return x


def _chain_fixture(rng, B, H, W, cin0, C, n_blocks, dtype):
    def conv(ci, co, k=3):
        return (rng.standard_normal((k, k, ci, co)).astype(np.float32) * 0.15)

    blocks = []
    for i in range(n_blocks):
        ci = cin0 if i == 0 else C
        wsc = bsc = None
        if i == 0 and ci != C:
            wsc = jnp.asarray(conv(ci, C, k=1).reshape(ci, C), dtype)
            bsc = jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.05, dtype)
        blocks.append((
            jnp.asarray(conv(ci, C), dtype),
            jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.05, dtype),
            jnp.asarray(conv(C, C), dtype),
            jnp.asarray(rng.standard_normal(C).astype(np.float32) * 0.05, dtype),
            wsc, bsc,
        ))
    x = jnp.asarray(rng.standard_normal((B, H, W, cin0)).astype(np.float32) * 0.3, dtype)
    return x, blocks


@pytest.mark.parametrize("cin0,C,H,W", [
    (1, 16, 8, 32),    # encoder level 0 geometry (1 -> 16)
    (16, 16, 8, 32),   # identity shortcut
    (32, 16, 4, 16),   # decoder geometry (2C concat -> C)
    (16, 32, 4, 16),   # channel doubling
])
def test_unet_chain_matches_xla(cin0, C, H, W):
    from obs_rvc_tpu.ops.unet_block import conv_block_res_chain

    rng = np.random.default_rng(hash((cin0, C)) % 2**31)
    x, blocks = _chain_fixture(rng, B=2, H=H, W=W, cin0=cin0, C=C,
                               n_blocks=3, dtype=jnp.float32)
    want = np.asarray(_chain_ref(x, blocks))
    got = np.asarray(conv_block_res_chain(x, blocks, interpret=INTERPRET))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_unet_chain_bf16():
    from obs_rvc_tpu.ops.unet_block import conv_block_res_chain

    rng = np.random.default_rng(5)
    x, blocks = _chain_fixture(rng, B=1, H=8, W=16, cin0=8, C=16,
                               n_blocks=2, dtype=jnp.bfloat16)
    want = np.asarray(_chain_ref(x, blocks).astype(jnp.float32))
    got = np.asarray(conv_block_res_chain(x, blocks, interpret=INTERPRET).astype(jnp.float32))
    np.testing.assert_allclose(got, want, atol=5e-2, rtol=2e-2)


def test_unet_fold_bn_matches_separate_bn():
    from obs_rvc_tpu.ops.unet_block import fold_bn

    rng = np.random.default_rng(6)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 8)).astype(np.float32))
    scale = jnp.asarray(1.0 + 0.1 * rng.standard_normal(8).astype(np.float32))
    bias = jnp.asarray(0.1 * rng.standard_normal(8).astype(np.float32))
    mean = jnp.asarray(0.1 * rng.standard_normal(8).astype(np.float32))
    var = jnp.asarray(1.0 + 0.1 * rng.standard_normal(8).astype(np.float32) ** 2)
    x = jnp.asarray(rng.standard_normal((1, 6, 6, 4)).astype(np.float32))

    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(x, w, (1, 1), "SAME", dimension_numbers=dn)
    want = (y - mean) / jnp.sqrt(var + 1e-5) * scale + bias

    wf, bf = fold_bn(w, scale, bias, mean, var)
    got = jax.lax.conv_general_dilated(x, wf, (1, 1), "SAME", dimension_numbers=dn) + bf
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_rmvpe_pallas_unet_matches_flax():
    """RMVPE with pallas_unet on (interpret) == off, same params — gates the
    BN folding, shortcut plumbing, and the holder/param-tree equivalence."""
    import dataclasses

    from obs_rvc_tpu.models.rmvpe import RMVPE, RMVPEConfig

    rng = np.random.default_rng(9)
    mel = jnp.asarray(rng.standard_normal((1, 128, 32)).astype(np.float32))

    cfg_off = RMVPEConfig(pallas_unet=False)
    net_off = RMVPE(cfg_off)
    v = net_off.init(jax.random.PRNGKey(0), mel)
    # non-trivial BN stats so the folding can't silently cancel
    import flax

    v = flax.core.unfreeze(v) if hasattr(flax.core, "unfreeze") else dict(v)
    def perturb(path, a):
        name = jax.tree_util.keystr(path)
        if "mean" in name:
            return a + 0.05
        if "var" in name:
            return a * 1.3
        if "scale" in name:
            return a * 1.1
        return a
    v = jax.tree_util.tree_map_with_path(perturb, v)

    want = np.asarray(net_off.apply(v, mel))
    net_on = RMVPE(dataclasses.replace(cfg_off, pallas_unet=True))
    got = np.asarray(net_on.apply(v, mel))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=1e-4)


def test_rmvpe_pallas_unet_param_tree_identical():
    """init with pallas_unet on and off must declare the SAME variable tree
    (checkpoint converters target the flax names)."""
    import dataclasses

    from obs_rvc_tpu.models.rmvpe import RMVPE, RMVPEConfig

    mel = jnp.zeros((1, 128, 32))
    v_off = RMVPE(RMVPEConfig(pallas_unet=False)).init(jax.random.PRNGKey(0), mel)
    v_on = RMVPE(RMVPEConfig(pallas_unet=True)).init(jax.random.PRNGKey(0), mel)

    paths_off = {jax.tree_util.keystr(p): a.shape
                 for p, a in jax.tree_util.tree_leaves_with_path(v_off)}
    paths_on = {jax.tree_util.keystr(p): a.shape
                for p, a in jax.tree_util.tree_leaves_with_path(v_on)}
    assert paths_off == paths_on
