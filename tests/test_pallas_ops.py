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
from obs_rvc_tpu.ops import log_mel_pallas, topk_l2_pallas

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


@pytest.mark.parametrize("n,block", [(500, 128), (4096, 1024)])
def test_topk_pallas_matches_lax(n, block):
    rng = np.random.default_rng(1)
    C, Q, k = 64, 16, 8
    vectors = rng.standard_normal((n, C)).astype(np.float32)
    queries = rng.standard_normal((Q, C)).astype(np.float32)
    norms = (vectors**2).sum(-1)

    scores_full = 2.0 * queries @ vectors.T - norms[None, :]
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(scores_full), k)

    got_vals, got_idx = topk_l2_pallas(
        jnp.asarray(queries), jnp.asarray(vectors), jnp.asarray(norms),
        k=k, block_n=block, interpret=INTERPRET,
    )
    np.testing.assert_allclose(np.asarray(got_vals), np.asarray(ref_vals), rtol=1e-4, atol=1e-4)
    # indices must agree wherever values are distinct (ties can permute)
    vals = np.asarray(got_vals)
    distinct = np.abs(np.diff(np.asarray(ref_vals), axis=1)) > 1e-5
    same = np.asarray(got_idx)[:, :-1] == np.asarray(ref_idx)[:, :-1]
    assert (same | ~distinct).all()


def test_topk_pallas_exact_neighbors():
    # plant known nearest neighbors
    rng = np.random.default_rng(2)
    C = 32
    vectors = rng.standard_normal((256, C)).astype(np.float32) * 10
    queries = vectors[[7, 100, 255]] + 0.01  # nearest must be themselves
    norms = (vectors**2).sum(-1)
    _, idx = topk_l2_pallas(
        jnp.asarray(queries), jnp.asarray(vectors), jnp.asarray(norms),
        k=4, block_n=128, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], [7, 100, 255])


def test_topk_pallas_bf16_table_exact_neighbors():
    """bf16 table streams through the kernel in its native dtype (no
    upcast copy); with separated vectors the neighbors are still exact."""
    rng = np.random.default_rng(4)
    C = 32
    vectors = (rng.standard_normal((256, C)) * 8).astype(np.float32)
    v16 = jnp.asarray(vectors, jnp.bfloat16)
    queries = vectors[[3, 77, 200]] + 0.01
    norms = (np.asarray(v16, np.float32) ** 2).sum(-1)
    _, idx = topk_l2_pallas(
        jnp.asarray(queries), v16, jnp.asarray(norms),
        k=4, block_n=128, interpret=INTERPRET,
    )
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], [3, 77, 200])


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
