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
