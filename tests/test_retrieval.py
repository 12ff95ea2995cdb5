"""Retrieval: RVC kNN-blend semantics, sharded top-k merge, faiss IO."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from obs_rvc_tpu.retrieval import RetrievalIndex, knn_blend, load_index_vectors
from obs_rvc_tpu.retrieval.faiss_reader import read_ivf_flat, write_ivf_flat
from obs_rvc_tpu.retrieval.index import sharded_knn_blend


def _numpy_reference_blend(vectors, phone, rate, k=8):
    """The upstream Python RVC retrieval math, in numpy."""
    B, T, C = phone.shape
    q = phone.reshape(-1, C)
    d2 = ((q[:, None, :] - vectors[None, :, :]) ** 2).sum(-1)
    idx = np.argsort(d2, axis=1)[:, :k]
    score = np.take_along_axis(d2, idx, axis=1)
    weight = np.square(1.0 / np.maximum(score, 1e-10))
    weight /= weight.sum(axis=1, keepdims=True)
    mixed = (vectors[idx] * weight[..., None]).sum(axis=1).reshape(B, T, C)
    return rate * mixed + (1 - rate) * phone


def test_knn_blend_matches_reference_semantics():
    rng = np.random.default_rng(0)
    vectors = rng.standard_normal((200, 16)).astype(np.float32)
    phone = rng.standard_normal((2, 5, 16)).astype(np.float32)

    p = RetrievalIndex.make_params(vectors)
    got = np.asarray(knn_blend(jnp.asarray(p["vectors"]), jnp.asarray(p["norms"]),
                               jnp.asarray(phone), 0.75, k=8))
    want = _numpy_reference_blend(vectors, phone, 0.75)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_knn_blend_rate_zero_is_identity():
    rng = np.random.default_rng(1)
    vectors = rng.standard_normal((64, 8)).astype(np.float32)
    phone = rng.standard_normal((1, 4, 8)).astype(np.float32)
    p = RetrievalIndex.make_params(vectors)
    got = np.asarray(knn_blend(jnp.asarray(p["vectors"]), jnp.asarray(p["norms"]),
                               jnp.asarray(phone), 0.0))
    np.testing.assert_allclose(got, phone, atol=1e-5)


def test_sharded_knn_matches_single_device():
    if len(jax.devices()) < 4:
        pytest.skip("needs >=4 virtual devices")
    from obs_rvc_tpu.parallel import make_mesh

    mesh = make_mesh(n_data=1, n_model=4)
    rng = np.random.default_rng(2)
    N, C = 256, 16
    vectors = rng.standard_normal((N, C)).astype(np.float32)
    phone = rng.standard_normal((1, 6, C)).astype(np.float32)
    norms = (vectors**2).sum(-1)

    single = np.asarray(
        knn_blend(jnp.asarray(vectors), jnp.asarray(norms), jnp.asarray(phone), 0.75)
    )
    sharded = np.asarray(
        sharded_knn_blend(
            jnp.asarray(vectors), jnp.asarray(norms), jnp.asarray(phone), 0.75, mesh
        )
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-3, atol=1e-4)


def test_faiss_ivf_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    vectors = rng.standard_normal((37, 12)).astype(np.float32)
    path = tmp_path / "test.index"
    write_ivf_flat(path, vectors, nlist=5)
    got = read_ivf_flat(path)
    np.testing.assert_array_equal(got, vectors)


def test_load_index_vectors_npy(tmp_path):
    rng = np.random.default_rng(4)
    vectors = rng.standard_normal((10, 4)).astype(np.float32)
    np.save(tmp_path / "total_fea.npy", vectors)
    got = load_index_vectors(tmp_path / "total_fea.npy")
    np.testing.assert_array_equal(got, vectors)
