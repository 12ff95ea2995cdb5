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


def test_build_index_pipeline(tmp_path):
    """extract features with a tiny encoder, build all artifact formats,
    load each back, and use it in a retrieval blend."""
    from obs_rvc_tpu.config import ChunkConfig, RvcModelVersion
    from obs_rvc_tpu.models import ContentVecConfig, RMVPEConfig, SynthesizerConfig
    from obs_rvc_tpu.retrieval import build_index, extract_features
    from obs_rvc_tpu.stream import RvcPipeline

    cfg = ChunkConfig.build(sample_rate=48000, sample_length=0.10, extra_inference_time=0.50)
    pipe = RvcPipeline(
        cfg,
        RvcModelVersion.V2,
        contentvec_cfg=ContentVecConfig(
            dim=64, num_layers=2, tap_layer=2, num_heads=4, ffn_dim=128, out_dim=64
        ),
        rmvpe_cfg=RMVPEConfig(n_blocks=1, inter_layers=1, en_out_channels=2, gru_hidden=16),
        synth_cfg=SynthesizerConfig.for_sample_rate(40000, feature_dim=64),
    )
    params = pipe.init_params_fast(0)

    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(16000).astype(np.float32) * 0.1 for _ in range(2)]
    feats = extract_features(pipe, params, wavs)
    assert feats.ndim == 2 and feats.shape[1] == 64
    # 1 s at 100 Hz → ~97 rows per clip (2T+1 with T=48)
    assert feats.shape[0] > 150

    for suffix in (".npy", ".index", ".onnx"):
        path = tmp_path / f"voice{suffix}"
        table = build_index(feats, path, max_vectors=100)
        assert table.shape == (100, 64)
        if suffix == ".onnx":
            from obs_rvc_tpu.models.onnx_reader import read_onnx_initializers

            back = read_onnx_initializers(path)["vectors"]
        else:
            back = load_index_vectors(path)
        np.testing.assert_allclose(back, table, atol=1e-6)

    p = RetrievalIndex.make_params(table)
    phone = jnp.asarray(feats[None, :5, :])
    out = knn_blend(jnp.asarray(p["vectors"]), jnp.asarray(p["norms"]), phone, 0.75)
    assert np.isfinite(np.asarray(out)).all()


def test_knn_blend_bf16_table_close_to_f32():
    """bf16 on-chip table (make_params(dtype=bfloat16)): distances still
    accumulate in f32 (preferred_element_type) and norms stay f32; the blend
    must stay close to the f32-table result and, with well-separated
    clusters, pick identical neighbors."""
    rng = np.random.default_rng(11)
    # well-separated cluster centers so bf16 rounding can't flip top-k
    centers = rng.standard_normal((50, 32)).astype(np.float32) * 4.0
    vectors = np.repeat(centers, 4, axis=0) + 0.01 * rng.standard_normal((200, 32)).astype(np.float32)
    phone = (centers[:6] + 0.02 * rng.standard_normal((6, 32))).astype(np.float32).reshape(2, 3, 32)

    p32 = RetrievalIndex.make_params(vectors)
    p16 = RetrievalIndex.make_params(vectors, dtype=jnp.bfloat16)
    assert p16["vectors"].dtype == jnp.bfloat16
    assert p16["norms"].dtype == np.float32

    got32 = np.asarray(knn_blend(jnp.asarray(p32["vectors"]), jnp.asarray(p32["norms"]),
                                 jnp.asarray(phone), 0.9, k=4))
    got16 = np.asarray(knn_blend(jnp.asarray(p16["vectors"]), jnp.asarray(p16["norms"]),
                                 jnp.asarray(phone), 0.9, k=4))
    assert got16.dtype == np.float32
    np.testing.assert_allclose(got16, got32, rtol=2e-2, atol=2e-2)


def test_load_pipeline_params_index_dtype(tmp_path):
    from obs_rvc_tpu.config import ChunkConfig
    from obs_rvc_tpu.models.checkpoints import load_pipeline_params
    from obs_rvc_tpu.stream import RvcPipeline

    vec = np.random.default_rng(3).standard_normal((64, 768)).astype(np.float32)
    np.save(tmp_path / "table.npy", vec)
    cfg = ChunkConfig.build(sample_rate=48000, sample_length=0.10, extra_inference_time=0.50)
    pipe = RvcPipeline(cfg, retrieval_index=RetrievalIndex())
    params = load_pipeline_params(
        pipe, index_path=str(tmp_path / "table.npy"), index_dtype=jnp.bfloat16
    )
    assert params["index"]["vectors"].dtype == jnp.bfloat16
