"""Exact kNN feature retrieval with RVC blending semantics.

Upstream Python RVC (the behavior the reference leaves TODO at
``rvc/src/rvc.rs:159``) does, per chunk::

    score, ix = index.search(feats, k=8)          # squared-L2 distances
    weight = (1 / score)**2;  weight /= weight.sum(axis=1, keepdims=True)
    feats = index_rate * sum(big_npy[ix] * weight) + (1 - index_rate) * feats

TPU design: distances via one ``[T, C] @ [C, N]`` matmul (MXU) plus norm
terms; ``jax.lax.top_k`` over N. For multi-chip, the table is sharded along
the ``model`` mesh axis: each shard computes a local top-k (k · n_shards
candidates total), candidates are all-gathered (tiny: k·(C+1) floats per
frame) and reduced to the global top-k — the classic distributed-top-k merge.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P


def knn_blend(
    vectors: jnp.ndarray,     # [N, C] feature table
    norms: jnp.ndarray,       # [N] precomputed squared norms
    phone: jnp.ndarray,       # [B, T, C] query features
    index_rate: jnp.ndarray | float,
    k: int = 8,
) -> jnp.ndarray:
    """Single-shard exact retrieval + blend."""
    B, T, C = phone.shape
    q = phone.reshape(B * T, C)
    # squared L2 = |q|² - 2 q·v + |v|² ; |q|² is constant per row for top-k
    scores = -2.0 * jnp.dot(q, vectors.T, preferred_element_type=jnp.float32) + norms[None, :]
    neg_dist, idx = jax.lax.top_k(-scores, k)  # smallest distances
    d2 = neg_dist * -1.0 + jnp.sum(q * q, axis=-1, keepdims=True)
    d2 = jnp.maximum(d2, 1e-10)

    weight = (1.0 / d2) ** 2
    weight = weight / jnp.sum(weight, axis=-1, keepdims=True)
    neighbors = vectors[idx]  # [BT, k, C]
    mixed = jnp.sum(neighbors * weight[..., None], axis=1).reshape(B, T, C)

    rate = jnp.asarray(index_rate, jnp.float32)
    return rate * mixed + (1.0 - rate) * phone


def sharded_knn_blend(
    vectors: jnp.ndarray,     # [N, C] sharded P('model', None)
    norms: jnp.ndarray,       # [N]    sharded P('model')
    phone: jnp.ndarray,       # [B, T, C] replicated across 'model'
    index_rate: jnp.ndarray | float,
    mesh: Mesh,
    k: int = 8,
) -> jnp.ndarray:
    """Mesh-sharded retrieval: local top-k per index shard → all_gather the
    k candidates (values + vectors) → global top-k → blend."""
    B, T, C = phone.shape

    def local(vec_shard, norm_shard, q3):
        q = q3.reshape(B * T, C)
        scores = -2.0 * jnp.dot(q, vec_shard.T, preferred_element_type=jnp.float32) + norm_shard[None, :]
        neg, idx = jax.lax.top_k(-scores, k)
        cand_vecs = vec_shard[idx]                    # [BT, k, C]
        # gather candidates from every shard along 'model'
        all_neg = jax.lax.all_gather(neg, "model", axis=1, tiled=True)       # [BT, k*S]
        all_vecs = jax.lax.all_gather(cand_vecs, "model", axis=1, tiled=True)  # [BT, k*S, C]
        neg2, sel = jax.lax.top_k(all_neg, k)
        chosen = jnp.take_along_axis(all_vecs, sel[..., None], axis=1)       # [BT, k, C]
        d2 = -neg2 + jnp.sum(q * q, axis=-1, keepdims=True)
        d2 = jnp.maximum(d2, 1e-10)
        w = (1.0 / d2) ** 2
        w = w / jnp.sum(w, axis=-1, keepdims=True)
        mixed = jnp.sum(chosen * w[..., None], axis=1).reshape(B, T, C)
        rate = jnp.asarray(index_rate, jnp.float32)
        return rate * mixed + (1.0 - rate) * q3

    from jax import shard_map

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P("model", None), P("model"), P()),
        out_specs=P(),
        check_vma=False,
    )(vectors, norms, phone)


class RetrievalIndex:
    """Holds static retrieval config; the table itself lives in the params
    pytree under ``"index"`` so it shards/donates like any other weight."""

    def __init__(self, k: int = 8, mesh: Optional[Mesh] = None):
        self.k = k
        self.mesh = mesh

    @staticmethod
    def make_params(vectors: np.ndarray, dtype=np.float32) -> dict:
        """Build the params subtree from a [N, C] float table.

        ``dtype=jnp.bfloat16`` halves HBM traffic of the distance matmul
        (the 1M-vector search is bandwidth-bound; see BENCHMARKS.md) —
        norms stay f32 and distances accumulate in f32 either way."""
        v32 = np.asarray(vectors, dtype=np.float32)
        norms = np.sum(v32 * v32, axis=-1)
        return {"vectors": v32.astype(dtype), "norms": norms}

    def blend(self, index_params: Optional[dict], phone: jnp.ndarray,
              index_rate: jnp.ndarray | float) -> jnp.ndarray:
        if index_params is None:
            return phone
        if self.mesh is not None and "model" in self.mesh.axis_names and self.mesh.shape["model"] > 1:
            return sharded_knn_blend(
                index_params["vectors"], index_params["norms"], phone, index_rate, self.mesh, self.k
            )
        return knn_blend(index_params["vectors"], index_params["norms"], phone, index_rate, self.k)
