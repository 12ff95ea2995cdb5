"""Retrieval index construction.

RVC builds its faiss index offline from the 100 Hz ContentVec features of
the target speaker's training clips; the reference only *consumes* the
artifact (and then doesn't — SURVEY §2.2). This module closes the loop: it
extracts features with the same encoder the pipeline serves, builds the
table, and writes any of the supported artifact formats (``.npy``,
faiss-compatible ``.index``, ``.onnx`` weights container).
"""

from __future__ import annotations

import pathlib
from typing import Iterable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from obs_rvc_tpu.dsp import resample_poly
from obs_rvc_tpu.models.contentvec import extract_feature


def extract_features(
    pipeline,
    params: dict,
    wavs: Iterable[np.ndarray],
    sample_rate: int = 16000,
    max_seconds: float = 30.0,
) -> np.ndarray:
    """Mono clips → stacked 100 Hz feature rows ``[N, C]``.

    Clips longer than ``max_seconds`` are split (bounded activation memory);
    non-16 kHz input is resampled.
    """
    rows = []
    limit = int(max_seconds * 16000)
    cv = jax.jit(lambda p, w: extract_feature(pipeline.contentvec.apply(p, w[None]))[0])
    for wav in wavs:
        wav = np.asarray(wav, np.float32)
        if wav.ndim > 1:
            wav = wav.mean(axis=0)
        if sample_rate != 16000:
            wav = np.asarray(resample_poly(jnp.asarray(wav), sample_rate, 16000))
        for start in range(0, len(wav), limit):
            piece = wav[start : start + limit]
            if len(piece) < 800:  # shorter than the conv receptive field
                continue
            rows.append(np.asarray(cv(params["contentvec"], jnp.asarray(piece))))
    if not rows:
        raise ValueError("no usable audio provided")
    return np.concatenate(rows, axis=0)


def default_nlist(n: int) -> int:
    """RVC's IVF sizing rule: ``min(16·√N, N/39)``, floored at 4
    (``infer/modules/train/extract_feature_print.py`` lineage — the rule the
    artifacts in the wild were built with)."""
    return max(4, min(int(16 * np.sqrt(n)), n // 39 if n >= 156 else 4))


def train_ivf(
    features: np.ndarray,
    nlist: Optional[int] = None,
    iters: int = 10,
    seed: int = 0,
    batch: int = 65536,
) -> tuple[np.ndarray, np.ndarray]:
    """Lloyd k-means over feature rows → ``(centroids [nlist, C],
    assignments [N] int32)`` for IVF list construction.

    Runs as jitted JAX chunks (CPU in tests, TPU at scale); distance blocks
    are ``[batch, nlist]`` so memory stays bounded at any N. Empty clusters
    are re-seeded from the rows farthest from their centroid."""
    x = np.ascontiguousarray(features, dtype=np.float32)
    n, c = x.shape
    if nlist is None:
        nlist = default_nlist(n)
    nlist = min(nlist, n)
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(n, nlist, replace=False)].copy()

    @jax.jit
    def assign_block(xb, cent):
        d = (
            jnp.sum(cent * cent, axis=1)[None, :]
            - 2.0 * xb @ cent.T
        )
        a = jnp.argmin(d, axis=1)
        return a, jnp.min(d, axis=1)

    assignments = np.zeros(n, dtype=np.int32)
    for _ in range(max(1, iters)):
        dmin = np.zeros(n, dtype=np.float32)
        cj = jnp.asarray(cent)
        for s in range(0, n, batch):
            a, d = assign_block(jnp.asarray(x[s : s + batch]), cj)
            assignments[s : s + batch] = np.asarray(a, dtype=np.int32)
            dmin[s : s + batch] = np.asarray(d)
        counts = np.bincount(assignments, minlength=nlist)
        sums = np.zeros((nlist, c), dtype=np.float64)
        np.add.at(sums, assignments, x)
        nonzero = counts > 0
        cent[nonzero] = (sums[nonzero] / counts[nonzero, None]).astype(np.float32)
        for li in np.nonzero(~nonzero)[0]:  # re-seed empties at outliers
            far = int(np.argmax(dmin))
            cent[li] = x[far]
            dmin[far] = -1.0
    # final assignment against the last centroid update
    cj = jnp.asarray(cent)
    for s in range(0, n, batch):
        a, _ = assign_block(jnp.asarray(x[s : s + batch]), cj)
        assignments[s : s + batch] = np.asarray(a, dtype=np.int32)
    return cent, assignments


def _split_rows(v: np.ndarray, rows: np.ndarray, cap: int,
                rng: np.random.Generator, iters: int, depth: int = 0) -> list:
    """Recursively split one oversized inverted list (row-index array) into
    sublists of ≤ ``cap`` members via local k-means; degenerate clusters
    (identical points / no k-means progress) fall back to an arbitrary chop,
    which is still correct — probing cost counts sublists, and siblings of a
    tight cluster carry near-identical centroids."""
    if len(rows) <= cap:
        return [rows]
    if depth >= 8:
        return [rows[i : i + cap] for i in range(0, len(rows), cap)]
    m = -(-len(rows) // cap)
    pts = v[rows]
    pn = np.sum(pts * pts, axis=1)
    c = pts[rng.choice(len(rows), m, replace=False)].copy()
    for _ in range(max(1, iters)):
        d = pn[:, None] - 2.0 * pts @ c.T + np.sum(c * c, axis=1)[None, :]
        a = np.argmin(d, axis=1)
        for j in range(m):
            sel = a == j
            if sel.any():
                c[j] = pts[sel].mean(axis=0)
            else:
                c[j] = pts[rng.integers(len(rows))]
    d = pn[:, None] - 2.0 * pts @ c.T + np.sum(c * c, axis=1)[None, :]
    a = np.argmin(d, axis=1)
    sizes = np.bincount(a, minlength=m)
    if sizes.max() == len(rows):  # no progress — chop
        return [rows[i : i + cap] for i in range(0, len(rows), cap)]
    out: list = []
    for j in range(m):
        g = rows[a == j]
        if len(g):
            out.extend(_split_rows(v, g, cap, rng, iters, depth + 1))
    return out


def balance_lists(
    vectors: np.ndarray,
    centroids: np.ndarray,
    assignments: np.ndarray,
    cap: int,
    iters: int = 4,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray]:
    """Split inverted lists longer than ``cap`` into sublists via local
    k-means so a fixed slab length (``ivf_search``'s static ``lcap``) loses
    no rows to truncation.

    k-means list sizes are heavy-tailed on realistic features (measured max
    9232 rows at N=1M / nlist=16000 — BENCHMARKS.md recall table); a serving
    ``lcap`` of 64 would silently drop >99 % of such a list
    (``retrieval/index.py`` masks ``iota < min(length, lcap)``). After
    balancing, every row stays reachable: each sublist gets its own
    recomputed centroid, the chunk-union probe ranks sublists individually,
    and a heavily-relevant parent list simply consumes several of the
    ``probes`` slots — cost proportional to rows actually scanned.

    Returns ``(centroids', assignments')`` with ``nlist' ≥ nlist`` and every
    list ≤ ``cap`` members. Original list ids are not preserved.
    """
    rng = np.random.default_rng(seed)
    v = np.asarray(vectors, np.float32)
    assign = np.asarray(assignments)
    nlist = len(centroids)
    counts = np.bincount(assign, minlength=nlist)
    order = np.argsort(assign, kind="stable")
    offs = np.zeros(nlist + 1, np.int64)
    offs[1:] = np.cumsum(counts)
    new_cent: list = []
    groups: list = []
    for li in range(nlist):
        rows = order[offs[li] : offs[li + 1]]
        if len(rows) <= cap:
            new_cent.append(np.asarray(centroids[li], np.float32))
            groups.append(rows)
        else:
            for g in _split_rows(v, rows, cap, rng, iters):
                new_cent.append(v[g].mean(axis=0))
                groups.append(g)
    out_assign = np.empty(len(assign), np.int32)
    for j, g in enumerate(groups):
        out_assign[g] = j
    return np.stack(new_cent).astype(np.float32), out_assign


def load_or_train_ivf(path: str | pathlib.Path, nlist: Optional[int] = None,
                      kmeans_iters: int = 10, seed: int = 0):
    """Load an artifact for ivf-mode search: faiss ``.index`` files carry
    their coarse structure; flat ``.npy``/``.npz``/``.onnx`` tables get a
    k-means quantizer trained at load (RVC's nlist sizing rule)."""
    from obs_rvc_tpu.retrieval.faiss_reader import (
        IvfFlatIndex, load_index_vectors, read_ivf_flat_full,
    )

    p = pathlib.Path(path)
    if p.suffix.lower() not in (".npy", ".npz", ".onnx"):
        return read_ivf_flat_full(p)
    table = load_index_vectors(p)
    cent, assign = train_ivf(table, nlist=nlist, iters=kmeans_iters, seed=seed)
    return IvfFlatIndex(vectors=table, centroids=cent, assignments=assign, nprobe=1)


def build_index(
    features: np.ndarray,
    save_path: Optional[str | pathlib.Path] = None,
    max_vectors: Optional[int] = None,
    seed: int = 0,
    nlist: Optional[int] = None,
    kmeans_iters: int = 10,
) -> np.ndarray:
    """Feature rows → retrieval table (optionally subsampled), saved in the
    format implied by ``save_path``'s suffix (.npy / .index / .onnx).
    ``.index`` artifacts get a real trained coarse quantizer (k-means), so
    they probe correctly both in faiss and in our ivf search mode."""
    table = np.ascontiguousarray(features, dtype=np.float32)
    if max_vectors is not None and len(table) > max_vectors:
        idx = np.random.default_rng(seed).choice(len(table), max_vectors, replace=False)
        table = table[np.sort(idx)]
    if save_path is not None:
        save_path = pathlib.Path(save_path)
        if save_path.suffix == ".npy":
            np.save(save_path, table)
        elif save_path.suffix == ".index":
            from obs_rvc_tpu.retrieval.faiss_reader import write_ivf_flat

            cent, assign = train_ivf(table, nlist=nlist, iters=kmeans_iters, seed=seed)
            write_ivf_flat(save_path, table, centroids=cent, assignments=assign)
        elif save_path.suffix == ".onnx":
            from obs_rvc_tpu.models.onnx_reader import write_onnx_weights

            write_onnx_weights(save_path, {"vectors": table})
        else:
            raise ValueError(f"unknown index format {save_path.suffix!r}")
    return table
