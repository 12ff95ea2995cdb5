"""Blocked exact top-k (smallest squared-L2) Pallas kernel for retrieval.

Searches a ``[N, C]`` feature table for the k nearest neighbors of ``[Q, C]``
queries without ever materializing the full ``[Q, N]`` distance matrix in
HBM: the table streams through VMEM in ``BLOCK_N`` slabs (Pallas pipelines
the HBM→VMEM copies across grid steps); each slab's scores are reduced into
a running candidate buffer ``[Q, k]`` held in VMEM scratch via k rounds of
max-and-mask (k is small — 8 for RVC retrieval).

Scores are ``-(|v|² - 2 q·v)`` (monotone in true distance; ``|q|²`` added
back by the caller), matching ``obs_rvc_tpu.retrieval.index.knn_blend``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(q_ref, v_ref, norm_ref, val_ref, idx_ref, best_val, best_idx, *, k, block_n):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _():
        best_val[:] = jnp.full_like(best_val, NEG_INF)
        best_idx[:] = jnp.zeros_like(best_idx)

    # scores for this slab: [Q, BLOCK_N]. The slab arrives untransposed
    # [BLOCK_N, C] in its native dtype (bf16 halves the HBM stream of the
    # bandwidth-bound search); contraction on C is the natural MXU form.
    scores = (
        2.0
        * jax.lax.dot_general(
            q_ref[:],
            v_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        - norm_ref[:]
    )
    base = step * block_n
    col_ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + base

    # Threshold skip: a slab can only change the running top-k if its best
    # score beats the worst retained score of SOME query. After the first
    # few slabs that is almost never true (the k-th best converges fast on
    # any non-adversarial ordering), so the whole k-round fold — the VPU-
    # bound part of the kernel, ~50 elementwise passes over [Q, BLOCK_N] —
    # is skipped and a slab costs one MXU dot + one max reduce, leaving the
    # kernel HBM-bandwidth-bound (the table stream).
    @pl.when(jnp.max(scores) > jnp.min(best_val[:]))
    def _fold_slab():
        # fold slab into running top-k: k rounds of max + mask
        def fold(i, carry):
            scores, col_ids = carry
            m = jnp.max(scores, axis=1, keepdims=True)          # [Q, 1]
            am = jnp.argmax(scores, axis=1)                      # [Q]
            hit = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) == am[:, None]
            ids = jnp.sum(jnp.where(hit, col_ids, 0), axis=1)

            # insert (m, ids) into the running buffer if better than its min
            cur_min = jnp.min(best_val[:], axis=1, keepdims=True)
            cur_arg = jnp.argmin(best_val[:], axis=1)
            better = m[:, 0] > cur_min[:, 0]
            slot_hit = (
                jax.lax.broadcasted_iota(jnp.int32, best_val.shape, 1) == cur_arg[:, None]
            ) & better[:, None]
            best_val[:] = jnp.where(slot_hit, m, best_val[:])
            best_idx[:] = jnp.where(slot_hit, ids[:, None], best_idx[:])

            scores = jnp.where(hit, NEG_INF, scores)
            return scores, col_ids

        jax.lax.fori_loop(0, k, fold, (scores, col_ids))

    @pl.when(step == n_steps - 1)
    def _():
        # emit sorted (descending score = ascending distance); build the
        # sorted buffers as values and store once — per-column dynamic
        # stores are not lane-aligned for Mosaic
        def emit(i, carry):
            vals, idxs, out_v, out_i = carry
            m = jnp.max(vals, axis=1, keepdims=True)
            am = jnp.argmax(vals, axis=1)
            hit = jax.lax.broadcasted_iota(jnp.int32, vals.shape, 1) == am[:, None]
            ids = jnp.sum(jnp.where(hit, idxs, 0), axis=1, keepdims=True)
            col = jax.lax.broadcasted_iota(jnp.int32, out_v.shape, 1) == i
            out_v = jnp.where(col, m, out_v)
            out_i = jnp.where(col, ids, out_i)
            vals = jnp.where(hit, NEG_INF, vals)
            return vals, idxs, out_v, out_i

        _, _, out_v, out_i = jax.lax.fori_loop(
            0, k, emit,
            (best_val[:], best_idx[:], jnp.zeros_like(best_val[:]), jnp.zeros_like(best_idx[:])),
        )
        val_ref[:] = out_v
        idx_ref[:] = out_i


def topk_l2_pallas(
    queries: jnp.ndarray,   # [Q, C]
    vectors: jnp.ndarray,   # [N, C]
    norms: jnp.ndarray,     # [N] squared norms
    k: int = 8,
    block_n: int = 2048,  # VMEM: C x block_n slab must fit (~6 MB at C=768)
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """→ (scores [Q, k], indices [Q, k]); ``score = 2 q·v - |v|²`` descending
    (equivalently squared-L2 ascending, up to the per-query ``|q|²``)."""
    Q, C = queries.shape
    N = vectors.shape[0]
    block_n = min(block_n, N)
    if N % block_n:
        pad = block_n - N % block_n
        vectors = jnp.pad(vectors, ((0, pad), (0, 0)))
        norms = jnp.pad(norms, ((0, pad),), constant_values=1e30)  # infinitely far
        N += pad
    grid = (N // block_n,)

    vals, idxs = pl.pallas_call(
        functools.partial(_kernel, k=k, block_n=block_n),
        grid=grid,
        out_shape=(
            jax.ShapeDtypeStruct((Q, k), jnp.float32),
            jax.ShapeDtypeStruct((Q, k), jnp.int32),
        ),
        in_specs=[
            pl.BlockSpec((Q, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_n, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_n), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((Q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((Q, k), jnp.float32),
            pltpu.VMEM((Q, k), jnp.int32),
        ],
        interpret=interpret,
    )(queries.astype(vectors.dtype), vectors, norms[None, :].astype(jnp.float32))

    return vals, idxs
