"""Partition-spec rules for parameters, stream state, and controls.

TP policy (round 1): megatron-style sharding of the ContentVec transformer
— attention heads and FFN hidden dim split along ``model`` — since it holds
~90% of the parameters; the 192-channel VITS encoder, flow, RMVPE, and the
vocoder are replicated (they are small; DP carries their throughput). The
retrieval index shards along ``model`` separately (EP-like; see
``obs_rvc_tpu.retrieval``). GSPMD inserts the psum/all_gathers implied by
these annotations.
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


#: (path regex, spec builder by param ndim). First match wins.
_PARAM_RULES: tuple[tuple[str, dict[int, P]], ...] = (
    # ContentVec attention (FusedSelfAttention): qkv_kernel [in, 3, heads,
    # head_dim] — shard heads so every shard owns whole (q,k,v) head triples
    (r"contentvec/.*attn/qkv_kernel", {4: P(None, None, "model", None)}),
    (r"contentvec/.*attn/qkv_bias", {3: P(None, "model", None)}),
    # out projection [heads, head_dim, out] — row-parallel (psum after)
    (r"contentvec/.*attn/out_kernel", {3: P("model", None, None)}),
    # FFN: fc1 [in, ffn], fc2 [ffn, out]
    (r"contentvec/.*fc1/kernel", {2: P(None, "model")}),
    (r"contentvec/.*fc1/bias", {1: P("model")}),
    (r"contentvec/.*fc2/kernel", {2: P("model", None)}),
    # retrieval index shards its vector table along model (EP-like)
    (r"index/vectors", {2: P("model", None)}),
    (r"index/norms", {1: P("model")}),
)


def param_partition_spec(path: str, ndim: int) -> P:
    for pattern, by_ndim in _PARAM_RULES:
        if re.search(pattern, path):
            return by_ndim.get(ndim, P())
    return P()  # replicate


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
    return "/".join(parts)


def shard_params(params: Any, mesh: Mesh) -> Any:
    """device_put every parameter according to the TP rules."""

    def place(path, leaf):
        spec = param_partition_spec(_path_str(path), getattr(leaf, "ndim", 0))
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state: Any, mesh: Mesh) -> Any:
    """Stream state carries a leading stream axis → shard over ``data``."""

    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P("data", *([None] * (leaf.ndim - 1)))))

    return jax.tree.map(place, state)


def shard_controls(controls: Any, mesh: Mesh) -> Any:
    """Per-stream control scalars → sharded over ``data``."""

    def place(leaf):
        return jax.device_put(leaf, NamedSharding(mesh, P("data")))

    return jax.tree.map(place, controls)
