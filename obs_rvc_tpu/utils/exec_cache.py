"""Persistent compiled-executable cache via PJRT executable serialization.

The stock jax persistent compilation cache cannot be used on the axon
remote-compile backend (hooking it hangs the compile service —
docs/DEVELOPMENT.md item 6), and that service itself is erratic: the same
fused-step program compiles in 2 s or hangs indefinitely (BENCHMARKS.md
"compile behavior"). This module is the deterministic alternative: lower the
jitted function, key the cache on the lowered StableHLO text (plus jax
version / device kind / an optional caller tag), and either
``deserialize_and_load`` the previously serialized executable (seconds) or
compile once and persist the bytes.

This replaces the reference's ONNXRuntime EP engine/timing caches
(`/root/reference/rvc/src/models.rs:14-17,57`) at the XLA layer.

Usage::

    from obs_rvc_tpu.utils.exec_cache import cached_compile
    step, status = cached_compile(pipe.jit_step, (params, state, chunk, controls))
    # status in {"hit", "miss"}; step is a jax Compiled/Loaded executable
    # callable with exactly the example args' shapes/dtypes/shardings.

The returned executable is shape-specialized: unlike the jitted original it
will not retrace for new shapes — callers own that contract (the streaming
pipeline's shapes are static per ChunkConfig, so this is a fit).
"""

from __future__ import annotations

import hashlib
import os
import pathlib
import pickle
from typing import Any, Callable

import jax

#: overridable for tests / deployments with managed cache volumes
DEFAULT_DIR = "~/.cache/obs_rvc_tpu/exec"
#: bump to invalidate every cached executable (key-scheme changes)
KEY_VERSION = "2"


def _default_dir() -> pathlib.Path:
    # env read at call time so tests / late configuration take effect
    return pathlib.Path(
        os.environ.get("OBS_RVC_EXEC_CACHE_DIR", DEFAULT_DIR)
    ).expanduser()


def _pin_unsharded(args):
    """Replace uncommitted leaves (numpy arrays, python scalars) with
    ShapeDtypeStructs pinned to device 0.

    AOT-compiled executables bind their input shardings at lower time; an
    uncommitted host array can lower as fully-replicated across every
    visible device, producing an executable that then rejects the
    single-shard arrays callers actually pass ("expected N shards, got 1").
    Committed jax Arrays keep their real shardings (TP/DP params pass
    through untouched)."""
    import numpy as np
    from jax.sharding import SingleDeviceSharding

    dev = jax.devices()[0]
    single = SingleDeviceSharding(dev)

    def pin(leaf):
        if isinstance(leaf, jax.Array):
            return leaf
        arr = np.asarray(leaf)
        return jax.ShapeDtypeStruct(arr.shape, arr.dtype, sharding=single)

    return jax.tree.map(pin, args)


def _cache_key(lowered, pinned_args, tag: str) -> str:
    dev = jax.devices()[0]
    # input shardings must be part of the key: a single-device sharding can
    # leave no trace in the StableHLO text, and an executable compiled for a
    # different input layout is uncallable with these args
    shardings = jax.tree.map(
        lambda a: str(getattr(a, "sharding", None)), pinned_args
    )
    src = "\x00".join(
        [
            KEY_VERSION,
            lowered.as_text(),
            str(shardings),
            jax.__version__,
            getattr(dev, "device_kind", "unknown"),
            str(getattr(dev, "platform", "")),
            str(jax.device_count()),
            tag,
        ]
    )
    return hashlib.sha256(src.encode()).hexdigest()[:32]


def cached_compile(
    jitted: Callable,
    example_args: tuple,
    *,
    cache_dir: str | pathlib.Path | None = None,
    tag: str = "",
) -> tuple[Any, str]:
    """Compile ``jitted`` for ``example_args``, reusing a serialized
    executable when one exists.

    Args:
      jitted: a ``jax.jit``-wrapped callable (must expose ``.lower``).
      example_args: concrete (or ShapeDtypeStruct) args fixing shapes/dtypes.
      cache_dir: directory for the pickled executables.
      tag: extra key material (e.g. config digest) if the HLO alone could
        collide across semantically different builds.

    Returns ``(executable, status)`` with status ``"hit"`` / ``"miss"`` /
    ``"uncached"`` (backend refused serialization — executable still valid).
    """
    from jax.experimental.serialize_executable import (
        deserialize_and_load,
        serialize,
    )

    cache_dir = (
        _default_dir() if cache_dir is None else pathlib.Path(cache_dir).expanduser()
    )
    cache_dir.mkdir(parents=True, exist_ok=True)

    pinned = _pin_unsharded(example_args)
    lowered = jitted.lower(*pinned)
    path = cache_dir / f"{_cache_key(lowered, pinned, tag)}.exe.pkl"

    if path.exists():
        payload, in_tree, out_tree = pickle.loads(path.read_bytes())
        return deserialize_and_load(payload, in_tree, out_tree), "hit"

    compiled = lowered.compile()
    try:
        payload, in_tree, out_tree = serialize(compiled)
        blob = pickle.dumps((payload, in_tree, out_tree))
    except Exception:  # backend without SerializeExecutable support
        return compiled, "uncached"
    tmp = path.with_suffix(".tmp.%d" % os.getpid())
    tmp.write_bytes(blob)
    os.replace(tmp, path)  # atomic: concurrent processes race benignly
    return compiled, "miss"
