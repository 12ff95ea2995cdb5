"""Multi-host initialization and mesh construction.

The reference's only inter-process channel is a stdin/stdout pipe
(SURVEY §2.4); scaling across TPU hosts here uses ``jax.distributed`` —
ICI collectives within a slice, DCN across hosts — with streams
data-parallel across the whole pod slice (zero cross-stream traffic, so DP
efficiency is bounded only by per-host dispatch).

Typical serving launch on each host of a slice::

    from obs_rvc_tpu.parallel import distributed
    distributed.initialize()                  # env-driven (TPU pods auto-detect)
    mesh = distributed.global_mesh(n_model=1) # DP over all chips in the slice
"""

from __future__ import annotations

from typing import Optional

import jax

from obs_rvc_tpu.parallel.mesh import make_mesh


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """``jax.distributed.initialize`` wrapper; on TPU pods all arguments are
    auto-detected from the environment. No-op when already initialized or
    single-process."""
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:  # already initialized
        if "already initialized" not in str(e):
            raise


def global_mesh(n_model: int = 1):
    """Mesh over every chip in the slice: ``data`` spans hosts (DCN-safe —
    streams are independent), ``model`` stays within a host so TP
    collectives ride ICI."""
    return make_mesh(n_model=n_model, devices=jax.devices())


def local_stream_slots(mesh) -> int:
    """How many data-parallel stream slots this process feeds.

    Convention: the process owning a data row's **first model shard** feeds
    that stream's input (a row's model shards may span processes under TP;
    exactly one feeder per stream). Verified by the 2-process CPU test
    (``tests/test_distributed_multiprocess.py``)."""
    import numpy as np

    proc = jax.process_index()
    grid = np.asarray(mesh.devices).reshape(mesh.devices.shape[0], -1)
    return int(sum(1 for row in grid if row[0].process_index == proc))
