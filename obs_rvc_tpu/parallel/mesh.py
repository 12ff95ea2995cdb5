"""Mesh construction for streaming-RVC serving.

Axes:
- ``data``  — concurrent streams (DP). Scales throughput linearly; rides DCN
  across hosts (streams are independent, zero cross-stream traffic).
- ``model`` — tensor parallelism for the encoder/synthesizer/index (TP/EP).
  Collectives (psum/all_gather from GSPMD) ride ICI within a host/slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ``('data', 'model')`` mesh over the available devices.

    ``n_data`` defaults to ``len(devices) // n_model``. The model axis is the
    minor (fastest-varying) axis so TP collectives stay on neighboring chips.
    """
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        if len(devices) % n_model:
            raise ValueError(f"{len(devices)} devices not divisible by n_model={n_model}")
        n_data = len(devices) // n_model
    n = n_data * n_model
    if n > len(devices):
        raise ValueError(f"need {n} devices, have {len(devices)}")
    import numpy as np

    grid = np.asarray(devices[:n]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def parse_mesh_spec(spec: str, default_data: Optional[int] = None) -> Mesh:
    """Build a mesh from a CLI string like ``"data=4,model=2"``.

    Either axis may be omitted (defaults: ``model=1``; ``data`` falls back to
    ``default_data`` — ``None`` fills the remaining devices). ``"data=-1"``
    also means "fill". This is the serving surface's knob
    (``serve.server --mesh``) for running the stream pool across a slice
    instead of one chip; single-stream surfaces (``serve.cli``) pass
    ``default_data=1`` so ``--mesh model=2`` means TP-only there rather than
    "fill data with whatever devices remain"."""
    n_data: Optional[int] = default_data
    n_model = 1
    for part in spec.split(","):
        part = part.strip()
        if not part:
            continue
        if "=" not in part:
            raise ValueError(f"bad mesh spec part {part!r} (want axis=N)")
        axis, _, val = part.partition("=")
        n = int(val)
        if axis.strip() == "data":
            n_data = None if n == -1 else n
        elif axis.strip() == "model":
            n_model = n
        else:
            raise ValueError(f"unknown mesh axis {axis!r} (have: data, model)")
    return make_mesh(n_data=n_data, n_model=n_model)
