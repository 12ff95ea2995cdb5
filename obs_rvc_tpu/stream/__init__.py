"""Fixed-shape streaming chunk pipeline.

Replaces the reference's mutable-buffer worker loop
(``/root/reference/obs-rvc/src/lib.rs:659-857``) and the subprocess inference
engine (``rvc/src/rvc.rs:133-220``) with one pure, jitted state transition:
``step(params, state, chunk, controls) → (state', audio)``. All ring
buffers, the sliding pitch cache, and the SOLA tail live in an explicit
:class:`StreamState` pytree, so the step is donate-able, vmappable across
concurrent streams (DP), and shardable over a device mesh.
"""

from obs_rvc_tpu.stream.state import StreamState
from obs_rvc_tpu.stream.pipeline import RvcPipeline, StepControls
from obs_rvc_tpu.stream.engine import RvcEngine, EngineError
from obs_rvc_tpu.stream.scheduler import StreamSession
from obs_rvc_tpu.stream.pool import StreamPool

__all__ = [
    "StreamState",
    "RvcPipeline",
    "StepControls",
    "RvcEngine",
    "EngineError",
    "StreamSession",
    "StreamPool",
]
