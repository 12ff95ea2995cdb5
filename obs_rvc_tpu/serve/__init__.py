"""Serving front door: CLI conversion, PCM streaming, metrics.

Replaces the reference's OBS plugin layer (L4/L5) with a host-agnostic API:
file conversion (:mod:`cli`), a wire-compatible implementation of the
reference's RPC protocol (:mod:`rpc` ⇔
``/root/reference/obs-rvc/src/rvcadapter.rs`` / ``rvc-rpc/src/main.rs``),
and structured latency metrics (:mod:`metrics`) in place of stderr timers.
"""

from obs_rvc_tpu.serve.metrics import ChunkMetrics

__all__ = ["ChunkMetrics"]
