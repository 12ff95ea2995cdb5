"""obs_rvc_tpu — a TPU-native streaming Retrieval-based Voice Conversion framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
RVC-Project/obs-rvc reference (a Rust + ONNXRuntime OBS plugin):

- ``dsp``       pure-JAX DSP parity layer (STFT/mel, RMVPE decode, SOLA, RMS
                envelope mixing, polyphase resampling) — reference L0
                (``rvc/src/f0/rmvpe.rs``, ``obs-rvc/src/rt_utils.rs``).
- ``models``    ContentVec/HuBERT encoder, RMVPE pitch net, RVC synthesizer
                (TextEncoder + flow + NSF-HiFiGAN) as JAX models — replacing
                the reference's three ONNXRuntime sessions (``rvc/src/rvc.rs``).
- ``ops``       hand-written Pallas TPU kernels for the hot ops.
- ``retrieval`` sharded on-device kNN feature retrieval with index_rate
                blending (left ``// TODO: index search`` in the reference,
                ``rvc/src/rvc.rs:159``).
- ``stream``    fixed-shape jitted chunk pipeline + host scheduler — replacing
                the reference's worker thread / ring buffers / subprocess RPC
                (``obs-rvc/src/lib.rs:592-857``, ``obs-rvc/src/rvcadapter.rs``).
- ``parallel``  device-mesh sharding (DP streams, TP models, sharded index).
- ``serve``     CLI / PCM streaming front door + metrics.

Everything under ``jax.jit`` uses static shapes derived from ``ChunkConfig``
(the frame-size algebra of ``obs-rvc/src/lib.rs:200-227``).
"""

from obs_rvc_tpu.config import ChunkConfig, PitchAlgorithm, RvcModelVersion, StreamSettings

__version__ = "0.1.0"

__all__ = [
    "ChunkConfig",
    "StreamSettings",
    "RvcModelVersion",
    "PitchAlgorithm",
    "__version__",
]
