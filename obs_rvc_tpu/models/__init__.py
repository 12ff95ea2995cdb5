"""JAX model zoo — the three neural stages of the RVC pipeline.

Replaces the reference's three ONNXRuntime sessions
(``/root/reference/rvc/src/rvc.rs:46-75`` loads contentvec / f0 / model via
``rvc/src/models.rs``) with native JAX networks:

- :mod:`contentvec`  — HuBERT-style feature encoder
  (``vec-{256,768}-layer-{9,12}.onnx`` equivalent).
- :mod:`rmvpe`       — RMVPE E2E pitch-salience network (``rmvpe.onnx``).
- :mod:`synthesizer` — RVC SynthesizerTrnMs{256,768}NSFsid inference graph
  (TextEncoder → flow⁻¹ → NSF-HiFiGAN), the user-supplied RVC ``.onnx``.
- :mod:`weights`     — converters from RVC/HuBERT torch checkpoints to
  parameter pytrees.
"""

from obs_rvc_tpu.models.contentvec import ContentVec, ContentVecConfig
from obs_rvc_tpu.models.rmvpe import RMVPE, RMVPEConfig
from obs_rvc_tpu.models.crepe import Crepe, CrepeConfig
from obs_rvc_tpu.models.fcpe import Fcpe, FcpeConfig
from obs_rvc_tpu.models.synthesizer import Synthesizer, SynthesizerConfig

__all__ = [
    "ContentVec",
    "ContentVecConfig",
    "RMVPE",
    "RMVPEConfig",
    "Crepe",
    "CrepeConfig",
    "Fcpe",
    "FcpeConfig",
    "Synthesizer",
    "SynthesizerConfig",
]
