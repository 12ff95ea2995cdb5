"""Hand-written Pallas TPU kernels for the hot ops (SURVEY §7.5).

- :mod:`stft_mel` — fused frame→window→DFT(matmul)→|·|→mel→log-clamp: the
  RMVPE frontend (``rvc/src/f0/rmvpe.rs:159-205``) as one VMEM-resident
  kernel (no HBM round-trip for the [T, fft] frame matrix).
- :mod:`topk` — blocked exact top-k over a large feature table for
  retrieval, with an on-chip running-candidate merge.

Each kernel has an XLA reference implementation in :mod:`obs_rvc_tpu.dsp` /
:mod:`obs_rvc_tpu.retrieval`; parity is gated in tests (interpret mode on
CPU, compiled on TPU).
"""

from obs_rvc_tpu.ops.stft_mel import log_mel_pallas
from obs_rvc_tpu.ops.topk import topk_l2_pallas

__all__ = ["log_mel_pallas", "topk_l2_pallas"]
