"""Hand-written Pallas TPU kernels for the hot ops (SURVEY §7.5).

- :mod:`stft_mel` — fused frame→window→DFT(matmul)→|·|→mel→log-clamp: the
  RMVPE frontend (``rvc/src/f0/rmvpe.rs:159-205``) as one VMEM-resident
  kernel (no HBM round-trip for the [T, fft] frame matrix).
- :mod:`resblock` — fused HiFiGAN resblock banks for the NSF generator's
  small-channel levels (im2col form at C≤32, tapdot form at 32<C≤64).
- :mod:`unet_block` — fused RMVPE U-Net ConvBlockRes chains (C≤32 levels).

Retired (recorded negative result, BENCHMARKS.md "Retrieval"): a blocked
exact top-k kernel measured 1.8–2.1× *slower* than ``lax.top_k`` at 1M
vectors — its per-slab k-round merge is VPU-bound and a slab-level threshold
skip cannot fire at production query counts (some query improves on nearly
every slab). Exact search is also no longer the hot path: the IVF probe
(``retrieval/index.py``) is ~14× faster than even the XLA exact search.

Each kernel has an XLA reference implementation in :mod:`obs_rvc_tpu.dsp` /
:mod:`obs_rvc_tpu.models` / :mod:`obs_rvc_tpu.retrieval`; parity is gated in
tests (interpret mode on CPU, compiled on TPU).
"""

from obs_rvc_tpu.ops.stft_mel import log_mel_pallas

__all__ = ["log_mel_pallas"]
