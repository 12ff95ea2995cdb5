"""Engine-level API: the reference's ``RvcInfer`` surface, TPU-backed.

``/root/reference/rvc/src/rvc.rs:18-27`` exposes
``load_contentvec/load_model/load_f0/unload_model/infer``; the RPC server
(``rvc-rpc/src/main.rs``) drives exactly ``infer(input16k, n16k,
pitch_shift, skip_head, return_length)``. This class reproduces that
contract over the fused JAX stages, for the serving front door
(``obs_rvc_tpu.serve.rpc``) and for engine-level tests. The streaming
pipeline itself (``pipeline.RvcPipeline.step``) inlines the same stages —
use it instead when you control the whole loop.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from obs_rvc_tpu.stream.pipeline import RvcPipeline, StepControls
from obs_rvc_tpu.stream.state import StreamState


class EngineError(RuntimeError):
    """Equivalent of RvcInferError (rvc-common/src/errors.rs)."""


class RvcEngine:
    def __init__(self, pipeline: RvcPipeline, params: Optional[dict] = None):
        self.pipeline = pipeline
        self.params = params
        self.cache_pitchf = np.zeros(1024, dtype=np.float32)

    # --- model management (rvc.rs:46-79) ---

    def load_params(self, params: dict) -> None:
        self.params = params

    def unload_model(self) -> None:
        self.params = None

    @functools.cached_property
    def _jit_infer(self):
        pipe = self.pipeline

        def run(params, cache, buf16, controls):
            state = StreamState(
                input_buffer=jnp.zeros((pipe.cfg.input_buffer_size,), jnp.float32),
                input_buffer_16k=buf16,
                sola_buffer=jnp.zeros((pipe.cfg.sola_buffer_frame_size,), jnp.float32),
                cache_pitchf=cache,
            )
            audio, new_cache = pipe._infer(params, state, buf16, controls, None)
            return audio, new_cache

        return jax.jit(run)

    # --- the RPC-visible call (rvc.rs:133-220) ---

    def infer(
        self,
        input_16k: np.ndarray,
        sample_frame_16k_size: int,
        pitch_shift: int,
        skip_head: int,
        return_length: int,
    ) -> np.ndarray:
        if self.params is None:
            raise EngineError("model not loaded")
        cfg = self.pipeline.cfg
        if input_16k.shape[-1] != cfg.input_buffer_16k_size:
            raise EngineError(
                f"input length {input_16k.shape[-1]} != configured buffer "
                f"{cfg.input_buffer_16k_size}"
            )
        if sample_frame_16k_size != cfg.sample_frame_16k_size:
            raise EngineError("sample_frame_16k_size mismatch with configured geometry")
        if skip_head != cfg.skip_head or return_length != cfg.return_length:
            raise EngineError("skip_head/return_length mismatch with configured geometry")

        controls = StepControls.default(pitch_shift=float(pitch_shift))
        audio, new_cache = self._jit_infer(
            self.params,
            jnp.asarray(self.cache_pitchf),
            jnp.asarray(input_16k, dtype=jnp.float32),
            controls,
        )
        self.cache_pitchf = np.asarray(new_cache)
        return np.asarray(audio)
