"""Engine-level API: the reference's ``RvcInfer`` surface, TPU-backed.

``/root/reference/rvc/src/rvc.rs:18-27`` exposes
``load_contentvec/load_model/load_f0/unload_model/infer``; the RPC server
(``rvc-rpc/src/main.rs``) drives exactly ``infer(input16k, n16k,
pitch_shift, skip_head, return_length)``. This class reproduces that
contract over the fused JAX stages, for the serving front door
(``obs_rvc_tpu.serve.rpc``) and for engine-level tests. The streaming
pipeline itself (``pipeline.RvcPipeline.step``) inlines the same stages —
use it instead when you control the whole loop.

Like the reference, the engine honors **whatever geometry each request
carries** (``rvc.rs:133-220`` recomputes everything from ``input.len()``,
``sample_frame_16k_size``, ``skip_head``, ``return_length`` per call): each
distinct request geometry gets its own jitted executable, memoized in a
small cache (first call per geometry compiles; static shapes after that).
The ``cache_pitchf`` f0 history is engine-level state shared across calls
regardless of geometry, exactly as the reference keeps one ``cache_pitchf``
on ``RvcInfer`` (``rvc.rs:42``).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from obs_rvc_tpu.config import ChunkConfig
from obs_rvc_tpu.stream.pipeline import RvcPipeline, StepControls
from obs_rvc_tpu.stream.state import StreamState


class EngineError(RuntimeError):
    """Equivalent of RvcInferError (rvc-common/src/errors.rs)."""


class RvcEngine:
    def __init__(self, pipeline: RvcPipeline, params: Optional[dict] = None,
                 max_geometries: int = 8, exec_cache: bool = False):
        self.pipeline = pipeline
        self.params = params
        self.cache_pitchf = np.zeros(pipeline.cfg.pitch_cache_len, dtype=np.float32)
        #: geometry key -> [callable, pipeline fingerprint]; the callable is
        #: the jitted (params, cache, buf16, controls) -> (audio, cache), or
        #: the exec-cache compiled executable once infer() swaps it in
        self._infer_cache: dict = {}
        self.max_geometries = max_geometries
        #: persist per-geometry compiled executables across engine restarts
        #: (utils/exec_cache.py) — the analog of the reference's ONNX EP
        #: engine/timing caches (models.rs:14-17,57), but exact and
        #: deterministic. Opt-in: the jitted fallback retraces on surprise
        #: shapes, a deserialized executable cannot.
        self.exec_cache = exec_cache

    # --- model management (rvc.rs:46-79) ---

    def load_params(self, params: dict) -> None:
        self.params = params

    def unload_model(self) -> None:
        self.params = None

    def _pipeline_for(self, key) -> RvcPipeline:
        input_len, n16k, skip_head, return_length = key
        launch = self.pipeline
        if (
            input_len == launch.cfg.input_buffer_16k_size
            and n16k == launch.cfg.sample_frame_16k_size
            and skip_head == launch.cfg.skip_head
            and return_length == launch.cfg.return_length
        ):
            return launch
        cfg = ChunkConfig.for_request(
            input_len, n16k, skip_head, return_length,
            model_sample_rate=launch.cfg.model_sample_rate,
            feature_dim=launch.cfg.feature_dim,
            sample_rate=launch.cfg.sample_rate,
        )
        # Forward EVERY launch-pipeline option: a per-geometry pipeline must
        # be the launch pipeline at a different geometry, nothing else. The
        # cfg dataclasses carry dtype/pallas flags that RvcPipeline.__init__
        # re-derives from compute_dtype/pallas_resblocks, so those two are
        # passed explicitly from the launch pipeline's resolved configs.
        return RvcPipeline(
            cfg,
            version=launch.version,
            f0_median_radius=launch.f0_median_radius,
            retrieval_index=launch.retrieval_index,
            compute_dtype=launch.contentvec_cfg.dtype,
            keyshift=launch.keyshift,
            phase_vocoder=launch.phase_vocoder,
            contentvec_cfg=launch.contentvec_cfg,
            rmvpe_cfg=launch.rmvpe_cfg,
            synth_cfg=launch.synth_cfg,
            pitch_algorithm=launch.pitch_algorithm,
            crepe_cfg=launch.crepe_cfg,
            fcpe_cfg=launch.fcpe_cfg,
            pallas_resblocks=launch.synth_cfg.pallas_resblocks,
        )

    def _jit_infer_for(self, key):
        entry = self._infer_cache.get(key)
        if entry is not None:
            return entry
        try:
            pipe = self._pipeline_for(key)
        except (ValueError, AssertionError) as e:
            raise EngineError(f"invalid request geometry {key}: {e}") from e

        def run(params, cache, buf16, controls):
            state = StreamState(
                input_buffer=jnp.zeros((pipe.cfg.input_buffer_size,), jnp.float32),
                input_buffer_16k=buf16,
                sola_buffer=jnp.zeros((pipe.cfg.sola_buffer_frame_size,), jnp.float32),
                cache_pitchf=cache,
            )
            return pipe._infer(params, state, buf16, controls, None)

        if len(self._infer_cache) >= self.max_geometries:
            # bounded: drop the oldest compiled geometry (dict is insertion-
            # ordered); legacy clients use one or two geometries in practice
            self._infer_cache.pop(next(iter(self._infer_cache)))
        # fingerprint stored alongside: infer()'s exec-cache path needs it,
        # and rebuilding a whole RvcPipeline just to read it is wasted work
        entry = [jax.jit(run), pipe.fingerprint()]
        self._infer_cache[key] = entry
        return entry

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
        input_len = int(input_16k.shape[-1])
        hubert_len_bound = input_len // 160
        if skip_head + return_length > hubert_len_bound:
            raise EngineError(
                f"skip_head+return_length ({skip_head}+{return_length}) exceeds "
                f"available feature frames ({hubert_len_bound})"
            )
        key = (input_len, int(sample_frame_16k_size), int(skip_head), int(return_length))
        controls = StepControls.default(pitch_shift=float(pitch_shift))
        args = (
            self.params,
            jnp.asarray(self.cache_pitchf),
            jnp.asarray(input_16k, dtype=jnp.float32),
            controls,
        )

        fresh = key not in self._infer_cache
        entry = self._jit_infer_for(key)
        fn = entry[0]
        if fresh and self.exec_cache:
            from obs_rvc_tpu.utils.exec_cache import cached_compile

            fn, _ = cached_compile(
                fn, args, semantic_key=entry[1] + "|engine_infer",
            )
            entry[0] = fn

        audio, new_cache = fn(*args)
        self.cache_pitchf = np.asarray(new_cache)
        return np.asarray(audio)
