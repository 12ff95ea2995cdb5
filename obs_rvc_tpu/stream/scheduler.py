"""Host-side stream session: ring buffers + worker thread around the jitted
step.

Replaces the reference's filter/worker machinery
(``obs-rvc/src/lib.rs:592-643`` filter_audio, ``797-857`` thread_loop,
``860-887`` start/stop): the audio callback pushes arbitrary-size mono
frames and pulls converted ones; a worker drains full chunks through the
pipeline. Differences by design:

- sample-granular SPSC ring buffers (native C++ when built) instead of
  frame-object queues — no re-chunking copies, no timestamp rewrite needed;
  output is sample-aligned to input minus the fixed pipeline delay.
- failure handling: a step that raises emits one silence chunk and clears
  streaming state (the reference's engine-crash path, ``lib.rs:716-727``),
  keeping audio flowing.
- live controls are a lock-free snapshot swap (single assignment of an
  immutable StepControls), not a FairMutex.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

logger = logging.getLogger(__name__)

from obs_rvc_tpu.serve.metrics import ChunkMetrics
from obs_rvc_tpu.stream.pipeline import RvcPipeline, StepControls
from obs_rvc_tpu.stream.ringbuf import make_ring_buffer
from obs_rvc_tpu.stream.state import StreamState


class StreamSession:
    def __init__(
        self,
        pipeline: RvcPipeline,
        params: dict,
        controls: Optional[StepControls] = None,
        input_capacity_chunks: int = 8,
        output_capacity_chunks: int = 12,
        mode: str = "staged",
        stage_timing: bool = False,
        metrics: Optional[ChunkMetrics] = None,
        exec_cache: bool = False,
    ):
        self.pipeline = pipeline
        self.params = params
        self.controls = controls if controls is not None else StepControls.default()
        #: "staged" (default; robust compile, per-stage programs) or "fused"
        self.mode = mode
        #: fused mode only: persist/reuse the compiled step executable
        #: (utils/exec_cache.py) so a primed server starts in seconds instead
        #: of re-entering the erratic multi-minute remote compile
        self.exec_cache = exec_cache
        self._fused_step = None
        #: collect per-stage wall times into metrics (staged mode only;
        #: forces per-stage sync — diagnostics, not peak throughput)
        self.stage_timing = stage_timing
        cfg = pipeline.cfg
        self._chunk = cfg.sample_frame_size
        self._in = make_ring_buffer(self._chunk * input_capacity_chunks)
        self._out = make_ring_buffer(self._chunk * output_capacity_chunks)
        self.state = StreamState.init(cfg)
        #: pass a shared ChunkMetrics to aggregate several sessions into one
        #: scrape target (serve.server per-connection mode)
        self.metrics = metrics if metrics is not None else ChunkMetrics(
            chunk_seconds=cfg.latency_seconds
        )

        self._running = False
        self._thread: Optional[threading.Thread] = None
        self._wake = threading.Event()

    # --- audio-callback side (lib.rs:592-643) ---

    def push_audio(self, frame: np.ndarray) -> int:
        """Push mono device-rate samples; returns count dropped (when the
        worker can't keep up — the reference force_pushes and loses oldest,
        we drop newest and count it)."""
        frame = np.asarray(frame, np.float32).ravel()
        written = self._in.push(frame)
        dropped = frame.size - written
        if dropped:
            self.metrics.record_dropped(dropped)
        self._wake.set()
        return dropped

    def pull_audio(self, n: int) -> np.ndarray:
        """Pop up to n converted samples (empty → caller outputs silence /
        discards the frame, like FilterAudioResult::Discarded)."""
        out = self._out.pop(n)
        if out.size < n:
            self.metrics.record_underrun()
        return out

    # --- worker side (lib.rs:797-857) ---

    def process_pending(self, max_chunks: int = 4) -> int:
        """Run up to ``max_chunks`` chunk steps; returns chunks produced."""
        done = 0
        for _ in range(max_chunks):
            chunk = self._in.pop_exact(self._chunk)
            if chunk is None:
                break
            with self.metrics.time_chunk():
                try:
                    if self.mode == "staged":
                        stage_times = {} if self.stage_timing else None
                        # the session always discards the pre-step state, so
                        # its buffers are donated (in-place ring/cache reuse)
                        self.state, out = self.pipeline.staged_step(
                            self.params, self.state, chunk, self.controls,
                            stage_times=stage_times, donate=True,
                        )
                        if stage_times:
                            self.metrics.record_stages(stage_times)
                    else:
                        if self._fused_step is None:
                            fn = self.pipeline.jit_step
                            if self.exec_cache:
                                from obs_rvc_tpu.utils.exec_cache import cached_compile

                                fn, _ = cached_compile(
                                    fn,
                                    (self.params, self.state,
                                     jnp.asarray(chunk), self.controls),
                                    semantic_key=self.pipeline.fingerprint()
                                    + "|jit_step",
                                )
                            self._fused_step = fn
                        self.state, out = self._fused_step(
                            self.params, self.state, chunk, self.controls
                        )
                    out = np.asarray(jax.block_until_ready(out))
                except Exception:
                    # engine failure → silence chunk + state reset, logged and
                    # counted so a persistent fault is visible in /metrics
                    # (the reference logs before zero-filling, lib.rs:716-727)
                    logger.exception("chunk step failed; emitting silence and resetting state")
                    self.metrics.record_error()
                    out = np.zeros(self._chunk, np.float32)
                    self.state = StreamState.init(self.pipeline.cfg)
            self._out.push(out)
            done += 1
        return done

    def _loop(self) -> None:
        while self._running:
            if self.process_pending() == 0:
                self._wake.wait(timeout=1.0)
                self._wake.clear()

    # --- lifecycle (activate/deactivate, lib.rs:645-657,860-887) ---

    def start(self) -> None:
        if self._thread is None:
            self.clear()
            self._running = True
            self._thread = threading.Thread(target=self._loop, daemon=True, name="rvc-worker")
            self._thread.start()

    def stop(self) -> None:
        if self._thread is not None:
            self._running = False
            self._wake.set()
            self._thread.join()
            self._thread = None
            self.clear()

    def clear(self) -> None:
        """Zero all streaming state (clear_state, lib.rs:906-913)."""
        self.state = StreamState.init(self.pipeline.cfg)
        while self._in.pop(self._chunk).size:
            pass
        while self._out.pop(self._chunk).size:
            pass

    # --- snapshot/resume (the reference zeroes state on every restart,
    # lib.rs:906-913, costing a ~2 s context warm-up glitch; carrying the
    # StreamState across a restart/migration avoids it) ---

    def snapshot(self) -> bytes:
        """Serialize the streaming state (rings are not included — only the
        model-context carry-over). Call with the worker stopped, or accept
        a snapshot that is one in-flight chunk stale."""
        return self.state.to_bytes()

    def restore(self, data: bytes) -> None:
        """Resume from a :meth:`snapshot` taken by a session with the same
        ChunkConfig; continuing produces output identical to never having
        stopped (gated by ``test_stream_session_snapshot_resume``)."""
        state = StreamState.from_bytes(data)
        cfg = self.pipeline.cfg
        want = {
            "input_buffer": cfg.input_buffer_size,
            "input_buffer_16k": cfg.input_buffer_16k_size,
            "sola_buffer": cfg.sola_buffer_frame_size,
            "cache_pitchf": cfg.pitch_cache_len,
        }
        for name, n in want.items():
            got = getattr(state, name).shape
            if got != (n,):
                raise ValueError(
                    f"snapshot geometry mismatch: {name} is {got}, this "
                    f"session's ChunkConfig needs ({n},)"
                )
        self.state = state

    # --- live settings (tier-1 hot reload) ---

    def update_controls(self, **kwargs) -> None:
        import jax.numpy as jnp

        updates = {
            k: jnp.asarray(v, dtype=getattr(self.controls, k).dtype) for k, v in kwargs.items()
        }
        self.controls = self.controls.replace(**updates)
