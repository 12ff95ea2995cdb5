"""Batched multi-stream serving pool.

One :class:`StreamPool` drives ``capacity`` concurrent voice streams through
a single vmapped (DP) step per tick — the single-host unit of BASELINE's
"64 concurrent voices data-parallel" config. Each slot has its own ring
buffers, controls, and streaming state; the worker steps *all* slots
together (fixed shapes — detached or starved slots process silence), so
per-chunk cost amortizes the per-dispatch overhead across streams (see
BENCHMARKS.md: 32 streams cost ~7.5× one stream, not 32×).

A slot that is active but has no full input chunk is *frozen*: it rides the
batched step with silence input, but its state and output are discarded —
the stream resumes exactly where it left off, matching the reference's
accumulate-and-wait (``obs-rvc/src/lib.rs:811-828``; a starved stream must
not have silence injected into its 2.4 s model context or SOLA tail).

Slots attach/detach dynamically: attach clears the slot's state (the
reference's ``clear_state`` semantics per filter instance). Slot lifecycle
is made safe against the concurrent worker with a per-slot epoch counter:
state/output computed from a snapshot older than the slot's current epoch
is dropped instead of merged.

**Mesh serving** (``mesh=``): pass a ``('data', 'model')``
:class:`jax.sharding.Mesh` (``obs_rvc_tpu.parallel.make_mesh``) and the pool
becomes the multi-chip serving surface the reference's single worker thread
(``obs-rvc/src/lib.rs:797-857``) scales out to — BASELINE config 5's
"64 streams, data-parallel pod slice". Params are placed by the TP rules
(``parallel/sharding.py``: ContentVec heads/FFN + retrieval table along
``model``, rest replicated), and the resident slot states, per-tick chunks,
and controls are sharded along ``data``; GSPMD inserts the collectives.
The batched step's inputs are committed sharded arrays, so the same
staged/fused executables ride the mesh with no pool-logic changes — the
masked frozen-slot merge runs as a sharded computation and only the
per-slot output chunks are gathered to host for the rings.

**Tick dispatch discipline** (round 4): a tick issues a fixed, tiny number
of device round-trips — one batched-step dispatch (the frozen-slot merge is
*inside* the executable, keyed on a traced ``mask`` argument), one block,
one device→host output pull. The first pool_bench cut paid 4 eager
``jnp.where`` + 4 eager ``jnp.stack`` dispatches per tick on top of that —
217.8 ms of host overhead at B=64 through the ~29 ms-RTT axon tunnel
(BENCHMARKS.md "Serving surface"). Controls are therefore cached
device-resident until ``update_controls``/``attach`` actually changes one,
and the rare stale-epoch fixup (attach/detach racing the step) happens
eagerly only when an epoch actually moved.
"""

from __future__ import annotations

import logging
import threading
from typing import Optional

logger = logging.getLogger(__name__)

import numpy as np
import jax
import jax.numpy as jnp

from obs_rvc_tpu.serve.metrics import ChunkMetrics
from obs_rvc_tpu.stream.pipeline import RvcPipeline, StepControls
from obs_rvc_tpu.stream.ringbuf import make_ring_buffer
from obs_rvc_tpu.stream.state import StreamState


class StreamPool:
    def __init__(
        self,
        pipeline: RvcPipeline,
        params: dict,
        capacity: int = 8,
        input_capacity_chunks: int = 8,
        output_capacity_chunks: int = 12,
        batch_min: int = 1,
        batch_deadline_ms: float = 30.0,
        default_controls: Optional[StepControls] = None,
        mode: str = "staged",
        exec_cache: bool = False,
        mesh=None,
        io_dtype: str = "float32",
        pipelined: bool = False,
    ):
        if mode not in ("staged", "fused"):
            raise ValueError(f"unknown pool mode {mode!r}")
        if io_dtype not in ("float32", "int16"):
            raise ValueError(f"unknown io_dtype {io_dtype!r}")
        if io_dtype == "int16" and mode != "fused":
            raise ValueError("io_dtype='int16' needs mode='fused' (the PCM "
                             "cast is fused into the batched executable)")
        if pipelined and mode != "fused":
            raise ValueError("pipelined=True needs mode='fused'")
        #: optional ('data','model') Mesh — shards params by the TP rules and
        #: slot state/chunks/controls along 'data' (see module docstring)
        self.mesh = mesh
        if mesh is not None:
            if "data" not in mesh.axis_names or "model" not in mesh.axis_names:
                raise ValueError(
                    f"pool mesh needs ('data','model') axes, got {mesh.axis_names}"
                )
            n_data = mesh.shape["data"]
            if capacity % n_data:
                raise ValueError(
                    f"capacity {capacity} not divisible by mesh data axis {n_data}"
                )
            from obs_rvc_tpu.parallel import shard_params

            params = shard_params(params, mesh)
        self.pipeline = pipeline
        self.params = params
        self.capacity = capacity
        #: "staged" (default; robust compile) or "fused" (one monolithic
        #: batched executable per tick — the Pallas-kernel serving path;
        #: same semantics, gated by test_stream_pool_fused_matches_staged)
        self.mode = mode
        #: fused mode only: persist/reuse the compiled batched step
        #: (utils/exec_cache.py) so a primed server skips the remote compile
        self.exec_cache = exec_cache
        self._fused_step = None
        #: host↔device PCM width for the per-tick chunk/output transfers.
        #: "int16" halves both (audio is ≤16-bit at the OBS source anyway;
        #: quantization is 1 LSB ≈ −90 dBFS, fused into the executable) —
        #: at B=64 the two [64, chunk] f32 transfers are 3.7 MB each per
        #: tick, the dominant per-tick cost on PCIe/NIC-bound hosts
        self.io_dtype = io_dtype
        #: double-buffered output pulls (fused mode): a tick dispatches its
        #: batched step asynchronously, publishes the (async) post-step
        #: state handles, and pulls the PREVIOUS tick's output while the
        #: device computes — the device→host transfer of tick k−1 overlaps
        #: the compute of tick k. Costs exactly one tick of added output
        #: latency; on transfer-bound links (PCIe, the axon tunnel) it hides
        #: one of the two per-tick PCM transfers. Throughput preset knob
        #: (serve.server --pool-pipelined).
        self.pipelined = pipelined
        #: stashed (out_device, have_mask, epochs) of the not-yet-pulled tick
        self._pending: Optional[tuple] = None
        #: controls a slot starts with when attach() gets none — lets the
        #: server's CLI-derived controls apply to pool slots the same way
        #: they do to per-connection sessions
        self.default_controls = default_controls or StepControls.default()
        #: tick gating: step when ``>= min(batch_min, n_active)`` slots have a
        #: full chunk, or the first-ready slot has waited ``batch_deadline_ms``
        #: — trades a bounded latency add for batching efficiency (the batched
        #: step costs ~the same whether 1 or 8 slots carry real audio).
        self.batch_min = batch_min
        self.batch_deadline_ms = batch_deadline_ms
        self._ready_since: Optional[float] = None
        cfg = pipeline.cfg
        self._chunk = cfg.sample_frame_size
        #: staged-mode masked merge as ONE jitted call (fused mode folds the
        #: merge into the step executable itself)
        self._merge_fn = None
        #: device-resident stacked controls, rebuilt only when
        #: _controls_version moves (update_controls/attach) — restacking 4
        #: scalars per tick cost 4 eager dispatches through the tunnel
        self._controls_version = 0
        self._controls_dev = None
        self._controls_dev_ver = -1
        #: per-phase wall times of the last tick (ms) — drain/controls/
        #: dispatch/d2h/merge; read by scripts/pool_bench.py
        self.last_tick_phases: dict = {}

        self._in = [make_ring_buffer(self._chunk * input_capacity_chunks) for _ in range(capacity)]
        self._out = [make_ring_buffer(self._chunk * output_capacity_chunks) for _ in range(capacity)]
        self._active = [False] * capacity
        self._controls = [self.default_controls for _ in range(capacity)]
        self._states = self._place_states(StreamState.init_batch(cfg, capacity))
        # bumped by _clear_slot; the worker drops results computed from a
        # stale epoch (attach/detach racing the batched step)
        self._epoch = [0] * capacity
        #: False ⟺ the slot's resident state is fresh-init zeros, so
        #: _clear_slot can skip its 4-leaf device write — attaching 64
        #: streams to a pristine pool used to issue 256 eager device writes
        #: (minutes through the axon tunnel) before the first tick
        self._slot_dirty = [False] * capacity
        self.metrics = ChunkMetrics(chunk_seconds=cfg.latency_seconds)

        self._lock = threading.Lock()
        self._wake = threading.Event()
        self._running = False
        self._thread: Optional[threading.Thread] = None

    # --- mesh placement (no-ops when mesh is None) ---

    def _place_states(self, states):
        """Shard a [capacity, ...] state pytree along 'data'. Re-placing an
        already-sharded tree is a no-op at the transfer layer, so this also
        pins results of eager merges back to the canonical layout."""
        if self.mesh is None:
            return states
        from obs_rvc_tpu.parallel import shard_state

        return shard_state(states, self.mesh)

    def _place_chunks(self, chunks):
        if self.mesh is None:
            # numpy passes straight into the jitted call — the transfer rides
            # the dispatch instead of costing a separate eager round-trip
            return np.asarray(chunks)
        from obs_rvc_tpu.parallel import shard_state

        return shard_state(jnp.asarray(chunks), self.mesh)

    def _place_mask(self, mask):
        """[capacity] bool fed-slot mask for the in-step merge. Sharded along
        'data' with the states on a mesh; plain numpy otherwise (a jit/
        Compiled argument, transferred as part of the dispatch)."""
        if self.mesh is None:
            return np.asarray(mask, bool)
        from obs_rvc_tpu.parallel import shard_state

        return shard_state(jnp.asarray(mask), self.mesh)

    def _place_controls(self, controls):
        if self.mesh is None:
            return controls
        from obs_rvc_tpu.parallel import shard_controls

        return shard_controls(controls, self.mesh)

    # --- slot management ---

    def attach(self, controls: Optional[StepControls] = None) -> int:
        """Claim a free slot → slot id; raises when full."""
        with self._lock:
            for i in range(self.capacity):
                if not self._active[i]:
                    self._active[i] = True
                    self._controls[i] = controls or self.default_controls
                    self._controls_version += 1
                    self._clear_slot(i)
                    return i
        raise RuntimeError("pool full")

    def detach(self, slot: int) -> None:
        with self._lock:
            self._active[slot] = False
            self._clear_slot(slot)

    def _clear_slot(self, i: int) -> None:
        # caller holds self._lock
        self._epoch[i] += 1
        if self._slot_dirty[i]:
            fresh = StreamState.init(self.pipeline.cfg)
            self._states = self._place_states(
                jax.tree.map(
                    lambda batch, single: jnp.asarray(batch).at[i].set(jnp.asarray(single)),
                    self._states,
                    fresh,
                )
            )
            self._slot_dirty[i] = False
        while self._in[i].pop(self._chunk).size:
            pass
        while self._out[i].pop(self._chunk).size:
            pass

    def update_controls(self, slot: int, **kwargs) -> None:
        updates = {
            k: jnp.asarray(v, dtype=getattr(self._controls[slot], k).dtype)
            for k, v in kwargs.items()
        }
        with self._lock:
            self._controls[slot] = self._controls[slot].replace(**updates)
            self._controls_version += 1

    # --- audio sides ---

    def push_audio(self, slot: int, frame: np.ndarray) -> int:
        frame = np.asarray(frame, np.float32).ravel()
        written = self._in[slot].push(frame)
        dropped = frame.size - written
        if dropped:
            self.metrics.record_dropped(dropped)
        self._wake.set()
        return dropped

    def pull_audio(self, slot: int, n: int) -> np.ndarray:
        return self._out[slot].pop(n)

    # --- batched worker ---

    def ready_slots(self) -> tuple[int, int]:
        """``(n_ready, n_active)`` — active slots with a full input chunk."""
        with self._lock:
            flags = [
                (self._active[i], self._in[i].available() >= self._chunk)
                for i in range(self.capacity)
            ]
        n_active = sum(a for a, _ in flags)
        n_ready = sum(a and r for a, r in flags)
        return n_ready, n_active

    def should_step(self, now: Optional[float] = None) -> bool:
        """Tick gate: enough ready slots to batch efficiently, or the first
        ready chunk has aged past ``batch_deadline_ms``."""
        import time

        n_ready, n_active = self.ready_slots()
        if n_ready == 0:
            self._ready_since = None
            return False
        if now is None:
            now = time.monotonic()
        if self._ready_since is None:
            self._ready_since = now
        if n_ready >= min(self.batch_min, max(n_active, 1)):
            return True
        return (now - self._ready_since) * 1000.0 >= self.batch_deadline_ms

    def _masked_merge_fn(self):
        """Jitted ``(mask, new, cur) -> where(mask, new, cur)`` over a state
        pytree — ONE dispatch for the staged path's frozen-slot merge."""
        if self._merge_fn is None:
            def merge(mask, new, cur):
                return jax.tree.map(
                    lambda n, c: jnp.where(
                        mask.reshape((-1,) + (1,) * (jnp.ndim(n) - 1)), n, c
                    ),
                    new, cur,
                )

            self._merge_fn = jax.jit(merge)
        return self._merge_fn

    def _controls_device(self, controls_snap, version: int):
        """Stacked [capacity]-leaf controls, cached on device until a control
        changes (restacking eagerly cost 4 dispatches per tick)."""
        if self._controls_dev is None or self._controls_dev_ver != version:
            self._controls_dev = self._place_controls(
                jax.tree.map(lambda *xs: jnp.stack(xs), *controls_snap)
            )
            self._controls_dev_ver = version
        return self._controls_dev

    def process_pending(self) -> int:
        """One batched step when at least one active slot has a full chunk.

        Slots without a full input chunk ride the step with silence but are
        *frozen*: their post-step state and output are discarded — the
        ``where(mask, new, cur)`` merge runs INSIDE the batched executable —
        so a starved stream resumes with its context intact (the reference
        accumulates and waits, ``lib.rs:811-828``). Slots re-attached/cleared
        while the step computed (epoch moved) get their fresh state restored
        afterwards; that fixup is eager but only runs when a race actually
        happened."""
        import time as _time

        t0 = _time.perf_counter()
        with self._lock:
            active = list(self._active)
            controls_snap = list(self._controls)
            cver = self._controls_version
            epochs = list(self._epoch)
            states = self._states

        controls = self._controls_device(controls_snap, cver)
        t_controls = _time.perf_counter()

        chunks = np.zeros((self.capacity, self._chunk), np.float32)
        have = np.zeros(self.capacity, bool)
        for i in range(self.capacity):
            if not active[i]:
                continue
            c = self._in[i].pop_exact(self._chunk)
            if c is not None:
                chunks[i] = c
                have[i] = True
        if not have.any():
            return 0
        self._ready_since = None

        if self.io_dtype == "int16":
            # ship 16-bit PCM over the host↔device link; the inverse cast is
            # fused into the executable (clip: the rings carry ±1.0 floats).
            # rint, not truncate — matches the output path's jnp.round and
            # keeps quantization error at the documented half-LSB, unbiased
            chunks = np.clip(np.rint(chunks * 32768.0), -32768, 32767).astype(np.int16)
        chunks_dev = self._place_chunks(chunks)
        mask_dev = self._place_mask(have)
        t_drain = _time.perf_counter()
        failed = False
        with self.metrics.time_chunk():
            try:
                if self.mode == "staged":
                    new_states, out = self.pipeline.staged_step(
                        self.params, states, chunks_dev, controls, batched=True
                    )
                    merged = self._masked_merge_fn()(mask_dev, new_states, states)
                else:
                    if self._fused_step is None:
                        cap = self.capacity
                        pcm16 = self.io_dtype == "int16"

                        # NO donation of `states`: attach/_clear_slot may read
                        # self._states concurrently while this call still
                        # points at the pre-step buffers
                        def step_and_merge(params, states, chunks, controls, mask):
                            if pcm16:
                                chunks = chunks.astype(jnp.float32) * (1.0 / 32768.0)
                            new_states, out = jax.vmap(
                                self.pipeline.step, in_axes=(None, 0, 0, 0)
                            )(params, states, chunks, controls)
                            merged = jax.tree.map(
                                lambda n, c: jnp.where(
                                    mask.reshape((cap,) + (1,) * (jnp.ndim(n) - 1)),
                                    n, c,
                                ),
                                new_states, states,
                            )
                            if pcm16:
                                out = jnp.clip(
                                    jnp.round(out * 32768.0), -32768.0, 32767.0
                                ).astype(jnp.int16)
                            return merged, out

                        fn = jax.jit(step_and_merge)
                        if self.exec_cache:
                            from obs_rvc_tpu.utils.exec_cache import cached_compile

                            fn, _ = cached_compile(
                                fn,
                                (self.params, states, chunks_dev, controls, mask_dev),
                                semantic_key=self.pipeline.fingerprint()
                                + "|pool_fused_merge",
                            )
                        self._fused_step = fn
                    merged, out = self._fused_step(
                        self.params, states, chunks_dev, controls, mask_dev
                    )
                if self.pipelined and self.mode == "fused":
                    # leave `out` on device: the pull happens AFTER the next
                    # dispatch (or on flush), overlapping the transfer with
                    # this tick's device compute
                    t_step = t_d2h = _time.perf_counter()
                else:
                    out = jax.block_until_ready(out)
                    t_step = _time.perf_counter()
                    out = np.asarray(out)
                    if out.dtype == np.int16:
                        out = out.astype(np.float32) * (1.0 / 32768.0)
                    t_d2h = _time.perf_counter()
            except Exception:
                logger.exception(
                    "batched step failed; emitting silence for fed slots and resetting"
                )
                self.metrics.record_error()
                failed = True
                # deliver any stashed tick first — its audio precedes this
                # tick's failure silence (ordering)
                self.flush_pending()
                t_step = t_d2h = _time.perf_counter()
                out = np.zeros((self.capacity, self._chunk), np.float32)
                # fed slots reset to fresh state, frozen slots keep context
                # (eager per-leaf merge is fine on this rare path)
                fresh_batch = StreamState.init_batch(self.pipeline.cfg, self.capacity)
                m = jnp.asarray(have)
                merged = jax.tree.map(
                    lambda n, c: jnp.where(
                        m.reshape((self.capacity,) + (1,) * (jnp.ndim(n) - 1)),
                        jnp.asarray(n), jnp.asarray(c),
                    ),
                    fresh_batch, states,
                )

        with self._lock:
            # output goes only to slots that (a) consumed real input this
            # tick and (b) were not re-attached/cleared while we computed
            fresh_ok = np.array(
                [have[i] and self._epoch[i] == epochs[i] for i in range(self.capacity)]
            )
            stale = [i for i in range(self.capacity) if self._epoch[i] != epochs[i]]
            if stale:
                # attach/detach raced the step: restore those slots' cleared
                # state (the merged tree was computed from the old snapshot).
                # ONE jitted masked merge for however many slots raced — a
                # reconnect burst must not serialize per-slot ~29 ms device
                # round-trips while holding the lock (ADVICE r4)
                smask = np.zeros(self.capacity, bool)
                smask[stale] = True
                fresh_batch = StreamState.init_batch(self.pipeline.cfg, self.capacity)
                merged = self._masked_merge_fn()(smask, fresh_batch, merged)
            self._states = self._place_states(merged)
            for i in range(self.capacity):
                if self._epoch[i] != epochs[i]:
                    self._slot_dirty[i] = False  # fixup restored fresh zeros
                elif have[i]:
                    # success: post-step state; failure: reset to fresh zeros
                    self._slot_dirty[i] = not failed
                if not (self.pipelined and not failed):
                    if fresh_ok[i] and not failed:
                        self._out[i].push(out[i])
                    elif fresh_ok[i]:
                        # failed step: keep audio flowing with silence
                        self._out[i].push(np.zeros(self._chunk, np.float32))
        t_pub = _time.perf_counter()
        if self.pipelined and not failed:
            # deliver the PREVIOUS tick's audio while the device runs this
            # tick, then stash this tick's device handle
            self.flush_pending()
            self._pending = (out, have, epochs)
        t_end = _time.perf_counter()
        self.last_tick_phases = {
            "controls_ms": (t_controls - t0) * 1e3,
            "drain_ms": (t_drain - t_controls) * 1e3,
            "dispatch_ms": (t_step - t_drain) * 1e3,
            "d2h_ms": (t_d2h - t_step) * 1e3 + (t_end - t_pub) * 1e3,
            "merge_ms": (t_pub - t_d2h) * 1e3,
        }
        return int(have.sum())

    def flush_pending(self) -> None:
        """Pipelined mode: pull the stashed tick's output and deliver it to
        the rings (epoch-checked, exactly like the synchronous path). A pull
        that surfaces an async dispatch failure emits silence for that
        tick's fed slots and resets their (poisoned) streaming state — the
        next tick re-converges from fresh zeros within one chunk."""
        prev, self._pending = self._pending, None
        if prev is None:
            return
        out_dev, have, epochs = prev
        try:
            out = np.asarray(jax.block_until_ready(out_dev))
            if out.dtype == np.int16:
                out = out.astype(np.float32) * (1.0 / 32768.0)
            ok = True
        except Exception:
            logger.exception(
                "pipelined output pull failed; silence for fed slots and reset"
            )
            self.metrics.record_error()
            out = np.zeros((self.capacity, self._chunk), np.float32)
            ok = False
        with self._lock:
            for i in range(self.capacity):
                if have[i] and (not ok or self._epoch[i] == epochs[i]):
                    self._out[i].push(out[i])
            if not ok:
                smask = np.asarray(have, bool)
                fresh_batch = StreamState.init_batch(self.pipeline.cfg, self.capacity)
                self._states = self._place_states(
                    self._masked_merge_fn()(smask, fresh_batch, self._states)
                )
                for i in np.nonzero(smask)[0]:
                    self._epoch[int(i)] += 1  # drop in-flight results for these slots
                    self._slot_dirty[int(i)] = False

    def _loop(self) -> None:
        while self._running:
            if self.should_step():
                if self.process_pending():
                    continue
            if self._pending is not None:
                # quiescent with a stashed tick: deliver it now (pipelined
                # mode must not hold the last chunk hostage)
                self.flush_pending()
                continue
            # not enough ready slots yet: sleep until more audio arrives or
            # (if something is already waiting) the batching deadline
            timeout = 1.0
            if self._ready_since is not None:
                timeout = max(self.batch_deadline_ms / 1000.0 / 4, 0.001)
            self._wake.wait(timeout=timeout)
            self._wake.clear()

    def start(self) -> None:
        if self._thread is None:
            self._running = True
            self._thread = threading.Thread(target=self._loop, daemon=True, name="rvc-pool")
            self._thread.start()

    def stop(self) -> None:
        if self._thread is not None:
            self._running = False
            self._wake.set()
            self._thread.join()
            self._thread = None
        self.flush_pending()
