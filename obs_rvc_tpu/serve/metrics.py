"""Structured per-chunk latency/throughput metrics.

The reference instruments with ``eprintln!`` stage timers
(``rvc/src/rvc.rs:217``, ``obs-rvc/src/lib.rs:853-854``) and records
nothing. This collector keeps a bounded window of per-chunk wall times and
derives the BASELINE.md headline numbers: p50/p95 chunk latency, real-time
factor, audio-seconds per second, and underrun counts.
"""

from __future__ import annotations

import collections
import dataclasses
import statistics
import time
from typing import Deque


@dataclasses.dataclass
class MetricsSnapshot:
    chunks: int
    p50_ms: float
    p95_ms: float
    mean_ms: float
    rtf: float
    audio_seconds_per_second: float
    underruns: int
    dropped_input_samples: int
    errors: int = 0
    #: per-stage p50 wall ms (populated when the session runs staged with
    #: ``stage_timing=True`` — the reference's per-session
    #: "hubert/pitch/inference" timers, rvc.rs:217, as live metrics)
    stage_p50_ms: dict = dataclasses.field(default_factory=dict)

    def as_dict(self) -> dict:
        return dataclasses.asdict(self)


class ChunkMetrics:
    def __init__(self, chunk_seconds: float, window: int = 256):
        self.chunk_seconds = chunk_seconds
        self._times_ms: Deque[float] = collections.deque(maxlen=window)
        self._stage_ms: dict[str, Deque[float]] = {}
        self._window = window
        self.total_chunks = 0
        self.underruns = 0
        self.dropped_input_samples = 0
        self.errors = 0

    def time_chunk(self):
        """Context manager timing one chunk step."""
        metrics = self

        class _Timer:
            def __enter__(self):
                self.t0 = time.perf_counter()
                return self

            def __exit__(self, *exc):
                metrics.record((time.perf_counter() - self.t0) * 1000.0)
                return False

        return _Timer()

    def record(self, ms: float) -> None:
        self._times_ms.append(ms)
        self.total_chunks += 1

    def record_underrun(self) -> None:
        self.underruns += 1

    def record_dropped(self, samples: int) -> None:
        self.dropped_input_samples += samples

    def record_stages(self, stage_ms: dict) -> None:
        """Record one chunk's per-stage wall times (``{stage: ms}``)."""
        for name, ms in stage_ms.items():
            self._stage_ms.setdefault(
                name, collections.deque(maxlen=self._window)
            ).append(ms)

    def record_error(self) -> None:
        """A chunk step raised (engine failure → silence-fill recovery); the
        reference logs the error before zero-filling (lib.rs:716-727)."""
        self.errors += 1

    def snapshot(self) -> MetricsSnapshot:
        stage_p50 = {
            name: round(statistics.median(v), 3)
            for name, v in self._stage_ms.items()
            if v
        }
        ts = sorted(self._times_ms)
        if not ts:
            return MetricsSnapshot(
                0, 0.0, 0.0, 0.0, 0.0, 0.0, self.underruns,
                self.dropped_input_samples, self.errors, stage_p50,
            )
        p50 = statistics.median(ts)
        p95 = ts[max(0, int(len(ts) * 0.95) - 1)]
        mean = sum(ts) / len(ts)
        rtf = (p50 / 1000.0) / self.chunk_seconds
        return MetricsSnapshot(
            chunks=self.total_chunks,
            p50_ms=round(p50, 3),
            p95_ms=round(p95, 3),
            mean_ms=round(mean, 3),
            rtf=round(rtf, 4),
            audio_seconds_per_second=round(self.chunk_seconds / (mean / 1000.0), 2),
            underruns=self.underruns,
            dropped_input_samples=self.dropped_input_samples,
            errors=self.errors,
            stage_p50_ms=stage_p50,
        )
