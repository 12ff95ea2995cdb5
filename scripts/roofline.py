"""Static roofline analysis of the per-chunk pipeline vs TPU v5e peaks.

Prints per-stage FLOPs / bytes, arithmetic intensity, and the
compute/bandwidth-bound time floors, next to the measured sustained times
(BENCHMARKS.md). Quantifies how far each stage sits from speed-of-light.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/roofline.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from obs_rvc_tpu.utils.flops import contentvec_gflops, rmvpe_gflops, synth_gflops

# TPU v5e (lite) single-chip peaks
PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 49.0
HBM_GBPS = 820.0

# measured sustained per-stage times (ms), device-resident inputs, bf16,
# B=1, round-3 kernel set — see BENCHMARKS.md; update when re-measured
MEASURED = {
    "contentvec": 0.964,
    "rmvpe": 0.510,
    "synthesizer": 0.997,
    "retrieval@1M": 0.48,  # ivf (nlist=16000, probes=120); exact is 6.93
}


@dataclasses.dataclass
class Stage:
    name: str
    gflops: float
    mbytes: float  # HBM traffic (params + activations in/out)
    measured_ms: float | None = None

    def report(self):
        ai = self.gflops * 1e9 / (self.mbytes * 1e6) if self.mbytes else float("inf")
        # GFLOP / (TFLOP/s) = ms directly (1e9 FLOP / 1e12 FLOP/s = 1e-3 s).
        # (pre-round-3 versions divided by a further 1e3, understating every
        # compute floor 1000x — the old "0.5 ms sum of floors" came from
        # memory floors alone)
        t_compute = self.gflops / PEAK_BF16_TFLOPS  # ms
        t_mem = self.mbytes / HBM_GBPS  # ms
        floor = max(t_compute, t_mem)
        line = (
            f"{self.name:14s} {self.gflops:9.2f} GF  {self.mbytes:8.1f} MB  "
            f"AI {ai:7.1f}  floor {floor:7.3f} ms"
        )
        if self.measured_ms is not None:
            line += f"  measured {self.measured_ms:6.2f} ms  ({self.measured_ms / max(floor, 1e-9):6.1f}x)"
        print(line)


def main():
    L16k, T_mel, T_ret = 38080, 64, 35
    cf = contentvec_gflops(L16k)
    T = 119
    rf = rmvpe_gflops(T_mel)
    sf = synth_gflops(T_ret)
    # param counts from init_params_fast: contentvec 94.4M, rmvpe 90.5M
    # (89M of it the U-Net's C=256/512 3x3 convs), synthesizer 27.5M
    cm = 94.4e6 * 2 / 1e6 + T * 768 * 4 * 4 / 1e6
    rm = 90.5e6 * 2 / 1e6 + 5.0
    sm = 27.5e6 * 2 / 1e6 + T_ret * 400 * 4 / 1e6
    stages = [
        Stage("contentvec", cf, cm, MEASURED.get("contentvec")),
        Stage("rmvpe", rf, rm, MEASURED.get("rmvpe")),
        Stage("synthesizer", sf, sm, MEASURED.get("synthesizer")),
        Stage("mel(frontend)", 2 * 64 * 1024 * 513 * 2 / 1e9, 3.0, None),
        # ivf: probes=120 of 16000 lists, lcap=64 -> ~7680 rows/query slab
        Stage("retrieval@1M", 2 * 120 * 7680 * 768 / 1e9, 120 * 64 * 768 * 4 / 1e6 + 49.0,
              MEASURED.get("retrieval@1M")),
    ]
    print(f"TPU v5e: {PEAK_BF16_TFLOPS} TF/s bf16, {HBM_GBPS} GB/s HBM")
    print(f"(contentvec frames T={T})")
    total_floor = 0.0
    for s in stages:
        s.report()
        total_floor += max(s.gflops / PEAK_BF16_TFLOPS, s.mbytes / HBM_GBPS)
    print(f"\nsum of stage floors: {total_floor:.3f} ms per 300 ms chunk")
    print("see BENCHMARKS.md for current measured sustained step time")


if __name__ == "__main__":
    main()
