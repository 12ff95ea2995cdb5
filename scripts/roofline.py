"""Static roofline analysis of the per-chunk pipeline vs TPU v5e peaks.

Prints per-stage FLOPs / bytes, arithmetic intensity, and the
compute/bandwidth-bound time floors, next to the measured sustained times
(BENCHMARKS.md). Quantifies how far each stage sits from speed-of-light.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/roofline.py
"""

import dataclasses

# TPU v5e (lite) single-chip peaks
PEAK_BF16_TFLOPS = 197.0
PEAK_F32_TFLOPS = 49.0
HBM_GBPS = 820.0


@dataclasses.dataclass
class Stage:
    name: str
    gflops: float
    mbytes: float  # HBM traffic (params + activations in/out)
    measured_ms: float | None = None

    def report(self):
        ai = self.gflops * 1e9 / (self.mbytes * 1e6) if self.mbytes else float("inf")
        t_compute = self.gflops / (PEAK_BF16_TFLOPS * 1e3)  # ms
        t_mem = self.mbytes / HBM_GBPS  # ms
        floor = max(t_compute, t_mem)
        line = (
            f"{self.name:14s} {self.gflops:9.2f} GF  {self.mbytes:8.1f} MB  "
            f"AI {ai:7.1f}  floor {floor:7.3f} ms"
        )
        if self.measured_ms is not None:
            line += f"  measured {self.measured_ms:6.2f} ms  ({self.measured_ms / max(floor, 1e-9):6.1f}x)"
        print(line)


def contentvec_flops(L16k=38080, dim=768, layers=12, ffn=3072):
    # conv frontend: per output timestep sum(k_i * c_in * c_out)
    t = L16k
    fl = 0.0
    specs = [(1, 512, 10, 5), (512, 512, 3, 2)] + [(512, 512, 3, 2)] * 3 + [(512, 512, 2, 2)] * 2
    for cin, cout, k, s in specs:
        t = (t - k) // s + 1
        fl += 2 * t * k * cin * cout
    T = t
    # transformer: attn 4*T*d^2*2 + 2*2*T^2*d ; ffn 2*2*T*d*ffn
    per_layer = 2 * (4 * T * dim * dim) + 2 * (2 * T * T * dim) + 2 * (2 * T * dim * ffn)
    fl += layers * per_layer
    params = 94.4e6
    mbytes = params * 2 / 1e6 + T * dim * 4 * 4 / 1e6
    return fl / 1e9, mbytes, T


def rmvpe_flops(T=64, mels=128):
    # 5-level unet, 4 blocks/level, 2 convs/block 3x3; channels 16..256
    fl = 0.0
    h, w = T, mels
    ch_in = 1
    for ch in (16, 32, 64, 128, 256):
        fl += 2 * h * w * 9 * ch_in * ch  # first block conv1
        fl += 2 * h * w * 9 * ch * ch * (2 * 4 - 1)  # remaining convs of 4 blocks
        h, w = h // 2, w // 2
        ch_in = ch
    # intermediate 4 blocks at 512
    fl += 2 * h * w * 9 * 256 * 512
    fl += 2 * h * w * 9 * 512 * 512 * (2 * 4 - 1)
    # decoder mirror (upsampled sizes)
    ch = 512
    for skip in (256, 128, 64, 32, 16):
        h, w = h * 2, w * 2
        ch = ch // 2
        fl += 2 * h * w * 9 * (2 * ch) * ch * (2 * 4)  # up + blocks, rough
    # gru + fc
    fl += 2 * T * (3 * 256 * 384 + 3 * 256 * 256) * 2
    fl += 2 * T * 512 * 360
    params = 55e6
    return fl / 1e9, params * 2 / 1e6 + 5.0


def synth_flops(T=35, upp=400):
    # enc_p: 6 layers, d=192, ffn 768, k=3
    d, f = 192, 768
    fl = 6 * (2 * 4 * T * d * d + 2 * 2 * T * T * d + 2 * 2 * T * d * f * 3)
    # flow: 4 flows × 3 WN layers, conv k=5 hidden 192 → 384
    fl += 4 * (2 * T * (96 * 192) + 3 * 2 * T * 5 * 192 * 384 + 2 * T * 192 * 96)
    # generator: conv_pre + ups + resblocks at each scale
    L = T
    ch = 512
    fl += 2 * L * 7 * 192 * 512
    for u, k in ((10, 16), (10, 16), (2, 4), (2, 4)):
        L *= u
        ch //= 2
        fl += 2 * L * k * (2 * ch) * ch / u  # transposed conv
        fl += 3 * 6 * 2 * L * 11 * ch * ch  # 3 resblocks × 6 convs, k≈avg 7-11
    fl += 2 * L * 7 * ch
    params = 55e6
    return fl / 1e9, params * 2 / 1e6 + L * 4 / 1e6


def main():
    cf, cm, T = contentvec_flops()
    rf, rm = rmvpe_flops()
    sf, sm = synth_flops()
    stages = [
        Stage("contentvec", cf, cm, 0.38),
        Stage("rmvpe", rf, rm, 0.84),
        Stage("synthesizer", sf, sm, 0.51),
        Stage("mel(frontend)", 2 * 64 * 1024 * 513 * 2 / 1e9, 3.0, None),
        Stage("retrieval@1M", 2 * 37 * 1e6 * 768 / 1e9, 3100.0, 6.0),
    ]
    print(f"TPU v5e: {PEAK_BF16_TFLOPS} TF/s bf16, {HBM_GBPS} GB/s HBM")
    print(f"(contentvec frames T={T})")
    total_floor = 0.0
    for s in stages:
        s.report()
        total_floor += max(s.gflops / (PEAK_BF16_TFLOPS * 1e3), s.mbytes / HBM_GBPS)
    print(f"\nsum of stage floors: {total_floor:.3f} ms per 300 ms chunk")
    print("measured sustained step: 5.3 ms (models ~1.7 ms + DSP ~1.2 ms + dispatch)")


if __name__ == "__main__":
    main()
