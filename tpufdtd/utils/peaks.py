"""TPU device detection and peak-spec model.

The reference queries the CUDA device and derives peak HBM bandwidth and a
rough FP32 peak, falling back to RTX 2080 Ti numbers (main.cpp:155-199,
228-231). TPUs expose no clock/bus queries through JAX, so this is a table of
published per-chip specs keyed on device_kind, with the same
fallback-on-unknown behavior.

Bandwidth/FLOPs figures are public per-chip numbers (Google Cloud TPU system
architecture docs). "fp32 peak" for the stencil is a VPU estimate — the VPU
is 8x128 lanes x 4 ALUs; the stencil never touches the MXU — so compute
efficiency percentages are indicative, exactly as rough as the reference's
cores-per-SM model.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class DevicePeaks:
    name: str
    hbm_gbps: float  # peak HBM bandwidth, GB/s
    fp32_gflops: float  # VPU f32 peak estimate, GFLOP/s
    bf16_mxu_tflops: float  # MXU bf16 peak, TFLOP/s (for reference)
    hbm_gib: float  # HBM capacity


# clock * 8 sublanes * 128 lanes * 4 ALUs * 2 (fma) -> VPU f32 GFLOP/s estimate
def _vpu(clock_ghz: float) -> float:
    return clock_ghz * 8 * 128 * 4 * 2


_TABLE = {
    "TPU v4": DevicePeaks("TPU v4", 1228.0, _vpu(1.05), 275.0, 32.0),
    "TPU v5 lite": DevicePeaks("TPU v5e", 819.0, _vpu(0.94), 197.0, 16.0),
    "TPU v5e": DevicePeaks("TPU v5e", 819.0, _vpu(0.94), 197.0, 16.0),
    "TPU v5": DevicePeaks("TPU v5p", 2765.0, _vpu(1.75), 459.0, 95.0),
    "TPU v5p": DevicePeaks("TPU v5p", 2765.0, _vpu(1.75), 459.0, 95.0),
    "TPU v6 lite": DevicePeaks("TPU v6e", 1640.0, _vpu(0.94), 918.0, 32.0),
    "TPU v6e": DevicePeaks("TPU v6e", 1640.0, _vpu(0.94), 918.0, 32.0),
}

# fallback mirrors the reference's unknown-device default role (main.cpp:228)
FALLBACK = _TABLE["TPU v5e"]


def detect_peaks() -> DevicePeaks:
    try:
        import jax

        kind = jax.devices()[0].device_kind
    except Exception:
        return FALLBACK
    if kind in _TABLE:
        return _TABLE[kind]
    for key, spec in _TABLE.items():
        if kind.startswith(key):
            return spec
    return dataclasses.replace(FALLBACK, name=f"{kind} (unknown; v5e fallback)")
