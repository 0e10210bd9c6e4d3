"""Runtime config knobs via environment, mirroring the reference's env-routed
hook (FDTD_USE_TC / FDTD_TFUSE / FDTD_NFIELDS -> FDTD_SetRuntimeConfig,
main.cpp:82-84, 266-276 — the reference's hook is never implemented by any
linked TU; here every knob is live).

  TPUFDTD_BACKEND        jnp | pallas            (default pallas)
  TPUFDTD_STORAGE        float32 | bfloat16      (default float32)
  TPUFDTD_TFUSE          timesteps fused per HBM pass (0 = auto)
  TPUFDTD_VMEM_BUDGET    pallas VMEM budget in MiB (default 100)
  TPUFDTD_PAIR           auto | on | off — paired-plane sweep mode
"""

from __future__ import annotations

import dataclasses
import os


@dataclasses.dataclass(frozen=True)
class RuntimeConfig:
    backend: str = "pallas"
    storage: str = "float32"
    t_fuse: int = 0
    vmem_budget_mib: int = 100
    pair: str = "auto"


def runtime_config() -> RuntimeConfig:
    return RuntimeConfig(
        backend=os.environ.get("TPUFDTD_BACKEND", "pallas"),
        storage=os.environ.get("TPUFDTD_STORAGE", "float32"),
        t_fuse=int(os.environ.get("TPUFDTD_TFUSE", "0")),
        vmem_budget_mib=int(os.environ.get("TPUFDTD_VMEM_BUDGET", "100")),
        pair=os.environ.get("TPUFDTD_PAIR", "auto"),
    )
