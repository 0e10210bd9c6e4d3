"""tpufdtd — TPU-native 3D acoustic FDTD engine.

A from-scratch JAX/Pallas rebuild of the capabilities of
ycnliu/Accelerated-3D-Acoustic-FDTD-Kernel (see SURVEY.md): 4th-order
(radius-2, generalized to orders 2-8) spatial stencil + 2nd-order leapfrog
time integration on a halo-padded regular grid, Ricker point sources injected
by trilinear scatter-add, a NumPy correctness oracle, an XLA-fused jnp
backend, a Pallas TPU kernel backend, bf16-storage mixed precision, a
multi-chip shard_map path with ppermute halo exchange, and a benchmark
harness reproducing the reference's correctness phase and 23-column CSV
performance schema.
"""

from .config import Grid3D, SimConfig, stencil_weights, halo_for_order  # noqa: F401
from .oracle import oracle_run, oracle_run_ring, oracle_step  # noqa: F401
from .sources import SourceTerm, build_source_term, inject  # noqa: F401
from .stepper import (  # noqa: F401
    Simulator,
    simulate,
    simulate_ring,
    run_scan,
    get_step_fn,
)
from .wavelets import ricker, ricker_table, default_source_coords  # noqa: F401
from . import checkpoint, compat  # noqa: F401

__version__ = "0.1.0"
