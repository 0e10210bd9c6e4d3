"""Test config: force an 8-device virtual CPU mesh so sharding tests run
anywhere (the real TPU is a single chip; SURVEY.md §5 long-context note)."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache for the CPU test programs: the suite is
# compile-dominated (sharded shard_map programs take tens of seconds each
# on this 1-core host), and most tests recompile programs identical to a
# previous run's. With the cache, a warm full suite drops from ~15 min to
# a few minutes (VERDICT r4 weak #6). The env var alone is ignored once a
# backend is up, so set jax.config explicitly, like bench.py does.
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("TPUFDTD_TEST_CACHE", "/root/.jax_cache_cpu_tests"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

import tpufdtd as tf  # noqa: E402


@pytest.fixture
def small_grid():
    return tf.Grid3D(16, 16, 16, hx=1.0, hy=1.0, hz=1.0)


def make_correctness_ic(grid):
    """The reference's correctness IC: u_cur = sin(i*0.001)*10+100 over the
    flat padded volume, u_prev = 0 (main.cpp:525-532 — the third ring level
    read as u_{-1} on the first step is freshly-zeroed memory)."""
    volp = int(np.prod(grid.padded_shape))
    idx = np.arange(volp, dtype=np.float32).reshape(grid.padded_shape)
    u_cur = np.sin(idx * np.float32(0.001)) * np.float32(10.0) + np.float32(100.0)
    u_prev = np.zeros_like(u_cur)
    m = np.full(grid.padded_shape, 1.5, dtype=np.float32)
    return u_prev, u_cur, m


def rel_l2(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.sqrt(np.sum((a - b) ** 2) / (np.sum(b**2) + 1e-30)))
