"""Headline benchmark: 512^3 x 50 steps on one chip, Pallas backend.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline: the reference's CUDA_Optimized kernel reached 28.3 % of H100 HBM
peak at 512^3x50 under its 12 B/pt/step "optimized" bytes model
(STABILITY_FIX_LOG.md:153, main.cpp:139-144). The headline here is the same
model-percent on this chip's peak, so the number is hardware-normalized.
"""

import json
import os

import numpy as np

# persistent compile cache: Mosaic kernels compile through a remote helper
# at minutes each; caching makes reruns start in seconds. NB the env var
# alone is IGNORED under this stack — must set jax.config explicitly.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)



def main():
    import jax

    _enable_compile_cache()

    import tpufdtd as tf
    from tpufdtd.utils import metrics
    from tpufdtd.utils.peaks import detect_peaks

    peaks = detect_peaks()

    # ---- correctness gate (128^3, vs f64 oracle) ---------------------------
    g_c = tf.Grid3D(128, 128, 128, hx=1.0, hy=1.0, hz=1.0)
    volp = int(np.prod(g_c.padded_shape))
    idx = np.arange(volp, dtype=np.float32).reshape(g_c.padded_shape)
    uc0 = np.sin(idx * np.float32(0.001)) * np.float32(10.0) + np.float32(100.0)
    up0 = np.zeros_like(uc0)
    m_c = np.full(g_c.padded_shape, 1.5, np.float32)
    _, uc_t = tf.oracle_run(up0, uc0, m_c, g_c, 0.001, 50, dtype=np.float64)
    _, uc = tf.simulate(
        up0, uc0, m_c, g_c, tf.SimConfig(dt=0.001, nsteps=50, backend="pallas")
    )
    l2 = float(
        np.sqrt(
            np.sum((uc.astype(np.float64) - uc_t) ** 2) / (np.sum(uc_t**2) + 1e-30)
        )
    )

    # ---- performance (512^3 x 50, 5 reps, reference timing convention) -----
    n = 512
    nsteps, warmup, reps = 50, 5, 7
    grid = tf.Grid3D(n, n, n)
    cfg = tf.SimConfig(dt=0.001, nsteps=nsteps, warmup_steps=warmup, backend="pallas")
    m = np.full(grid.padded_shape, 1.5, np.float32)
    # one Ricker source like the reference perf sweep (main.cpp:279-282);
    # also keeps the field evolving so no layer can cache repeated identical
    # executions
    src = tf.ricker_table(nsteps, 1, cfg.dt)
    coords = tf.default_source_coords(1, n, n, n)
    sim = tf.Simulator(grid, cfg, m, coords)

    # Randomized IC built ON DEVICE (host memory here runs at ~50 MB/s, so
    # host-side prep is minutes); reps CHAIN on-device — each rep's evolved
    # state is the next rep's IC, so no rep repeats a bit-identical
    # (program, input) pair (which this stack can serve from an execution
    # cache, faking timings). (The reference zeroes u each rep,
    # main.cpp:389 — timing is IC-independent.)
    state = sim.prepare_state_random(0)
    times = []
    for rep in range(reps):
        # timing_repeat=8 stretches the timed span to 8x45 steps (on a
        # throwaway state copy), amortizing the tunnel's per-dispatch
        # jitter that gave single-span reps ~12 % stddev (VERDICT r4 #1);
        # the physics state still advances the real 45 steps per rep
        state, secs = sim.run_timed(state, src, timing_repeat=8)
        times.append(secs)
    # median over reps: each rep's device time comes from a two-span delta
    # whose noise is symmetric, so min() would bias optimistic
    device_time = float(np.median(times[1:]))  # drop the compile rep

    # reference convention: model uses the FULL step count against the timed
    # (post-warmup) device time (main.cpp:429-431)
    gflops = metrics.gflops_model(n, n, n, nsteps, device_time, grid.order)
    gbps_opt = metrics.gbps_model(n, n, n, nsteps, device_time, metrics.BYTES_OPTIMIZED)
    mem_eff = gbps_opt / peaks.hbm_gbps * 100.0
    gcells = n**3 * nsteps / device_time / 1e9

    print(
        json.dumps(
            {
                "metric": "512^3x50 HBM efficiency (12B/pt model) vs chip peak",
                "value": round(mem_eff, 2),
                "unit": "%",
                "vs_baseline": round(mem_eff / 28.3, 3),
                "gcells_per_s": round(gcells, 2),
                "gflops_model": round(gflops, 1),
                "device_time_ms": round(device_time * 1e3, 2),
                "rel_l2_vs_oracle_128": l2,
                "correctness_pass": bool(l2 < 1e-4),
                "device": peaks.name,
                "chip_peak_gbps": peaks.hbm_gbps,
                "baseline": "CUDA_Optimized 28.3% of H100 peak (STABILITY_FIX_LOG.md:153)",
            }
        )
    )


if __name__ == "__main__":
    main()
