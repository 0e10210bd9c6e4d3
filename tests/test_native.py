"""Native C++ harness library (ctypes) vs NumPy reference implementations."""

import numpy as np
import pytest

native = pytest.importorskip("tpufdtd.native")

import tpufdtd as tf
from tpufdtd.harness import correctness


def test_error_scan_matches_python():
    rng = np.random.default_rng(0)
    ref = rng.normal(100, 10, size=10000)
    test = ref + rng.normal(0, 1e-4, size=10000)
    test[5] = np.nan
    test[17] = np.inf
    got = native.error_scan(test, ref)
    # python fallback path
    correctness._native_error_scan, saved = None, correctness._native_error_scan
    try:
        want = correctness.error_scan(test, ref)
    finally:
        correctness._native_error_scan = saved
    assert got[3] == want[3] == 1  # nan count
    assert got[4] == want[4] == 1  # inf count
    np.testing.assert_allclose(got[:3], want[:3], rtol=1e-12)


def test_ricker_matches_python():
    a = native.ricker(50, 3, 0.001)
    b = tf.ricker_table(50, 3, 0.001)
    # libm expf vs numpy's exp differ by <=1 ulp
    np.testing.assert_allclose(a, b, atol=1e-7)


def test_stats():
    vals = [1.0, 2.0, 3.0, 4.0]
    mean, std = native.stats(vals)
    assert mean == 2.5
    np.testing.assert_allclose(std, np.std(vals), rtol=1e-12)


def test_field_scan():
    u = np.array([1.0, -5.0, np.nan, np.inf, 2.0], np.float32)
    max_abs, nans, infs = native.field_scan(u)
    assert max_abs == 5.0 and nans == 1 and infs == 1


def test_csv_append(tmp_path):
    from tpufdtd.utils.csvio import HEADER

    p = str(tmp_path / "bench.csv")
    native.csv_append(p, ["pallas", 1.5, 2, 0.25] + [0] * 20)
    native.csv_append(p, ["jnp", 2.5, 3, 0.5] + [0] * 20)
    lines = open(p).read().strip().split("\n")
    assert lines[0] == HEADER
    assert len(lines) == 3
    assert lines[1].startswith("pallas,1.5,2,0.25")
    assert len(lines[1].split(",")) == len(HEADER.split(","))
