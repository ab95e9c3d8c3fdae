"""Unit coverage for bench.py helpers that run on every driver bench."""

import importlib.util
import os

import numpy as np


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_storage_cold_mbps(tmp_path):
    bench = _load_bench()
    rate = bench._storage_cold_mbps(str(tmp_path), chunk=1 << 16,
                                    probe_mb=8, budget_mb=4)
    assert np.isfinite(rate) and rate > 0
    # probe file is cached for reuse across bench runs
    files = [f for f in os.listdir(tmp_path) if f.startswith("storage_probe")]
    assert len(files) == 1
    # second call reuses the cached file and still measures
    rate2 = bench._storage_cold_mbps(str(tmp_path), chunk=1 << 16,
                                     probe_mb=8, budget_mb=4)
    assert np.isfinite(rate2) and rate2 > 0


def test_ram_backed_detection():
    """tmpfs cache dirs must be flagged: fadvise can't evict RAM pages,
    so the 'cold' probe there measures memory bandwidth, not a disk."""
    bench = _load_bench()
    # "/" is the root mount — never tmpfs (containers use overlay/ext4)
    assert bench._ram_backed("/") is False
    if os.path.isdir("/dev/shm"):
        assert bench._ram_backed("/dev/shm") is True
    # nonexistent paths resolve under the root mount and never raise
    assert bench._ram_backed("/nonexistent/x") is False
