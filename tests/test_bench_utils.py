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


# ---------------------------------------------------------------------------
# _project_stalls: the <2%-stall envelope math behind the BASELINE claim
# ---------------------------------------------------------------------------

def _stall_record(**over):
    """Round numbers chosen so the envelope closed forms are exact:
    bscale=2, serial=50 ms, batch 100 MB raw / 50 MB zlib, step 100 ms,
    limit = 100 * (1 + 0.02/0.98) ~= 102.04 ms."""
    r = {
        "pipeline_batch": 16, "host_assemble_ms": 25.0, "batch_MB": 50.0,
        "step_time_ms": 100.0,
        "storage_MBps_cold": 100000.0, "storage_cold_ram_backed": False,
        "host_assemble_zlib_ms": 250.0, "pack_zlib_ratio": 2.0,
    }
    r.update(over)
    return r


def test_project_stalls_raw_format(monkeypatch):
    bench = _load_bench()
    monkeypatch.delenv("RXTPU_PROD_CORES", raising=False)
    monkeypatch.delenv("RXTPU_PROD_POOL_EFF", raising=False)
    monkeypatch.delenv("RXTPU_PROD_STORAGE_MBPS", raising=False)
    r = _stall_record()
    bench._project_stalls(r, 32)
    # raw pack: 100 MB / 0.1 s step
    assert r["storage_MBps_required"] == 1000.0
    # assembly is all serial floor -> pool is empty -> 1 core suffices
    assert r["min_cores_for_2pct"] == 1
    np.testing.assert_allclose(
        r["min_storage_MBps_for_2pct"], 100.0 / (0.1 * (1 + 0.02 / 0.98)))
    # 50 ms serial + fast disk + 12.5 ms pcie all hide under the 100 ms step
    assert r["projected_stall_pct_at_measured_storage"] == 0.0
    assert r["projected_stall_pct_prod_cores_measured_storage"] == 0.0
    assert r["projected_stall_pct_production_ref"] == 0.0


def test_project_stalls_min_cores_envelope(monkeypatch):
    """Feeding with exactly min_cores_for_2pct holds stall <= 2%; one
    fewer core busts it (the envelope is the boundary it claims)."""
    bench = _load_bench()
    monkeypatch.delenv("RXTPU_PROD_POOL_EFF", raising=False)
    monkeypatch.delenv("RXTPU_PROD_STORAGE_MBPS", raising=False)
    base = _stall_record()
    bench._project_stalls(dict(base), 32)  # warm: compute min cores
    probe = dict(base)
    bench._project_stalls(probe, 32)
    n = probe["min_cores_for_2pct_zlib"]
    assert n == 10  # pool 450 ms / (0.9 * (102.04 - 50) ms) = 9.6 -> 10

    def stall_at(cores):
        monkeypatch.setenv("RXTPU_PROD_CORES", str(cores))
        rr = dict(base)
        bench._project_stalls(rr, 32)
        return rr["projected_stall_pct_prod_cores_measured_storage_zlib"]

    assert stall_at(n) <= 2.0
    assert stall_at(n - 1) > 2.0


def test_project_stalls_pool_eff_sensitivity(monkeypatch):
    """The cores envelope is published at derated pool efficiencies so
    the asserted 0.9 scaling isn't a single point of failure: pool
    450 ms / (eff * 52.04 ms) -> 10 / 13 / 18 cores at 0.9 / 0.7 / 0.5."""
    bench = _load_bench()
    monkeypatch.delenv("RXTPU_PROD_CORES", raising=False)
    monkeypatch.delenv("RXTPU_PROD_POOL_EFF", raising=False)
    monkeypatch.delenv("RXTPU_PROD_STORAGE_MBPS", raising=False)
    r = _stall_record()
    bench._project_stalls(r, 32)
    assert r["min_cores_for_2pct_zlib"] == 10
    assert r["min_cores_for_2pct_zlib_eff70"] == 13
    assert r["min_cores_for_2pct_zlib_eff50"] == 18
    # raw is all serial floor: 1 core at every efficiency
    assert r["min_cores_for_2pct_eff50"] == 1
    # a busted serial floor nulls every efficiency row alike
    rb = _stall_record(host_assemble_ms=60.0)
    bench._project_stalls(rb, 32)
    assert rb["min_cores_for_2pct"] is None
    assert rb["min_cores_for_2pct_eff70"] is None


def test_project_stalls_min_storage_envelope(monkeypatch):
    """A disk at exactly min_storage_MBps_for_2pct projects exactly 2%."""
    bench = _load_bench()
    monkeypatch.delenv("RXTPU_PROD_CORES", raising=False)
    monkeypatch.delenv("RXTPU_PROD_POOL_EFF", raising=False)
    probe = _stall_record()
    bench._project_stalls(probe, 32)
    edge = probe["min_storage_MBps_for_2pct"]
    r = _stall_record(storage_MBps_cold=edge)
    bench._project_stalls(r, 32)
    np.testing.assert_allclose(r["projected_stall_pct_prod_cores_measured_storage"], 2.0,
                               rtol=1e-9)


def test_project_stalls_best_trial_storage(monkeypatch):
    """The best-measured-storage projection uses the max (least
    tenant-contended) trial: a contended median that busts the step
    budget must not drag it down, and without a recorded best trial it
    falls back to the median."""
    bench = _load_bench()
    monkeypatch.delenv("RXTPU_PROD_CORES", raising=False)
    monkeypatch.delenv("RXTPU_PROD_POOL_EFF", raising=False)
    # raw batch 100 MB / step 100 ms => requires 1000 MB/s; median 500
    # (contended, 200 ms feed => 50% stall) but best trial 2000 hides
    r = _stall_record(storage_MBps_cold=500.0,
                      storage_MBps_cold_best=2000.0)
    bench._project_stalls(r, 32)
    assert r["projected_stall_pct_at_measured_storage"] == 50.0
    assert r["projected_stall_pct_at_best_measured_storage"] == 0.0
    r2 = _stall_record(storage_MBps_cold=500.0)
    bench._project_stalls(r2, 32)
    np.testing.assert_allclose(
        r2["projected_stall_pct_at_best_measured_storage"], 50.0)
    r3 = _stall_record(storage_cold_ram_backed=True)
    bench._project_stalls(r3, 32)
    assert "projected_stall_pct_at_best_measured_storage" not in r3


def test_project_stalls_serial_floor_busts(monkeypatch):
    """When the serial assembly floor alone exceeds the 2% budget, no
    core count helps: min_cores must be None, not a misleading number."""
    bench = _load_bench()
    r = _stall_record(host_assemble_ms=60.0)  # serial 120 ms > 102 ms limit
    bench._project_stalls(r, 32)
    assert r["min_cores_for_2pct"] is None
    assert r["projected_stall_pct_prod_cores_measured_storage"] > 2.0


def test_project_stalls_ram_backed_skips_measured(monkeypatch):
    """tmpfs-backed probes produce no measured-storage projection (the
    number would be memory bandwidth), but the reference-host projection
    must still be published."""
    bench = _load_bench()
    monkeypatch.delenv("RXTPU_PROD_STORAGE_MBPS", raising=False)
    r = _stall_record(storage_cold_ram_backed=True)
    bench._project_stalls(r, 32)
    assert "projected_stall_pct_at_measured_storage" not in r
    assert "projected_stall_pct_prod_cores_measured_storage" not in r
    assert r["prod_storage_MBps_ref"] == 1500.0
    assert "projected_stall_pct_production_ref" in r
    assert "projected_stall_pct_production_ref_zlib" in r
