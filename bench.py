"""Training-throughput benchmark (driver contract: ONE JSON line).

Measures the sustained end-to-end train-step rate of the flagship config —
ResNet-50 TwoSitesNN, bf16, 364^2 crops taken on device from raw 512^2
uint8 6-channel views (augment fused into the step) — on the available
accelerator, and reports 512^2x6-ch images(views)/sec/chip against the
BASELINE.json north-star of 5000.

The JSON line tells the whole story:
- ``value``: resident-batch train rate (pure device step, no input system).
- ``detail.pipeline_ips`` / ``detail.input_stall_pct``: the same step fed
  end-to-end from an rxpack dataset through ``rxtpu.data.pipeline`` with
  double-buffered host->device transfer — measured input stall included.
- ``detail.mxu_ceiling_ips``: pure-matmul bound = verified chip peak
  (chained-matmul measurement, CLAUDE.md) / compiled FLOPs of this exact
  step (XLA cost analysis: 67 GFLOP/view fwd+bwd). At 176 TFLOPS that
  bound is ~2619 views/s/chip: the 5000 north star exceeds the chip's
  OWN matmul peak by 1.9x for ResNet-50 *training* at 364^2 — it is a
  number for inference-style workloads, not reachable by any training
  step on this hardware. Read vs_baseline against
  ``explained_ceiling_ips`` (the per-op analytic train-step ceiling:
  ``dev/eval_ceiling.py --train`` — MXU lane utilization for every
  conv/dgrad/wgrad, ideal-fusion HBM traffic for train-mode BN fwd+bwd,
  maxpool, the measured augment kernel floor, and SGD+metrics traffic).
- ``detail.projected_stall_pct_pcie``: input stall on a production host
  (PCIe H2D), derived from the measured steady-state assembly rate; the
  on-rig ``input_stall_pct`` is dominated by the dev tunnel's ~10-30 MB/s
  host->device relay (reported as ``h2d_MBps``).
- ``detail.storage_MBps_required[_fmt]``, ``projected_stall_pct_
  production_ref[_fmt]``, ``min_cores_for_2pct[_fmt]`` and ``min_storage_
  MBps_for_2pct[_fmt]`` for fmt in {raw, zlib, zf (PNG-filtered zlib
  rxpack), zs (zstd), zsf (PNG-filtered zstd), jpeg}: the production-host
  input-stall model per feed format (measured assembly/inflate/decode
  costs + measured cold-storage rate + a documented core-scaling model —
  see ``_project_stalls``). The <2% BASELINE axis is judged on these: at
  the reference 14-core host the compressed pack must project under 2%
  at its stated storage envelope.

- ``detail.eval_ips_per_chip``: the inference-class rate (center-crop +
  normalize + forward, no bwd) — the workload class where the 5000
  north star is approachable at all (see mxu_ceiling_ips above).

Usage: python bench.py [--steps N] [--batch B] [--backbone resnet50]
                       [--no-pipeline] [--pipeline-steps N] [--no-eval]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

# bf16 chip peak verified with chained 8192^3 matmuls on this v5e (CLAUDE.md);
# used for the MXU ceiling so the bound reflects the chip we measure on.
MEASURED_PEAK_FLOPS = 176e12


def _build(backbone: str, batch: int, crop: int, src: int):
    import jax

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.parallel import make_mesh, place_state
    from rxtpu.train import build_model, create_train_state, make_train_step

    n_dev = jax.device_count()
    mesh = make_mesh(n_devices=n_dev)
    cfg = Config(
        data=DataConfig(path_data="unused", crop_size=crop, src_size=src),
        model=ModelConfig(backbone=backbone, pretrained=False),
        train=TrainConfig(bs_per_device=batch),
        experiment_id="bench",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=100, n_devices=n_dev)
    state = place_state(state, mesh)
    step = make_train_step(model, crop, donate=True)
    return mesh, state, step, n_dev, model


G = 3  # sites*channels grouping of the train/eval batch (pipeline "train" mode)


def _make_synthetic_batch(global_batch: int, src: int):
    rng = np.random.default_rng(0)
    return {
        "images": rng.integers(
            0, 256, size=(global_batch, G, 6, src, src), dtype=np.uint8),
        "labels": rng.integers(0, 1108, size=(global_batch,)).astype(np.int32),
        "mean": rng.uniform(0.2, 0.6, (global_batch, 6)).astype(np.float32),
        "std": rng.uniform(0.1, 0.4, (global_batch, 6)).astype(np.float32),
    }


def run_bench(backbone: str, batch: int, steps: int, warmup: int, crop: int,
              src: int, built=None):
    """Resident-batch train rate. Returns (metrics, built) where ``built``
    is the (mesh, state, step, n_dev, model) tuple with the POST-bench
    state (the original buffers are donated away by the step)."""
    import jax
    import jax.numpy as jnp

    from rxtpu.parallel import shard_batch

    mesh, state, step, n_dev, model = built or _build(backbone, batch, crop, src)
    global_batch = batch * n_dev

    dbatch = shard_batch(_make_synthetic_batch(global_batch, src), mesh)
    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)

    flops = None
    try:
        lowered = step.lower(state, dbatch, key, flag)
        flops = lowered.compile().cost_analysis()["flops"]
    except Exception:
        pass

    for _ in range(max(warmup, 1)):  # >=1: compile must stay out of the timing
        state, m = step(state, dbatch, key, flag)
    float(m["loss"])  # host readback: the only reliable barrier on tunneled chips

    t0 = time.perf_counter()
    for _ in range(steps):
        state, m = step(state, dbatch, key, flag)
    # readback of the last loss forces the whole step chain (each step
    # consumes the previous state); block_until_ready alone can ack early
    # through remote-relay transports
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss

    views_per_step = global_batch * G  # each view is one 512^2 6-channel image
    ips = views_per_step * steps / dt
    ips_per_chip = ips / n_dev
    out = {
        "ips_per_chip": ips_per_chip,
        "ips_total": ips,
        "step_time_ms": 1000 * dt / steps,
        "n_devices": n_dev,
        "global_batch": global_batch,
        "backend": jax.default_backend(),
    }
    if flops:
        # pure-MXU bound for THIS compiled program at verified chip peak
        out["flops_per_step"] = flops
        out["mxu_ceiling_ips"] = views_per_step * MEASURED_PEAK_FLOPS / flops / n_dev
        out["mfu_pct"] = 100.0 * flops * (steps / dt) / (n_dev * MEASURED_PEAK_FLOPS)
    return out, (mesh, state, step, n_dev, model)


def _stack_on_device(dbatch, mesh, k: int):
    """Materialize a [K, ...] batch window ON DEVICE from a resident batch
    (no relay H2D; K distinct HBM copies, so scan traffic is realistic).
    Scan axis replicated, batch dim sharded over 'data'."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from rxtpu.parallel import batch_sharding

    sh = batch_sharding(mesh)
    out = {}
    for key, v in dbatch.items():
        s = NamedSharding(mesh, P(None, *sh[key].spec))
        out[key] = jax.jit(
            lambda x: jnp.broadcast_to(x[None], (k,) + x.shape),
            out_shardings=s,
        )(v)
    return out


def run_eval_bench(backbone: str, batch: int, steps: int, crop: int, src: int,
                   built=None, scan_window: int = 8):
    """Inference rate (eval step: center-crop + normalize + fwd, no bwd).

    The 5000-views/s north star is an inference-class number (the TRAIN
    mxu ceiling is ~2620, see module docstring); this leg reports where
    this implementation stands on that workload. The eval forward runs on
    BN-FOLDED weights (rxtpu.infer.fold) by default.
    """
    from rxtpu.parallel import shard_batch
    from rxtpu.train import make_eval_step

    mesh, state, _, n_dev, model = built or _build(backbone, batch, crop, src)
    estep = make_eval_step(model, crop)
    global_batch = batch * n_dev
    dbatch = shard_batch(_make_synthetic_batch(global_batch, src), mesh)
    m = None
    for _ in range(3):  # compile + relay warmup
        m = estep(state, dbatch)
    float(m["loss_sum"])
    t0 = time.perf_counter()
    for _ in range(steps):
        m = estep(state, dbatch)
    float(m["loss_sum"])
    dt = time.perf_counter() - t0
    out = {"eval_ips_per_chip": global_batch * G * steps / dt / n_dev,
           "eval_step_time_ms": 1000 * dt / steps}

    # scanned window: K batches per dispatch (make_scanned_eval_step) —
    # one launch serves K batches, amortizing the per-dispatch runtime
    # overhead that does not overlap execution on relay-attached chips
    from rxtpu.train import make_scanned_eval_step

    sstep = make_scanned_eval_step(model, crop)
    wbatch = _stack_on_device(dbatch, mesh, scan_window)
    reps = max(1, steps // scan_window)
    m = None
    for _ in range(2):  # compile + relay warmup
        m = sstep(state, wbatch)
    float(m["loss_sum"])
    t0 = time.perf_counter()
    for _ in range(reps):
        m = sstep(state, wbatch)
    float(m["loss_sum"])
    dt = time.perf_counter() - t0
    nb = scan_window * reps
    out["eval_scanned_ips_per_chip"] = global_batch * G * nb / dt / n_dev
    out["eval_scanned_step_time_ms"] = 1000 * dt / nb
    out["eval_scan_window"] = scan_window

    # W8A8 int8 leg (rxtpu.infer.quant, CLI --quantize int8): same
    # eval-shape inference on the quantized forward — the one lever that
    # moves the bf16 composition ceiling itself (int8 MXU 232.7 TOPS
    # measured = 1.32x, dev/int8_probe.py). Scanned window as above.
    try:
        from rxtpu.infer import calibrate, prepare_quantized
        from rxtpu.infer.quant import make_scanned_quantized_predict_step

        pbatch = {k: dbatch[k] for k in ("images", "mean", "std")}
        qvars = prepare_quantized(
            model, state, calibrate(model, state, [pbatch], crop))
        qstep = make_scanned_quantized_predict_step(model, crop)
        qwbatch = {k: wbatch[k] for k in ("images", "mean", "std")}
        p = None
        for _ in range(2):
            p = qstep(qvars, qwbatch)
        float(p[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            p = qstep(qvars, qwbatch)
        float(p[0, 0, 0])
        dt = time.perf_counter() - t0
        out["eval_int8_scanned_ips_per_chip"] = (
            global_batch * G * nb / dt / n_dev)
        out["eval_int8_scanned_step_time_ms"] = 1000 * dt / nb
    except Exception:
        import traceback

        traceback.print_exc()
        out["eval_int8_scanned_ips_per_chip"] = None
    return out


def run_predict_bench(backbone: str, batch: int, steps: int, src: int,
                      built=None):
    """Reference TEST inference rate: G=6 two-site predict, FULL-SIZE views
    (the reference test transform normalizes without cropping,
    dataloader.py:128-139; forward+softmax per test.py:23-32). This is the
    workload a reference user actually runs at submission time."""
    import jax

    from rxtpu.parallel import shard_batch
    from rxtpu.train.step import make_predict_step

    mesh, state, _, n_dev, model = built or _build(backbone, batch, 364, src)
    pstep = make_predict_step(model, crop_size=None)
    global_batch = batch * n_dev
    rng = np.random.default_rng(1)
    pg = 6
    dbatch = shard_batch({
        "images": rng.integers(
            0, 256, size=(global_batch, pg, 6, src, src), dtype=np.uint8),
        "mean": rng.uniform(0.2, 0.6, (global_batch, 6)).astype(np.float32),
        "std": rng.uniform(0.1, 0.4, (global_batch, 6)).astype(np.float32),
    }, mesh)
    probs = None
    for _ in range(3):  # compile + relay warmup
        probs = pstep(state, dbatch)
    float(probs[0, 0])
    t0 = time.perf_counter()
    for _ in range(steps):
        probs = pstep(state, dbatch)
    float(probs[0, 0])
    dt = time.perf_counter() - t0
    out = {"predict_full_ips_per_chip": global_batch * pg * steps / dt / n_dev,
           "predict_full_step_time_ms": 1000 * dt / steps}

    # scanned window (see run_eval_bench): K full-size predict batches per
    # dispatch; 4 windows keep the uint8 window under ~600 MB HBM
    from rxtpu.train import make_scanned_predict_step

    scan_window = 4
    sstep = make_scanned_predict_step(model, crop_size=None)
    wbatch = _stack_on_device(dbatch, mesh, scan_window)
    reps = max(1, steps // scan_window)
    probs = None
    for _ in range(2):
        probs = sstep(state, wbatch)
    float(probs[0, 0, 0])
    t0 = time.perf_counter()
    for _ in range(reps):
        probs = sstep(state, wbatch)
    float(probs[0, 0, 0])
    dt = time.perf_counter() - t0
    nb = scan_window * reps
    out["predict_full_scanned_ips_per_chip"] = global_batch * pg * nb / dt / n_dev
    out["predict_full_scanned_step_time_ms"] = 1000 * dt / nb

    # W8A8 int8 full-size leg: the CLI's --quantize int8 test workload
    try:
        from rxtpu.infer import calibrate, prepare_quantized
        from rxtpu.infer.quant import make_scanned_quantized_predict_step

        hbatch = {k: dbatch[k] for k in ("images", "mean", "std")}
        qvars = prepare_quantized(
            model, state, calibrate(model, state, [hbatch], None))
        qstep = make_scanned_quantized_predict_step(model, crop_size=None)
        qwbatch = {k: wbatch[k] for k in ("images", "mean", "std")}
        probs = None
        for _ in range(2):
            probs = qstep(qvars, qwbatch)
        float(probs[0, 0, 0])
        t0 = time.perf_counter()
        for _ in range(reps):
            probs = qstep(qvars, qwbatch)
        float(probs[0, 0, 0])
        dt = time.perf_counter() - t0
        out["predict_full_int8_scanned_ips_per_chip"] = (
            global_batch * pg * nb / dt / n_dev)
        out["predict_full_int8_scanned_step_time_ms"] = 1000 * dt / nb
    except Exception:
        import traceback

        traceback.print_exc()
        out["predict_full_int8_scanned_ips_per_chip"] = None
    return out


# ---------------------------------------------------------------------------
# End-to-end pipeline-fed measurement: rxpack -> Pipeline -> device_prefetch
# -> fused train step, with the input stall measured (BASELINE <2% target).
# ---------------------------------------------------------------------------

def _bench_dataset(src: int, min_records: int):
    """Synthetic jpeg tree + rxpack variants under a reusable cache dir.

    v2: image content is ``content="cells"`` (dark-field fluorescence-like
    planes — sparse Gaussian cells + sensor noise) instead of 60-level
    i.i.d. uniform noise. Uniform noise carries ~5.9 bits/pixel of
    irreducible entropy, which capped every codec at ~1.3x and made the
    compressed-pack storage numbers unrepresentative of the RxRx1 content
    the reference actually trains on. Compute-leg timings are unaffected
    (the step never sees pixel statistics).
    """
    cache = os.environ.get("RXTPU_BENCH_CACHE", "/tmp/rxtpu_bench_data_v2")
    # the marker records the CONTENT MODE: a stale cache (e.g. v1 uniform
    # noise under a reused RXTPU_BENCH_CACHE) must fully regenerate, not
    # get topped up with packs whose ratios contradict the cells claim.
    # A bigger same-src cells cache satisfies a smaller request (bench and
    # feed_scaling ask for different min_records; don't thrash the dir).
    import glob as _glob

    marker = os.path.join(cache, f"ok_{src}_{min_records}_cells")
    for m in _glob.glob(os.path.join(cache, f"ok_{src}_*_cells")):
        try:
            have = int(os.path.basename(m).split("_")[2])
        except ValueError:
            continue
        if have >= min_records:
            marker = m
            break
    if not os.path.exists(marker):
        import shutil

        from rxtpu.data.pack import write_pack
        from rxtpu.data.records import load_metadata, read_metadata_csvs
        from rxtpu.data.synthetic import make_synthetic_dataset

        if os.path.isdir(cache):
            shutil.rmtree(cache)
        os.makedirs(cache, exist_ok=True)
        make_synthetic_dataset(
            cache, experiments=("HUVEC-01", "U2OS-01"), plates=(1, 2),
            wells_per_plate=max(4, min_records // 4 + 1), img_size=src,
            splits=("train",), content="cells",
        )
        df, dfc = read_metadata_csvs(os.path.join(cache, "metadata"), "train")
        idx = load_metadata(df, dfc, "train")
        write_pack(idx, cache, os.path.join(cache, "pack"), src_size=src)
        write_pack(idx, cache, os.path.join(cache, "pack_z"), src_size=src,
                   compress="zlib")
        write_pack(idx, cache, os.path.join(cache, "pack_zf"), src_size=src,
                   compress="zlib", filter="png")
        # zstd level 19: one-time pack cost, decompress speed is
        # level-independent — buy all the ratio the codec has
        write_pack(idx, cache, os.path.join(cache, "pack_zs"), src_size=src,
                   compress="zstd", compress_level=19)
        write_pack(idx, cache, os.path.join(cache, "pack_zsf"), src_size=src,
                   compress="zstd", compress_level=19, filter="png")
        with open(marker, "w") as f:
            f.write("ok")
    # same-content caches written before the zstd formats: top up in place
    for sub, kw in (("pack_zs", dict(compress="zstd", compress_level=19)),
                    ("pack_zsf", dict(compress="zstd", compress_level=19,
                                      filter="png"))):
        if not os.path.exists(os.path.join(cache, sub, "train.rxpack")):
            from rxtpu.data.pack import write_pack
            from rxtpu.data.records import load_metadata, read_metadata_csvs

            df, dfc = read_metadata_csvs(
                os.path.join(cache, "metadata"), "train")
            idx = load_metadata(df, dfc, "train")
            write_pack(idx, cache, os.path.join(cache, sub), src_size=src,
                       **kw)
    return cache


def _ram_backed(path: str) -> bool:
    """True when ``path`` lives on a RAM filesystem (tmpfs/ramfs), where
    POSIX_FADV_DONTNEED cannot evict pages (they ARE the backing store)
    and a "cold" read probe would just measure memory bandwidth."""
    real = os.path.realpath(path)
    best, fstype = "", ""
    try:
        with open("/proc/mounts") as f:
            for line in f:
                parts = line.split()
                if len(parts) >= 3:
                    mnt = parts[1].replace("\\040", " ")
                    if (real == mnt or real.startswith(mnt.rstrip("/") + "/")
                            ) and len(mnt) > len(best):
                        best, fstype = mnt, parts[2]
    except OSError:
        return False
    return fstype in ("tmpfs", "ramfs")


def _storage_cold_mbps(cache_dir: str, chunk: int, probe_mb: int = 384,
                       budget_mb: int = 192) -> float:
    """Cold-cache storage read rate in the pipeline's access pattern.

    The warm `host_assemble_ms` is measured with the rxpack fully in page
    cache; at Kaggle scale (440k files / ~100 GB) the feed is bounded by
    how fast the disk serves record-sized reads instead. The rxpack
    itself is actively memmapped (fadvise can't evict mapped pages), so
    the probe uses a dedicated scratch file: written once into the bench
    cache, fsync'd, evicted with POSIX_FADV_DONTNEED every run, then read
    in pack-record-sized chunks in random order (the Pipeline's access
    pattern over a shuffled epoch).
    """
    path = os.path.join(cache_dir, f"storage_probe_{probe_mb}mb.bin")
    if not os.path.exists(path) or os.path.getsize(path) != probe_mb << 20:
        with open(path, "wb") as f:
            block = np.random.default_rng(7).integers(
                0, 256, 1 << 20, dtype=np.uint8).tobytes()
            for _ in range(probe_mb):
                f.write(block)
            f.flush()
            os.fsync(f.fileno())
    chunk = max(int(chunk), 1 << 16)
    n_chunks = (probe_mb << 20) // chunk
    order = np.random.default_rng(3).permutation(n_chunks)
    fd = os.open(path, os.O_RDONLY)
    try:
        os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
        t0 = time.perf_counter()
        got = 0
        for i in order:
            os.lseek(fd, int(i) * chunk, os.SEEK_SET)
            got += len(os.read(fd, chunk))
            if got >= budget_mb << 20:
                break
        dt = time.perf_counter() - t0
    finally:
        os.close(fd)
    return got / dt / 1e6


def run_pipeline_bench(backbone: str, batch: int, steps: int, crop: int, src: int):
    import jax
    import jax.numpy as jnp

    from rxtpu.data.pack import PackStore
    from rxtpu.data.pipeline import Pipeline
    from rxtpu.data.records import load_metadata, read_metadata_csvs
    from rxtpu.parallel import make_put
    from rxtpu.train.metrics import StepTimer

    mesh, state, step, n_dev, _model = _build(backbone, batch, crop, src)
    global_batch = batch * n_dev
    root = _bench_dataset(src, min_records=2 * global_batch)

    df, dfc = read_metadata_csvs(os.path.join(root, "metadata"), "train")
    idx = load_metadata(df, dfc, "train")
    store = PackStore(os.path.join(root, "pack", "train.rxpack"))
    exps = sorted({r.experiment for r in idx.records})
    stats = {e: {"mean": np.full(6, 0.5), "std": np.full(6, 0.25)} for e in exps}
    pipe = Pipeline(idx, store, stats, global_batch, "train", src_size=src,
                    seed=0, prefetch_depth=3)
    put = make_put(mesh)
    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)
    timer = StepTimer()

    def batches():
        epoch = 0
        while True:
            for b in pipe.epoch(epoch):
                b.pop("id_codes", None)
                b.pop("valid", None)
                yield b
            epoch += 1

    # host->device link bandwidth: on this dev rig the chip sits behind a
    # remote relay (~30 MB/s); a production v5e host feeds over PCIe
    # (>= 8 GB/s). Measured so the stall numbers are interpretable.
    probe = np.zeros((8 << 20,), np.uint8)
    # warmup transfer + readback: compiles the sum, drains the relay queue,
    # and (readback, not block_until_ready) actually lands the bytes
    d = jax.device_put(probe)
    float(jnp.sum(d[:16]))
    # device-resident readback latency = the relay roundtrip to subtract
    t0 = time.perf_counter()
    float(jnp.sum(d[:16]))
    rtt_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    d = jax.device_put(probe)
    float(jnp.sum(d[:16]))
    h2d_s = max(time.perf_counter() - t0 - rtt_s, 1e-9)
    h2d_mbps = probe.nbytes / h2d_s / 1e6

    # host assembly rate (what bounds the feed when H2D is not the tunnel):
    # steady-state producer inter-arrival time, page cache warm
    host_it = batches()
    hb = next(host_it)
    for _ in range(3):
        next(host_it)  # warm page cache across the record set
    t0 = time.perf_counter()
    n_probe = 4
    for _ in range(n_probe):
        next(host_it)
    assemble_s = (time.perf_counter() - t0) / n_probe
    # stop the probe's producer thread and release its prefetched batches
    # before the measured leg starts its own producer
    host_it.close()

    # alternative-feed legs: the same batches assembled from (a) the zlib
    # rxpack, (b) the PNG-filtered zlib rxpack (inflate+unfilter in the
    # native pool), and (c) the compressed JPEG tree (reference-parity
    # feed: cached bytes -> native libjpeg pool, dataloader.py:55-62).
    # Each yields an assembly cost and a bytes-per-batch figure for the
    # production stall projections below. Ratios are measured on the
    # "cells" content (dark-field microscopy-like), not assumed.
    raw_path = os.path.join(root, "pack", "train.rxpack")

    def _assemble_rate(store) -> float:
        p = Pipeline(idx, store, stats, global_batch, "train",
                     src_size=src, seed=0, prefetch_depth=3)

        def gen():
            epoch = 0
            while True:
                for b in p.epoch(epoch):
                    b.pop("id_codes", None)
                    b.pop("valid", None)
                    yield b
                epoch += 1

        it = gen()
        for _ in range(4):
            next(it)  # warm (page cache + pool threads + numpy buffers)
        t0 = time.perf_counter()
        for _ in range(n_probe):
            next(it)
        dt = (time.perf_counter() - t0) / n_probe
        it.close()
        return dt

    raw_pack_bytes = os.path.getsize(raw_path)
    feed_legs = {}
    for tag, sub in (("zlib", "pack_z"), ("zf", "pack_zf"),
                     ("zs", "pack_zs"), ("zsf", "pack_zsf")):
        z_path = os.path.join(root, sub, "train.rxpack")
        if not os.path.exists(z_path):
            continue
        ratio = raw_pack_bytes / max(os.path.getsize(z_path), 1)
        feed_legs[tag] = {"ratio": ratio,
                          "assemble_s": _assemble_rate(PackStore(z_path))}
    from rxtpu.data.pipeline import ByteStore

    store_j = ByteStore(idx, root, preload=True)
    total_jpeg_bytes = sum(
        sum(len(b) for b in bufs) for bufs in store_j._cache.values())
    feed_legs["jpeg"] = {
        # raw pack and the jpeg cache cover the same view set, so the
        # byte ratio is directly comparable to the pack ratios
        "ratio": raw_pack_bytes / max(total_jpeg_bytes, 1),
        "assemble_s": _assemble_rate(store_j),
    }

    storage_ram = _ram_backed(root)
    # the cold-storage probe shares a dev-VM virtio disk with other
    # tenants and swings several x run-to-run (213..1080 MB/s observed);
    # take the median of 3 trials and publish the spread
    storage_trials = sorted(
        _storage_cold_mbps(
            root, chunk=hb["images"].nbytes // max(global_batch, 1))
        for _ in range(3))
    storage_mbps = storage_trials[1]

    it = put(batches())
    # warmup: compile + relay warmup out of the measurement window
    for _ in range(4):
        state, m = step(state, next(it), key, flag)
    float(m["loss"])

    t0 = time.perf_counter()
    for _ in range(steps):
        with timer.waiting():
            b = next(it)
        with timer.stepping():
            state, m = step(state, b, key, flag)
    loss = float(m["loss"])
    dt = time.perf_counter() - t0
    assert np.isfinite(loss), loss

    views_per_step = global_batch * G
    step_s = dt / steps
    return {
        "pipeline_ips": views_per_step * steps / dt / n_dev,
        "pipeline_step_time_ms": 1000 * step_s,
        "input_stall_pct": 100.0 * timer.stall_fraction,
        "h2d_MBps": h2d_mbps,
        "host_assemble_ms": 1000 * assemble_s,
        **{f"host_assemble_{t}_ms": 1000 * leg["assemble_s"]
           for t, leg in feed_legs.items()},
        **{f"pack_{t}_ratio": leg["ratio"] for t, leg in feed_legs.items()},
        "storage_MBps_cold": storage_mbps,
        "storage_MBps_cold_trials": [round(x, 1) for x in storage_trials],
        # the max trial is the least tenant-contended observation — the
        # best measured lower bound on the disk HARDWARE's capability
        # (the median conflates other tenants' IO with the disk)
        "storage_MBps_cold_best": storage_trials[-1],
        # tmpfs/ramfs cache => the "cold" probe measured RAM, not a disk;
        # the stall-at-measured-storage projection is suppressed then
        "storage_cold_ram_backed": storage_ram,
        "batch_MB": int(hb["images"].nbytes) / 1e6,
        "pipeline_batch": global_batch,
    }


def _project_stalls(r: dict, bench_batch: int) -> None:
    """Production-host input-stall projections per feed format.

    The BASELINE <2% stall target cannot be measured end-to-end on this
    dev rig (1 CPU core, a ~100 MB/s remote-relay H2D link, and a shared
    virtio disk), so the bench publishes a measurement-grounded model per
    feed format instead. The threaded prefetch overlaps storage reads,
    host assembly and H2D with the device step, so the exposed wait is
    ``max(0, feed - step)`` with ``feed = max(cpu, storage, pcie)``:

    - ``cpu(cores) = serial + pool / (cores * eff)``. The raw-pack
      assembly time (measured ``host_assemble_ms`` — python batch walk +
      memcpy out of the memmap) is kept as a fully SERIAL floor, which is
      conservative (it is memory-bound and the pool could absorb it too).
      The decode/inflate delta over that floor is the work the native
      thread pool hands out per view — embarrassingly parallel; ``eff``
      derates linear scaling for memory-bandwidth sharing. This box has
      ONE core, so only the single-thread rate is measurable here;
      ``dev/feed_scaling.py`` documents the scaling model and measures
      the per-view costs it is built from.
    - ``storage = compressed batch bytes / measured cold MB/s`` (median
      of 3 fadvise-evicted, record-sized random-read trials).
    - ``pcie = raw batch bytes / 8 GB/s`` (production hosts feed over
      PCIe, not this rig's relay).

    Reference host: ``RXTPU_PROD_CORES`` (default 14) cores feeding each
    chip — half of the 28 vCPU/chip a ct5lp-hightpu-8t (224 vCPU, 8
    chips) exposes, so the default undersells production by 2x.
    ``RXTPU_PROD_STORAGE_MBPS`` (default 1500) is the production storage
    reference: the per-chip share of a 100 Gbps GCS/NFS ingest on an
    8-chip host (12.5 GB/s / 8) — local NVMe does better. It exists
    because this rig's shared virtio disk swings ~160..1650 MB/s with
    tenant contention, so the *measured*-storage projection is honest
    about this box but meaningless about production hardware.

    Emits, per format f in {raw "", zlib, zf (PNG-filtered zlib), zs
    (zstd), zsf (PNG-filtered zstd), jpeg}:
    ``storage_MBps_required[_f]``,
    ``projected_stall_pct_at_measured_storage[_f]`` (1 core, this box's
    disk at the median trial),
    ``projected_stall_pct_prod_cores_measured_storage[_f]`` (reference
    cores, this box's measured MEDIAN disk trial — a this-box diagnostic,
    NOT a production claim: the median conflates tenant contention),
    ``projected_stall_pct_at_best_measured_storage[_f]`` (reference
    cores, the best — least tenant-contended — of the 3 measured trials:
    the stall this box's disk hardware demonstrably supports),
    ``projected_stall_pct_production_ref
    [_f]`` (reference cores + reference storage — the production
    claim), ``min_cores_for_2pct[_f]`` and ``min_storage_MBps_for_2pct
    [_f]`` (the <2% envelope). The cores envelope is also emitted at
    derated pool-scaling efficiencies (``min_cores_for_2pct[_f]_eff50``
    / ``_eff70`` vs the default 0.9): the 0.9 figure is asserted from
    pool structure (this 1-core box cannot measure thread scaling), so
    the claim is published with its sensitivity.
    """
    prod_cores = int(os.environ.get("RXTPU_PROD_CORES", "14"))
    pool_eff = float(os.environ.get("RXTPU_PROD_POOL_EFF", "0.9"))
    prod_storage = float(os.environ.get("RXTPU_PROD_STORAGE_MBPS", "1500"))
    bscale = bench_batch / max(r["pipeline_batch"], 1)
    serial_s = bscale * r["host_assemble_ms"] / 1000.0
    batch_mb = bscale * r["batch_MB"]
    step_s = r["step_time_ms"] / 1000.0
    # <2% stall <=> exposed/(exposed+step) <= 0.02 <=> feed <= limit
    limit_s = step_s * (1.0 + 0.02 / 0.98)
    pcie_s = batch_mb * 1e6 / 8e9
    storage = (r["storage_MBps_cold"]
               if r.get("storage_MBps_cold")
               and not r.get("storage_cold_ram_backed") else None)
    storage_best = (r.get("storage_MBps_cold_best") or storage
                    if storage else None)
    r["prod_cores"] = prod_cores
    r["prod_pool_eff"] = pool_eff
    r["prod_storage_MBps_ref"] = prod_storage

    def stall_pct(feed_s: float) -> float:
        exposed = max(0.0, feed_s - step_s)
        return 100.0 * exposed / (exposed + step_s)

    for tag in ("", "zlib", "zf", "zs", "zsf", "jpeg"):
        suffix = f"_{tag}" if tag else ""
        if tag:
            ratio = r.get(f"pack_{tag}_ratio")
            assemble_key = f"host_assemble_{tag}_ms"
            if not ratio or assemble_key not in r:
                continue
            total_s = bscale * r[assemble_key] / 1000.0
            bytes_mb = batch_mb / ratio
        else:
            total_s = serial_s
            bytes_mb = batch_mb
        pool_s = max(0.0, total_s - serial_s)

        def cpu_s(cores: int) -> float:
            return serial_s + pool_s / max(cores * pool_eff, 1e-9)

        r[f"storage_MBps_required{suffix}"] = bytes_mb / step_s
        if storage:
            feed_1core = max(total_s, bytes_mb / storage, pcie_s)
            r[f"projected_stall_pct_at_measured_storage{suffix}"] = (
                stall_pct(feed_1core))
            feed_prod = max(cpu_s(prod_cores), bytes_mb / storage, pcie_s)
            r[f"projected_stall_pct_prod_cores_measured_storage{suffix}"] = (
                stall_pct(feed_prod))
            # at the best (least-contended) measured trial — the stall
            # this box's disk HARDWARE supports, at reference cores
            feed_best = max(cpu_s(prod_cores), bytes_mb / storage_best,
                            pcie_s)
            r[f"projected_stall_pct_at_best_measured_storage{suffix}"] = (
                stall_pct(feed_best))
        feed_ref = max(cpu_s(prod_cores), bytes_mb / prod_storage, pcie_s)
        r[f"projected_stall_pct_production_ref{suffix}"] = stall_pct(feed_ref)
        # <2% envelope: cores bound (storage unconstrained), at the
        # default pool efficiency AND derated sensitivity points
        for eff, ekey in ((pool_eff, ""), (0.7, "_eff70"), (0.5, "_eff50")):
            key = f"min_cores_for_2pct{suffix}{ekey}"
            if serial_s >= limit_s or pcie_s >= limit_s:
                r[key] = None  # serial/PCIe floor alone busts 2%
            else:
                import math

                need = pool_s / (eff * (limit_s - serial_s))
                r[key] = max(1, math.ceil(need))
        # ... and the storage bound (cores unconstrained)
        r[f"min_storage_MBps_for_2pct{suffix}"] = bytes_mb / limit_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--batch", type=int, default=32, help="per-device batch (32 = measured v5e sweet spot; see OPTIMIZATION.md)")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--src", type=int, default=512)
    ap.add_argument("--no-pipeline", action="store_true",
                    help="skip the pipeline-fed end-to-end measurement")
    ap.add_argument("--pipeline-steps", type=int, default=5)
    ap.add_argument("--no-eval", action="store_true",
                    help="skip the inference-rate measurement")
    ap.add_argument("--eval-steps", type=int, default=30)
    ap.add_argument("--no-predict", action="store_true",
                    help="skip the G=6 full-size test-inference measurement")
    ap.add_argument("--predict-steps", type=int, default=12)
    ap.add_argument("--predict-batch", type=int, default=16)
    ap.add_argument("--init-timeout", type=int, default=900,
                    help="seconds to allow backend init before emitting an "
                         "error JSON line (the relay, when down, HANGS "
                         "jax.devices() instead of raising)")
    args = ap.parse_args()

    # Relay-outage watchdog: a half-down relay hangs backend init forever
    # with no exception (blocked inside C, so signal.alarm's Python
    # handler would never run) — a daemon THREAD keeps running and emits
    # an error artifact instead of leaving the driver with nothing.
    import threading

    init_done = threading.Event()

    def _watchdog():
        if not init_done.wait(args.init_timeout):
            print(json.dumps({
                "metric": "train_images_per_sec_per_chip", "value": None,
                "unit": "512^2x6ch views/s/chip", "vs_baseline": None,
                "detail": {"error": "TPU backend init timed out "
                                    f"({args.init_timeout}s) — relay outage"},
            }), flush=True)
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()
    import jax

    jax.devices()
    init_done.set()

    bench_batch = args.batch
    try:
        r, built = run_bench(args.backbone, bench_batch, args.steps,
                             args.warmup, args.crop, args.src)
    except Exception:  # smaller fallback (OOM etc.)
        import traceback

        traceback.print_exc()
        bench_batch = max(1, args.batch // 2)
        r, built = run_bench(args.backbone, bench_batch, args.steps,
                             args.warmup, args.crop, args.src)

    if not args.no_pipeline:
        try:
            # the pipeline leg measures the INPUT system; run it at bs<=16 so
            # the dev rig's ~10-30 MB/s relay H2D doesn't blow the bench
            # budget (stall/assembly rates are what matter, not the step)
            r.update(run_pipeline_bench(
                args.backbone, min(args.batch, 16), args.pipeline_steps,
                args.crop, args.src
            ))
            # production-host stall projections per feed format — see
            # _project_stalls. The pipeline leg runs at bs<=16 while the
            # resident step runs at --batch; feed-side quantities scale
            # linearly with samples (per-record decode/copies) and are
            # rescaled inside.
            feed_s = max(bench_batch / max(r["pipeline_batch"], 1)
                         * r["host_assemble_ms"] / 1000.0,
                         bench_batch / max(r["pipeline_batch"], 1)
                         * r["batch_MB"] * 1e6 / 8e9)
            step_s = r["step_time_ms"] / 1000.0
            exposed = max(0.0, feed_s - step_s)
            r["projected_stall_pct_pcie"] = 100.0 * exposed / (exposed + step_s)
            _project_stalls(r, bench_batch)
        except Exception:
            import traceback

            traceback.print_exc()
            r["input_stall_pct"] = None

    if not args.no_eval:
        try:
            # reuse the train leg's build: state is batch-independent and
            # the step function is rebuilt for eval anyway
            r.update(run_eval_bench(args.backbone, bench_batch,
                                    args.eval_steps, args.crop, args.src,
                                    built=built))
        except Exception:
            import traceback

            traceback.print_exc()
            r["eval_ips_per_chip"] = None  # failed (vs absent = skipped)

    if not args.no_predict:
        try:
            r.update(run_predict_bench(
                args.backbone, min(args.predict_batch, bench_batch),
                args.predict_steps, args.src, built=built))
        except Exception:
            import traceback

            traceback.print_exc()
            r["predict_full_ips_per_chip"] = None

    # Per-op analytic TRAIN-step ceiling (dev/eval_ceiling.py --train):
    # MXU lane utilization per conv/dgrad/wgrad + ideal-fusion HBM traffic
    # for train-mode BN (stats+apply+bwd passes), maxpool fwd+bwd, the
    # measured augment kernel floor (0.15 ms/view) and SGD+metrics param
    # traffic = 119.65 ms per 96-view step -> 802 views/s/chip. Round-4
    # measured 124.5 ms = 96% of this ceiling (same rigor as the eval
    # ceiling that measured == model to 0.1%).
    if r.get("backend") == "tpu":
        if args.backbone == "resnet50" and args.crop == 364 and args.src == 512:
            r["explained_ceiling_ips"] = 802
            # analytic per-op inference ceilings (dev/eval_ceiling.py):
            # MXU-lane-utilization + ideal-fusion HBM traffic at spec
            # 819 GB/s. Round-3 measured eval == this ceiling (23.78 vs
            # 23.80 ms): the naive all-MXU bound (~7860) is not physical.
            r["eval_ceiling_ips"] = 4034
            r["predict_full_ceiling_ips"] = 2087
            # int8 composition ceiling, epilogue dataflow == what the
            # int8-resident forward achieves (dev/eval_ceiling.py --int8
            # --int8-dataflow epilogue; OPTIMIZATION.md). Round-4: the
            # normalize write is int8 (quantize-at-source), lifting the
            # ceilings from 6517/3387
            r["eval_int8_ceiling_ips"] = 6558
            r["predict_full_int8_ceiling_ips"] = 3410
        elif (args.backbone == "densenet121" and args.crop == 364
              and args.src == 512):
            # dev/eval_ceiling.py --backbone densenet121 [--int8
            # --int8-dataflow epilogue]. The epilogue bracket is the
            # ceiling; the conservative s32 bracket (2191/1087) is BELOW
            # bf16 — densenet's 32-wide 3x3 convs are lane-util-bound at
            # 0.25 and its 128-wide 1x1 outputs pay the s32 round-trip,
            # so int8's win depends on XLA's epilogue fusion here.
            r["eval_ceiling_ips"] = 2482
            r["predict_full_ceiling_ips"] = 1229
            r["eval_int8_ceiling_ips"] = 2882
            r["predict_full_int8_ceiling_ips"] = 1429

    baseline = 5000.0  # BASELINE.json north star: >=5k 512^2x6ch images/s/chip
    detail = {k: (round(v, 3) if isinstance(v, float) else v) for k, v in r.items()}
    detail["files_per_sec_per_chip"] = round(6 * r["ips_per_chip"], 1)  # 6 channel files/view
    print(json.dumps({
        "metric": "train_images_per_sec_per_chip",
        "value": round(r["ips_per_chip"], 2),
        "unit": "512^2x6ch views/s/chip",
        "vs_baseline": round(r["ips_per_chip"] / baseline, 4),
        "detail": detail,
    }))


if __name__ == "__main__":
    main()
