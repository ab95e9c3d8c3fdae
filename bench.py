"""Training-throughput benchmark (driver contract: ONE JSON line).

Measures the sustained end-to-end train-step rate of the flagship config —
ResNet-50 TwoSitesNN, bf16, 364^2 crops taken on device from raw 512^2
uint8 6-channel views (augment fused into the step) — on the available
accelerator, and reports 512^2x6-ch images(views)/sec/chip against the
BASELINE.json north-star of 5000.

Usage: python bench.py [--steps N] [--batch B] [--backbone resnet50]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def run_bench(backbone: str, batch: int, steps: int, warmup: int, crop: int, src: int):
    import jax
    import jax.numpy as jnp

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.parallel import make_mesh, place_state, shard_batch
    from rxtpu.train import build_model, create_train_state, make_train_step

    n_dev = jax.device_count()
    mesh = make_mesh(n_devices=n_dev)
    global_batch = batch * n_dev
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

    rng = np.random.default_rng(0)
    G = 3
    batch_host = {
        "images": rng.integers(0, 256, size=(global_batch, G, 6, src, src), dtype=np.uint8),
        "labels": rng.integers(0, 1108, size=(global_batch,)).astype(np.int32),
        "mean": rng.uniform(0.2, 0.6, (global_batch, 6)).astype(np.float32),
        "std": rng.uniform(0.1, 0.4, (global_batch, 6)).astype(np.float32),
    }
    dbatch = shard_batch(batch_host, mesh)
    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)

    for _ in range(warmup):
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
    return {
        "ips_per_chip": ips_per_chip,
        "ips_total": ips,
        "step_time_ms": 1000 * dt / steps,
        "n_devices": n_dev,
        "global_batch": global_batch,
        "backend": jax.default_backend(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="resnet50")
    ap.add_argument("--batch", type=int, default=16, help="per-device batch")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--warmup", type=int, default=5)
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--src", type=int, default=512)
    args = ap.parse_args()

    try:
        r = run_bench(args.backbone, args.batch, args.steps, args.warmup,
                      args.crop, args.src)
    except Exception as e:  # smaller fallback (OOM etc.)
        import traceback

        traceback.print_exc()
        r = run_bench(args.backbone, max(1, args.batch // 2), args.steps,
                      args.warmup, args.crop, args.src)

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
