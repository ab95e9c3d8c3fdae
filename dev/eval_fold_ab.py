"""A/B wall-time the eval step with and without BN folding on the TPU.

OPTIMIZATION.md's 4037 views/s folded number came from trace DEVICE time;
this measures both variants the same way the bench does (wall, host
readback barrier, later trials) so the comparison is apples-to-apples.

Usage: python dev/eval_fold_ab.py [--batch 32] [--g 3] [--crop 364]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--g", type=int, default=3)
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--src", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.parallel import make_mesh, place_state, shard_batch
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import make_eval_step

    n_dev = jax.device_count()
    mesh = make_mesh(n_devices=n_dev)
    cfg = Config(
        data=DataConfig(path_data="unused", crop_size=args.crop,
                        src_size=args.src),
        model=ModelConfig(backbone="resnet50", pretrained=False),
        train=TrainConfig(bs_per_device=args.batch),
        experiment_id="foldab",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=100,
                                  n_devices=n_dev)
    state = place_state(state, mesh)
    rng = np.random.default_rng(0)
    bh = {
        "images": rng.integers(0, 256, size=(args.batch * n_dev, args.g, 6,
                                             args.src, args.src),
                               dtype=np.uint8),
        "labels": rng.integers(0, 1108, size=(args.batch * n_dev,)).astype(np.int32),
        "mean": rng.uniform(0.2, 0.6, (args.batch * n_dev, 6)).astype(np.float32),
        "std": rng.uniform(0.1, 0.4, (args.batch * n_dev, 6)).astype(np.float32),
    }
    dbatch = shard_batch(bh, mesh)
    views = args.batch * n_dev * args.g

    for fold, fstem in ((True, True), (True, False), (False, False)):
        step = make_eval_step(model, args.crop, fold=fold, fused_stem=fstem)
        m = None
        for _ in range(3):
            m = step(state, dbatch)
        float(m["loss_sum"])
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                m = step(state, dbatch)
            float(m["loss_sum"])
            dt = (time.perf_counter() - t0) / args.steps
            best = dt if best is None else min(best, dt)
        print(f"fold={fold} fused_stem={fstem}: {1000*best:.3f} ms/step = "
              f"{views/best:.0f} views/s", flush=True)


if __name__ == "__main__":
    main()
