"""Quick train/eval step timer on the real TPU (no trace).

Usage: python dev/time_step.py [--batch 32] [--mode train] [--plain-pool]

--plain-pool reverts the models to flax nn.max_pool (XLA select-and-scatter
backward) for A/B timing of rxtpu.ops.maxpool.

Timing discipline (CLAUDE.md): host readback barrier, >=3 trials, report
the later ones; steps are chained through state donation-free run().
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--mode", default="train", choices=["train", "eval", "predict"])
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--g", type=int, default=None)
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--plain-pool", action="store_true")
    args = ap.parse_args()

    if args.plain_pool:
        from flax import linen as nn

        import rxtpu.models.densenet as D
        import rxtpu.models.resnet as R

        def plain(x):
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        R.max_pool_3x3s2 = plain
        D.max_pool_3x3s2 = plain
        print("[plain nn.max_pool]")
    else:
        print("[custom-vjp max_pool_3x3s2]")

    from profile_step import build

    g = args.g or (6 if args.mode == "predict" else 3)
    step, fargs, run, readback = build(args.batch, crop=args.crop,
                                       mode=args.mode, G=g)
    state, out = fargs[0], None
    views = args.batch * g
    for trial in range(args.trials):
        n = 2 if trial == 0 else args.steps
        t0 = time.perf_counter()
        for _ in range(n):
            state, out = run(state, out)
        readback(out)
        dt = (time.perf_counter() - t0) / n
        print(f"trial {trial}: {1000*dt:.2f} ms/step = "
              f"{views/dt:.0f} views/s", flush=True)


if __name__ == "__main__":
    main()
