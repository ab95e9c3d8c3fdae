"""Time the fused stem kernel vs the unfused XLA chain on the TPU.

Usage: python dev/fused_stem_bench.py [--views 96] [--crop 364] [--steps 20]
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
    ap.add_argument("--views", type=int, default=96)
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--src", type=int, default=512)
    ap.add_argument("--steps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from rxtpu.ops.fused_stem import fused_stem, reference_stem

    rng = np.random.default_rng(0)
    n, c, m = args.views, 6, 64
    images = jnp.asarray(
        rng.integers(0, 256, (n, c, args.src, args.src), dtype=np.uint8))
    std = rng.uniform(0.1, 0.4, (n, c)).astype(np.float32)
    mean = rng.uniform(0.2, 0.6, (n, c)).astype(np.float32)
    scale = jnp.asarray(1.0 / (255.0 * std))
    bias = jnp.asarray(-mean / std)
    w = jnp.asarray(rng.standard_normal((7, 7, c, m)).astype(np.float32) * 0.1)
    cb = jnp.asarray(rng.standard_normal(m).astype(np.float32) * 0.5)

    ref = jax.jit(lambda *a: reference_stem(*a, crop_size=args.crop))
    fus = jax.jit(lambda *a: fused_stem(*a, crop_size=args.crop))

    for name, fn in (("xla-unfused", ref), ("pallas-fused", fus)):
        out = None
        for _ in range(3):
            out = fn(images, scale, bias, w, cb)
        float(jnp.asarray(out)[0, 0, 0, 0])
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.steps):
                out = fn(images, scale, bias, w, cb)
            float(jnp.asarray(out)[0, 0, 0, 0])
            dt = (time.perf_counter() - t0) / args.steps
            best = dt if best is None else min(best, dt)
        print(f"{name}: {1000*best:.3f} ms for {n} views "
              f"({1000*best/n*1000:.1f} us/view)", flush=True)


if __name__ == "__main__":
    main()
