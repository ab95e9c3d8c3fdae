"""A/B: W8A8 quantized predict step vs the BN-folded bf16 one, on-chip.

Bench eval shape (bs32, G=3, 512^2 src -> 364^2 crop = 96 views/step),
same discipline as bench.py's eval leg (resident batch, warmup, host
readback barrier). Goal: does int8 move the eval leg past its bf16
composition ceiling (4034 views/s) toward the 5000 north star
(dev/int8_probe.py measured the primitives at 1.68x matmul / 1.26x conv)?

Also cross-checks accuracy on the same random weights: top-1 agreement
between the two steps on the benchmark batch.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--src", type=int, default=512)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--g", type=int, default=3)
    ap.add_argument("--scan-window", type=int, default=8,
                    help="K batches per dispatch for the scanned legs")
    args = ap.parse_args()

    import sys

    sys.path.insert(0, ".")
    import jax

    import bench
    from rxtpu.infer import calibrate, make_quantized_predict_step
    from rxtpu.parallel import shard_batch
    from rxtpu.train.step import make_predict_step

    bench.G = args.g
    mesh, state, _, n_dev, model = bench._build(
        "resnet50", args.batch, args.crop, args.src)
    global_batch = args.batch * n_dev
    hbatch = bench._make_synthetic_batch(global_batch, args.src)
    dbatch = shard_batch(hbatch, mesh)
    views = global_batch * args.g

    qstats = calibrate(model, state, [dbatch], args.crop)

    def run(label, fn):
        p = None
        for _ in range(3):
            p = fn()
        float(p[0, 0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            p = fn()
        float(p[0, 0])
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{label:24s} {1000 * dt:7.2f} ms/step  "
              f"{views / dt:7.0f} views/s/chip")
        return np.asarray(p), dt

    from rxtpu.infer import prepare_quantized
    from rxtpu.infer.fold import fold_variables
    from rxtpu.infer.quant import quantize_variables
    from rxtpu.train.step import _make_predict_body

    fstep = make_predict_step(model, args.crop)
    qvars = prepare_quantized(model, state, qstats)
    qstep = make_quantized_predict_step(model, args.crop)
    pf, dt_f = run("folded bf16", lambda: fstep(state, dbatch))
    pq, dt_q = run("int8 (prequantized W)", lambda: qstep(qvars, dbatch))
    agree = (pf.argmax(-1) == pq.argmax(-1)).mean()
    print(f"speedup {dt_f / dt_q:.2f}x   top-1 agreement {agree:.3f}   "
          f"max|dp| {np.abs(pf - pq).max():.4f}")

    # in-jit fold+quantize leg: the retired design, kept to track its cost
    qmodel = model.clone(folded=True, quantized=True, fuse_blocks=False,
                         stem_input=False)

    def apply_injit(state_and_stats, views):
        s, q = state_and_stats
        return qmodel.apply(
            quantize_variables(fold_variables(s.params, s.batch_stats), q),
            views, train=False)

    body = _make_predict_body(model, args.crop, apply_fn=apply_injit)
    injit_step = jax.jit(lambda s, q, b: body((s, q), b))
    _, dt_ij = run("int8 (in-jit quantize)",
                   lambda: injit_step(state, qstats, dbatch))
    print(f"in-jit quantize cost {1000 * (dt_ij - dt_q):.2f} ms/step")

    # scanned legs: K batches per dispatch — isolates relay dispatch
    # overhead from the device-side step (CLAUDE.md: ~1-1.6 ms/launch)
    K = args.scan_window
    if K > 1:
        import jax.numpy as jnp

        from rxtpu.infer.quant import make_scanned_quantized_predict_step
        from rxtpu.train.step import make_scanned_predict_step

        wbatch = {k: jnp.stack([dbatch[k]] * K) for k in dbatch}

        def run_w(label, fn):
            p = None
            for _ in range(3):
                p = fn()
            float(p[0, 0, 0])
            t0 = time.perf_counter()
            for _ in range(args.steps):
                p = fn()
            float(p[0, 0, 0])
            dt = (time.perf_counter() - t0) / args.steps / K
            print(f"{label:24s} {1000 * dt:7.2f} ms/batch "
                  f"{views / dt:7.0f} views/s/chip")
            return np.asarray(p), dt

        sf = make_scanned_predict_step(model, args.crop)
        sq = make_scanned_quantized_predict_step(model, args.crop)
        psf, _ = run_w(f"bf16 scan K={K}", lambda: sf(state, wbatch))
        psq, _ = run_w(f"int8 scan K={K}", lambda: sq(qvars, wbatch))
        print(f"scan==per-batch parity: bf16 {np.abs(psf[0] - pf).max():.2e}"
              f"  int8 {np.abs(psq[0] - pq).max():.2e}")


if __name__ == "__main__":
    main()
