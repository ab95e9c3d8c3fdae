"""Analytic per-op ceiling for the eval/inference forward pass.

Sums, over every op of the ResNet-50 eval forward (stem, maxpool, all
bottleneck convs + residual traffic, head, input normalize), the larger of

- MXU time  = FLOPs / (peak * lane_util), lane_util = min(C_out, 128)/128
  (a 64-wide conv can only fill half of the 128-lane MXU output tile —
  stage1's 1x1-64 and 3x3-64 convs pay exactly 2x; verified against the
  round-3 trace: measured stage1 = 7.6 ms vs this model's 7.5 ms), and
- HBM time  = bytes moved / bandwidth, with ideal producer->consumer
  fusion (each tensor written once, read once; residual reads counted).

This is the composition ceiling for ANY per-op executor (XLA included) on
this chip: beating it requires multi-op fused kernels that keep
activations resident in VMEM — which round-2 measured to LOSE for these
shapes (OPTIMIZATION.md "fused two-pass bottleneck").

Usage: python dev/eval_ceiling.py [--views 96] [--crop 364] [--peak 176e12]
       [--bw 819e9]
"""

from __future__ import annotations

import argparse


def conv_ops(crop: int):
    """Yield (name, h_in, h_out, c_in, c_out, k, residual_read) for every
    conv of the resnet50 forward at the given (square) input size."""
    h = crop // 2  # stem output (stride 2, 7x7 pad 3)
    ops = [("stem7x7", crop, h, 6, 64, 7, 0)]
    h = (h + 1) // 2  # maxpool 3x3/2 pad 1
    stage_defs = [  # (width, blocks, stride of first block)
        (64, 3, 1), (128, 4, 2), (256, 6, 2), (512, 3, 2)
    ]
    c_in = 64
    for si, (w_, blocks, stride) in enumerate(stage_defs):
        for b in range(blocks):
            s = stride if b == 0 else 1
            h_out = (h + s - 1) // s if s > 1 else h
            name = f"s{si+1}b{b+1}"
            ops.append((f"{name}.c1", h, h, c_in, w_, 1, 0))
            ops.append((f"{name}.c2", h, h_out, w_, w_, 3, 0))
            # c3 fuses the residual add: counts an extra read of the
            # residual tensor (and the proj conv when shapes change)
            ops.append((f"{name}.c3", h_out, h_out, w_, 4 * w_, 1, 1))
            if b == 0:
                ops.append((f"{name}.proj", h, h_out, c_in, 4 * w_, 1, 0))
            c_in = 4 * w_
            h = h_out
    return ops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=96)
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--peak", type=float, default=176e12,
                    help="measured bf16 MXU peak (chained matmuls)")
    ap.add_argument("--bw", type=float, default=819e9,
                    help="HBM bandwidth (v5e ~819 GB/s)")
    ap.add_argument("--src", type=int, default=512)
    args = ap.parse_args()
    V, B = args.views, 2  # bf16 bytes

    total = 0.0
    rows = []

    def add(name, t_mxu, t_hbm):
        nonlocal total
        t = max(t_mxu, t_hbm)
        total += t
        rows.append((name, 1e3 * t_mxu, 1e3 * t_hbm, 1e3 * t))

    # input normalize: read uint8 src planes, write bf16 crop NHWC
    r = V * 6 * args.src * args.src
    w = V * 6 * args.crop * args.crop * B
    add("normalize", 0.0, (r + w) / args.bw)

    ops = conv_ops(args.crop)
    # maxpool after stem: read stem output, write pooled
    h_stem = args.crop // 2
    h_pool = (h_stem + 1) // 2
    add("maxpool",
        0.0,
        (V * 64 * (h_stem * h_stem + h_pool * h_pool) * B) / args.bw)

    for (name, h_in, h_out, c_in, c_out, k, res_read) in ops:
        flops = 2.0 * V * h_out * h_out * c_in * c_out * k * k
        util = min(c_out, 128) / 128.0
        t_mxu = flops / (args.peak * util)
        bytes_ = V * B * (
            h_in * h_in * c_in + h_out * h_out * c_out
            + res_read * h_out * h_out * c_out
        )
        add(name, t_mxu, bytes_ / args.bw)

    # global pool + head: tiny
    add("pool+head", 2.0 * V * (3 * 2048 * 1024 + 1024 * 1108) / 3 / args.peak,
        V * 2048 * 12 * B / args.bw)

    print(f"{'op':12s} {'mxu_ms':>8s} {'hbm_ms':>8s} {'ceil_ms':>8s}")
    stage_sums = {}
    for name, m, h, t in rows:
        head = name.split(".")[0]
        # bucket s1.x..s4.x by stage; keep full names (stem7x7, maxpool, …)
        key = head[:2] if len(head) == 2 and head.startswith("s") else head
        stage_sums[key] = stage_sums.get(key, 0.0) + t
    for name, m, h, t in rows:
        print(f"{name:12s} {m:8.3f} {h:8.3f} {t:8.3f}")
    print("\nper-stage ceilings (ms):")
    for k, v in stage_sums.items():
        print(f"  {k:10s} {v:7.2f}")
    print(f"\nTOTAL ceiling: {1e3*total:.2f} ms for {V} views "
          f"=> {V/total:.0f} views/s/chip")


if __name__ == "__main__":
    main()
