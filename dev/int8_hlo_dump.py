"""Dump the compiled HLO of the W8A8 predict step and classify conv
dataflow: which convolutions consume/produce int8 (s8) vs bf16/f32 —
i.e. how much of the requantize traffic XLA actually fuses into conv
epilogues. Feeds the epilogue-vs-materialized ceiling bracket in
dev/eval_ceiling.py --int8.

Usage: python dev/int8_hlo_dump.py [--crop 364] [--batch 32] [--out /tmp/q.hlo]
"""

from __future__ import annotations

import argparse
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--crop", type=int, default=364)
    ap.add_argument("--src", type=int, default=512)
    ap.add_argument("--g", type=int, default=3)
    ap.add_argument("--out", default="/tmp/quant_step.hlo")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    import bench
    from rxtpu.infer import calibrate, make_quantized_predict_step, \
        prepare_quantized
    from rxtpu.parallel import shard_batch

    bench.G = args.g
    mesh, state, _, n_dev, model = bench._build(
        "resnet50", args.batch, args.crop, args.src)
    hbatch = bench._make_synthetic_batch(args.batch * n_dev, args.src)
    dbatch = shard_batch(
        {k: hbatch[k] for k in ("images", "mean", "std")}, mesh)

    qstats = calibrate(model, state, [dbatch], args.crop)
    qvars = prepare_quantized(model, state, qstats)
    step = make_quantized_predict_step(model, args.crop)
    txt = step.lower(qvars, dbatch).compile().as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB HLO to {args.out}\n")

    convs = re.findall(r"(\S+) = (\S+) convolution\((\S+), (\S+)\)", txt)
    n_s8_in = n_wide_in = n_s8_out = n_wide_out = 0
    for name, out_t, lhs, rhs in convs:
        in_s8 = "s8" in lhs or True  # operand dtype not in this regex; see below
    # operand dtypes: parse full lines instead
    lines = [ln for ln in txt.splitlines() if " convolution(" in ln
             or "convolution" in ln and "fusion" not in ln]
    conv_lines = [ln for ln in txt.splitlines()
                  if re.search(r"= \S+ convolution\(", ln)]
    print(f"{len(conv_lines)} convolution ops")
    for ln in conv_lines:
        m = re.search(r"= (\S+?)\[", ln)
        out_t = m.group(1) if m else "?"
        ops = re.findall(r"(s8|bf16|f32|s32)\[[0-9,]*\]", ln)
        print(f"  out={out_t:5s} operands={ops[:3]}")

    # fusion kernels that write s8 (requantize) vs read s8
    fus = [ln for ln in txt.splitlines() if re.match(r"\s*\S+ = s8\[", ln)
           and "fusion" in ln]
    print(f"\n{len(fus)} fusion ops producing s8 (materialized requantize "
          "kernels if reading bf16/f32)")
    for ln in fus[:10]:
        print(" ", ln.strip()[:160])


if __name__ == "__main__":
    main()
