"""Static HBM-traffic tally of a compiled HLO dump (dev/int8_hlo_dump.py).

Every top-level op in the ENTRY computation materializes its output
buffer; reads = operand buffer sizes. Sums write+read bytes per op class
and lists the heaviest tensors — a buffer-level roofline of where the
quantized (or any) step's HBM time goes at 819 GB/s.

Usage: python dev/hlo_traffic.py /tmp/quant_step.hlo [--bw 819e9]
"""

from __future__ import annotations

import argparse
import re
from collections import defaultdict

DSIZE = {"s8": 1, "u8": 1, "pred": 1, "bf16": 2, "f16": 2, "s16": 2,
         "u16": 2, "f32": 4, "s32": 4, "u32": 4, "f64": 8, "s64": 8,
         "u64": 8}

SHAPE_RE = re.compile(r"(s8|u8|pred|bf16|f16|s16|u16|f32|s32|u32|f64|s64|u64)"
                      r"\[([0-9,]*)\]")


def shape_bytes(m) -> int:
    dt, dims = m.group(1), m.group(2)
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DSIZE[dt]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--bw", type=float, default=819e9)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    txt = open(args.path).read()
    # ENTRY computation body: from "ENTRY " to the next closing brace at
    # column 0
    m = re.search(r"^ENTRY [^{]*\{(.*?)^\}", txt, re.S | re.M)
    body = m.group(1)

    rows = []
    by_class = defaultdict(lambda: [0, 0])  # class -> [bytes, count]
    for ln in body.splitlines():
        ln = ln.strip()
        mo = re.match(r"%?\S+ = ", ln)
        if not mo:
            continue
        shapes = list(SHAPE_RE.finditer(ln))
        if not shapes:
            continue
        # output = first shape; operands = shapes after the op name's "("
        out_b = shape_bytes(shapes[0])
        opn = re.search(r"= \(?[a-z0-9_]+\[?[^ ]* (\w+)\(", ln)
        op = opn.group(1) if opn else "?"
        if op in ("parameter", "constant", "get-tuple-element", "bitcast",
                  "tuple"):
            continue
        # reads: every distinct operand %param reference's shape — HLO text
        # lists operand shapes only for some ops; approximate reads as all
        # shapes found after the opcode token
        tail = ln.split("(", 1)[1] if "(" in ln else ""
        read_b = sum(shape_bytes(s) for s in SHAPE_RE.finditer(tail))
        name = ln.split(" = ")[0]
        cls = ("requantize" if "clamp_convert" in ln and shapes[0].group(1) == "s8"
               else "conv" if " convolution(" in ln
               else op)
        tot = out_b + read_b
        rows.append((tot, out_b, read_b, cls, name, shapes[0].group(0)))
        by_class[cls][0] += tot
        by_class[cls][1] += 1

    total = sum(r[0] for r in rows)
    print(f"ENTRY ops counted: {len(rows)}   total traffic "
          f"{total / 1e9:.2f} GB  => {1e3 * total / args.bw:.2f} ms at "
          f"{args.bw / 1e9:.0f} GB/s\n")
    print("by op class (GB, count):")
    for cls, (b, c) in sorted(by_class.items(), key=lambda kv: -kv[1][0]):
        print(f"  {cls:22s} {b / 1e9:7.3f} GB  x{c:4d}   "
              f"{1e3 * b / args.bw:6.2f} ms")
    print(f"\ntop {args.top} ops by traffic:")
    for tot, ob, rb, cls, name, shape in sorted(rows, reverse=True)[:args.top]:
        print(f"  {tot / 1e6:8.1f} MB (w {ob / 1e6:7.1f} r {rb / 1e6:7.1f}) "
              f"{cls:12s} {shape:28s} {name[:48]}")


if __name__ == "__main__":
    main()
