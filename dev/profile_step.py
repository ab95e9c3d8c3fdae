"""Dissect the compiled train step on the real TPU: per-op time from a
perfetto trace of a few steps, grouped by HLO op name prefix.

Usage: python dev/profile_step.py [--batch 32] [--steps 3] [--eval]
Prints top ops by total device time and a stage-level rollup.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import shutil
import time

import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(batch: int, crop: int = 364, src: int = 512, mode: str = "train",
          G: int = 3):
    """mode: 'train' (fused aug step), 'eval' (crop+norm+fwd), 'predict'
    (normalize [+crop] + fwd + softmax, reference G=6 test workload)."""
    import jax
    import jax.numpy as jnp

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.parallel import make_mesh, place_state, shard_batch
    from rxtpu.train import build_model, create_train_state, make_train_step
    from rxtpu.train.step import make_eval_step, make_predict_step

    n_dev = jax.device_count()
    mesh = make_mesh(n_devices=n_dev)
    cfg = Config(
        data=DataConfig(path_data="unused", crop_size=crop, src_size=src),
        model=ModelConfig(backbone="resnet50", pretrained=False),
        train=TrainConfig(bs_per_device=batch),
        experiment_id="prof",
    )
    model = build_model(cfg)
    state, _ = create_train_state(cfg, model, steps_per_epoch=100, n_devices=n_dev)
    state = place_state(state, mesh)
    rng = np.random.default_rng(0)
    batch_host = {
        "images": rng.integers(0, 256, size=(batch * n_dev, G, 6, src, src), dtype=np.uint8),
        "labels": rng.integers(0, 1108, size=(batch * n_dev,)).astype(np.int32),
        "mean": rng.uniform(0.2, 0.6, (batch * n_dev, 6)).astype(np.float32),
        "std": rng.uniform(0.1, 0.4, (batch * n_dev, 6)).astype(np.float32),
    }
    dbatch = shard_batch(batch_host, mesh)
    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)
    if mode == "train":
        step = make_train_step(model, crop, donate=True)
        args = (state, dbatch, key, flag)

        def run(st, out):
            return step(st, dbatch, key, flag)

        readback = lambda out: float(out["loss"])  # noqa: E731
    elif mode == "eval":
        step = make_eval_step(model, crop)
        args = (state, dbatch)

        def run(st, out):
            return st, step(st, dbatch)

        readback = lambda out: float(out["loss_sum"])  # noqa: E731
    elif mode == "predict":
        step = make_predict_step(model, crop if crop else None)
        args = (state, dbatch)

        def run(st, out):
            return st, step(st, dbatch)

        readback = lambda out: float(out[0, 0])  # noqa: E731
    else:
        raise ValueError(mode)
    return step, args, run, readback


def parse_hlo(hlo: str):
    """Map instruction name -> (output_shape_str, set_of_inner_opcodes).

    Good enough for attribution: for each ENTRY instruction we record its
    result shape; for fusions we scan the called computation body for
    'convolution(' / 'dot(' / 'reduce(' markers.
    """
    # computation name -> set of opcodes appearing in its body
    comp_ops = {}
    cur = None
    opcode_re = re.compile(r"=\s.*?\b([a-z][a-z0-9\-]*)\(")
    for line in hlo.splitlines():
        if line.startswith("ENTRY"):
            cur = "__entry__"
            comp_ops[cur] = set()
            continue
        m = re.match(r"%([\w.\-]+)\s*\(", line)
        if m and line.rstrip().endswith("{"):
            cur = m.group(1)
            comp_ops[cur] = set()
            continue
        if cur is None:
            continue
        mm = opcode_re.search(line)
        if mm:
            comp_ops[cur].add(mm.group(1))

    # entry instruction name -> (shape, opcode, inner opcodes)
    info = {}
    in_entry = False
    for line in hlo.splitlines():
        if line.startswith("ENTRY"):
            in_entry = True
            continue
        if in_entry and line.startswith("}"):
            break
        if not in_entry:
            continue
        m = re.match(r"\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*(.*)", line)
        if not m:
            continue
        name, rest = m.groups()
        om = opcode_re.search(line)
        opcode = om.group(1) if om else "?"
        shape = rest.split(f" {opcode}(")[0] if om else "?"
        called = None
        cm = re.search(r"(?:calls|to_apply)=%?([\w.\-]+)", line)
        if cm:
            called = cm.group(1)
        inner = comp_ops.get(called, set()) if called else set()
        info[name] = (shape, opcode, inner)
    return info


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--mode", default="train",
                    choices=["train", "eval", "predict"])
    ap.add_argument("--g", type=int, default=None,
                    help="views per sample (default 3; predict default 6)")
    ap.add_argument("--crop", type=int, default=364,
                    help="crop size; 0 = no crop (reference predict)")
    ap.add_argument("--logdir", default="/tmp/rxtpu_prof")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--parse-only", action="store_true",
                    help="re-analyze the saved /tmp/step_hlo.txt + last trace")
    args = ap.parse_args()

    if not args.parse_only:
        import jax

        g = args.g or (6 if args.mode == "predict" else 3)
        step, fargs, run, readback = build(
            args.batch, crop=args.crop, mode=args.mode, G=g)
        hlo = step.lower(*fargs).compile().as_text()
        with open(os.path.join("/tmp", "step_hlo.txt"), "w") as f:
            f.write(hlo)
        state, out = fargs[0], None
        for _ in range(3):
            state, out = run(state, out)
        readback(out)  # barrier

        shutil.rmtree(args.logdir, ignore_errors=True)
        jax.profiler.start_trace(args.logdir, create_perfetto_trace=True)
        t0 = time.perf_counter()
        for _ in range(args.steps):
            state, out = run(state, out)
        readback(out)
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f"wall per step: {1000*wall/args.steps:.1f} ms (incl. relay)")

    name2info = parse_hlo(open("/tmp/step_hlo.txt").read())

    paths = glob.glob(os.path.join(args.logdir, "**", "*.json.gz"), recursive=True)
    assert paths, f"no perfetto trace under {args.logdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)

    events = trace["traceEvents"]
    # find TPU device track pids (process names containing 'TPU'/'Device')
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if re.search(r"TPU|[Dd]evice|/device:", n)}
    print("processes:", sorted(proc_names.items()))

    by_name = collections.Counter()
    counts = collections.Counter()
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "?")
        # skip envelope events (whole-step spans, step-number tracks)
        if name.startswith("jit_") or re.fullmatch(r"\d+", name):
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        by_name[name] += dur
        counts[name] += 1
        total += dur
    per_step = total / args.steps
    print(f"total device time: {total:.2f} ms ({per_step:.2f} ms/step)")

    def describe(name):
        shape, opcode, inner = name2info.get(name, ("?", "?", set()))
        tags = []
        if "convolution" in inner or opcode == "convolution":
            tags.append("CONV")
        if "dot" in inner or opcode == "dot":
            tags.append("DOT")
        if "reduce" in inner or opcode == "reduce":
            tags.append("RED")
        m = re.findall(r"(\d+),(\d+),\d+[\]}]", shape)
        stage = ""
        for a, b in m:
            if a == b and a in ("91", "46", "23", "12", "182", "364", "512"):
                stage = {"364": "aug", "512": "aug", "182": "stem",
                         "91": "s1", "46": "s2", "23": "s3", "12": "s4"}[a]
                break
        return f"[{stage:4s}|{'+'.join(tags) or 'elem':8s}] {shape[:48]}"

    print(f"{'ms/step':>9} {'#':>4}  name")
    for name, ms in by_name.most_common(args.top):
        print(f"{ms/args.steps:9.3f} {counts[name]//args.steps:4d}  {name[:40]:40s} {describe(name)}")

    # stage x kind rollup
    stage_roll = collections.Counter()
    for name, ms in by_name.items():
        shape, opcode, inner = name2info.get(name, ("?", "?", set()))
        kind = "CONV" if ("convolution" in inner or opcode == "convolution") else (
            "RED" if ("reduce" in inner or opcode == "reduce") else "elem")
        m = re.findall(r"(\d+),(\d+),\d+[\]}]", shape)
        stage = "??"
        for a, b in m:
            if a == b and a in ("91", "46", "23", "12", "182", "364", "512"):
                stage = {"364": "aug", "512": "aug", "182": "stem",
                         "91": "s1", "46": "s2", "23": "s3", "12": "s4"}[a]
                break
        stage_roll[(stage, kind)] += ms
    print("\nstage x kind rollup (ms/step):")
    for (stage, kind), ms in stage_roll.most_common():
        print(f"  {ms/args.steps:8.2f}  {stage:5s} {kind}")

    # rollup by coarse group
    groups = collections.Counter()
    gcounts = collections.Counter()
    for name, ms in by_name.items():
        n = name.lower()
        if "shear" in n or "pallas" in n or "barrel" in n or "augment" in n:
            g = "augment-pallas"
        elif "convolution" in n or n.startswith("conv") or "cudnn" in n:
            g = "conv(+fused)"
        elif "convert_reduce" in n or n.startswith("reduce"):
            g = "reduce(BN-stats/grads)"
        elif "select_add" in n:
            g = "select_add(relu-bwd+add)"
        elif "select-and-scatter" in n or "reduce-window" in n:
            g = "pool"
        elif "fusion" in n:
            g = "fusion(elementwise/other)"
        elif "copy" in n or "transpose" in n or "bitcast" in n:
            g = "copy/layout"
        elif "all-reduce" in n or "collective" in n:
            g = "collective"
        else:
            g = "other"
        groups[g] += ms
        gcounts[g] += counts[name]
    print("\nrollup:")
    for g, ms in groups.most_common():
        print(f"  {ms/args.steps:8.2f} ms/step  {gcounts[g]//args.steps:4d} ops  {g}")


if __name__ == "__main__":
    main()
