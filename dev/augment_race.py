"""Paired augment-distribution race: production 3-shear vs exact warp.

PARITY_RUN.md's cross-framework race pins rxtpu-vs-torch semantics with
the EXACT one-pass warp augment (cv2/albumentations-parity goldens,
dataloader.py:41-50 of /root/reference). The production train step
defaults to the gather-free 3-shear Pallas path (rxtpu/ops/shear.py)
whose bilinear weights differ from the direct warp by <1% at interior
pixels — the one augment-distribution question the cross-framework race
does not touch (round-3 VERDICT weak item 1 names it explicitly).

This probe bounds the shear path's ACCURACY effect directly: per seed,
train the SAME init / config / recorded batch streams twice on the SAME
device — `augment='shear'` vs `augment='gather'` — keep each arm's best
checkpoint (train.py:88 strict-improvement rule), and compare best val
accuracy plus the full leak-pipeline submissions (test.py:41-56). With
everything else bit-identical, any systematic paired gap IS the augment
distribution; chaos averages out across seeds.

Runs on the TPU (the shear kernels' native target — interpret-mode CPU
would be ~100x slower); both arms share one set of compiled steps, so
seeds add no recompiles.

Usage: python dev/augment_race.py [--epochs 15] [--batch 4]
           [--seeds 0,..,15] [--out AUGMENT_RACE.md]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault("PARITY_DEVICE", "tpu")

import numpy as np  # noqa: E402

from parity_run import (  # noqa: E402
    CROP, IMG, N_TRAIN_EXPS, NB_CLASSES, build_data, leak_submission,
    record_epochs)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def make_steps(model):
    from rxtpu.train.step import (
        make_eval_step, make_predict_step, make_train_step)

    return {
        "shear": make_train_step(model, CROP, donate=False, augment="shear"),
        "gather": make_train_step(model, CROP, donate=False, augment="gather"),
        "eval": make_eval_step(model, CROP),
        "predict": make_predict_step(model, None),
    }


def run_arm(steps, augment, state, epochs_data, val_data, test_data, seed):
    """One training arm; mirrors parity_run.run_rxtpu but takes the jitted
    steps from outside so 16 seeds x 2 arms compile exactly once each."""
    tstep = steps[augment]
    key = jax.random.PRNGKey(seed)
    flag = jnp.asarray(True)
    accs = []
    best_state = state
    for batches in epochs_data:
        for b in batches:
            bb = {k: v for k, v in b.items() if k not in ("id_codes", "valid")}
            state, _ = tstep(state, bb, key, flag)
        correct = total = 0.0
        for b in val_data:
            bb = {k: v for k, v in b.items() if k != "id_codes"}
            m = steps["eval"](state, bb)
            correct += float(m["correct"]); total += float(m["count"])
        accs.append(correct / max(total, 1.0))
        if len(accs) == 1 or accs[-1] > max(accs[:-1]):
            best_state = state
    probs, ids = [], []
    for b in test_data:
        bb = {k: v for k, v in b.items() if k not in ("id_codes", "valid")}
        p = np.asarray(steps["predict"](best_state, bb))
        for i, code in enumerate(b["id_codes"]):
            if code:
                probs.append(p[i]); ids.append(code)
    return accs, np.asarray(probs), ids


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--root", default=None)
    ap.add_argument("--out", default="AUGMENT_RACE.md")
    ap.add_argument("--seeds", default=",".join(str(s) for s in range(16)))
    args = ap.parse_args()
    if args.root is None:
        args.root = f"/tmp/rxtpu_parity_leak_data_e{N_TRAIN_EXPS}"
    seeds = [int(s) for s in args.seeds.split(",")]

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.train import build_model, create_train_state

    print(f"backend: {jax.default_backend()}", flush=True)
    t0 = time.time()
    rows = []
    steps = None
    model = None
    for seed in seeds:
        (train_pipe, val_pipe, test_pipe, plate_groups, exp_types,
         truth) = build_data(args.root, args.batch, pipe_seed=seed)
        epochs_data = record_epochs(train_pipe, args.epochs)
        val_data = [dict(b) for b in val_pipe.epoch(0)]
        test_data = [dict(b) for b in test_pipe.epoch(0)]
        cfg = Config(
            data=DataConfig(path_data=args.root, crop_size=CROP,
                            src_size=IMG),
            model=ModelConfig(backbone="resnet50", pretrained=False,
                              nb_classes=NB_CLASSES,
                              compute_dtype="float32"),
            train=TrainConfig(bs_per_device=args.batch,
                              nb_epochs=args.epochs, seed=seed),
            experiment_id=f"augrace{seed}",
        )
        if model is None:
            model = build_model(cfg)
            steps = make_steps(model)
        state, _ = create_train_state(
            cfg, model, steps_per_epoch=len(epochs_data[0]))

        arm = {}
        for augment in ("shear", "gather"):
            accs, probs, ids = run_arm(
                steps, augment, state, epochs_data, val_data, test_data,
                seed)
            sub = leak_submission(probs, ids, plate_groups, exp_types)
            arm[augment] = {
                "best": float(np.max(accs)),
                "leak": float(np.mean(
                    [sub[c] == truth[c] for c in sorted(sub)])),
                "sub": sub,
            }
        codes = sorted(arm["shear"]["sub"])
        rows.append({
            "seed": seed,
            "shear": arm["shear"]["best"],
            "gather": arm["gather"]["best"],
            "d_val": arm["shear"]["best"] - arm["gather"]["best"],
            "shear_leak": arm["shear"]["leak"],
            "gather_leak": arm["gather"]["leak"],
            "d_leak": arm["shear"]["leak"] - arm["gather"]["leak"],
            "sub_agree": float(np.mean(
                [arm["shear"]["sub"][c] == arm["gather"]["sub"][c]
                 for c in codes])),
        })
        r = rows[-1]
        print(f"[seed {seed}] best val shear {r['shear']:.3f} vs warp "
              f"{r['gather']:.3f} (d={r['d_val']:+.3f}); leak "
              f"{r['shear_leak']:.3f} vs {r['gather_leak']:.3f}; sub agree "
              f"{100 * r['sub_agree']:.0f}%  [{time.time() - t0:.0f}s]",
              flush=True)

    d_val = np.array([r["d_val"] for r in rows])
    d_leak = np.array([r["d_leak"] for r in rows])
    n = len(rows)

    def ci95(d):
        if n < 2:
            return 0.0
        return 1.96 * float(d.std(ddof=1)) / np.sqrt(n)

    lines = [
        "# Augment-distribution race: production 3-shear vs exact warp",
        "",
        f"Generated by `dev/augment_race.py` on {time.strftime('%Y-%m-%d')}"
        f" (backend: {jax.default_backend()})",
        "",
        f"Per seed, the SAME init / recorded batch streams / device train "
        f"twice ({args.epochs} epochs, {N_TRAIN_EXPS} experiments x "
        f"{NB_CLASSES} sirna, {IMG}^2 px, bs {args.batch}): once with the "
        "production gather-free 3-shear Pallas augment "
        "(`rxtpu/ops/shear.py`), once with the exact one-pass warp "
        "(albumentations-parity semantics, `rxtpu/ops/warp.py`) that the "
        "cross-framework race in PARITY_RUN.md uses. Both arms' best "
        "checkpoints (strict-improvement rule, train.py:88) run the "
        "full-size G=6 test predict through the same mask+greedy leak "
        "pipeline (test.py:41-56). The paired per-seed delta isolates the "
        "augment distribution; every other factor is bit-identical.",
        "",
        "| seed | shear best val | warp best val | d val | shear leak acc |"
        " warp leak acc | d leak | sub agree |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['seed']} | {r['shear']:.3f} | {r['gather']:.3f} | "
            f"{r['d_val']:+.3f} | {r['shear_leak']:.3f} | "
            f"{r['gather_leak']:.3f} | {r['d_leak']:+.3f} | "
            f"{100 * r['sub_agree']:.0f}% |")
    lines += [
        "",
        f"**Paired mean d(best val acc) = {d_val.mean():+.4f} +- "
        f"{ci95(d_val):.4f} (95% CI, n={n}); "
        f"d(leak submission acc) = {d_leak.mean():+.4f} +- "
        f"{ci95(d_leak):.4f}.** Positive = shear better. A CI containing "
        "0 bounds the production augment's accuracy effect at the noise "
        "floor of this dataset; a CI excluding 0 quantifies the "
        "interpolation penalty/bonus directly.",
        "",
        f"Wall time: {time.time() - t0:.0f}s for {n} seeds x 2 arms.",
    ]
    with open(args.out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
