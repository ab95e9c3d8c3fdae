"""Diagnose the parity-run gap: instrument the rxtpu training side.

Per epoch: mean train loss, val acc with running BN stats (the production
eval path), val acc with BATCH stats (train-mode normalization), and the
scheduled LR — to separate optimizer/schedule trouble from BN-stats
trouble from augment trouble.

Usage: python dev/parity_debug.py [--epochs 15] [--batch 4] [--no-augment]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from parity_run import CROP, build_data, record_epochs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--root", default="/tmp/rxtpu_parity_leak_data")
    ap.add_argument("--no-augment", action="store_true",
                    help="center-crop only (train=False augment path)")
    args = ap.parse_args()

    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.ops import augment_batch
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import make_eval_step, make_train_step

    (train_pipe, val_pipe, _test_pipe, _pg, _et, _truth) = build_data(
        args.root, args.batch)
    epochs_data = record_epochs(train_pipe, args.epochs)
    val_data = [dict(b) for b in val_pipe.epoch(0)]

    cfg = Config(
        data=DataConfig(path_data=args.root, crop_size=CROP, src_size=64),
        model=ModelConfig(backbone="resnet50", pretrained=False,
                          nb_classes=8, compute_dtype="float32"),
        train=TrainConfig(bs_per_device=args.batch, nb_epochs=args.epochs),
        experiment_id="parity-debug",
    )
    model = build_model(cfg)
    state, lr = create_train_state(
        cfg, model, steps_per_epoch=len(epochs_data[0]))
    print(f"base lr {lr}")

    tstep = make_train_step(
        model, CROP, donate=False,
        augment="none" if args.no_augment else "gather")
    estep = make_eval_step(model, CROP)

    if args.no_augment:
        # precompute deterministic center-crop+normalize views once; the
        # 'none' train-step backend passes batch['images'] straight through
        @jax.jit
        def _center_views(images, mean, std):
            return augment_batch(images, mean, std, jax.random.PRNGKey(0),
                                 crop_size=CROP, train=False)

        for batches in epochs_data:
            for b in batches:
                b["images"] = np.asarray(
                    _center_views(b["images"], b["mean"], b["std"]))

    @jax.jit
    def eval_batchstats(st, batch):
        views = augment_batch(batch["images"], batch["mean"], batch["std"],
                              jax.random.PRNGKey(0), crop_size=CROP,
                              train=False)
        logits, _ = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats}, views,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.argmax(logits, -1)

    @jax.jit
    def eval_runstats_direct(st, batch):
        # same crop path as eval_batchstats, but eval-mode normalization
        # with the RUNNING stats — isolates make_eval_step from the stats
        views = augment_batch(batch["images"], batch["mean"], batch["std"],
                              jax.random.PRNGKey(0), crop_size=CROP,
                              train=False)
        logits = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats}, views,
            train=False)
        return jnp.argmax(logits, -1)

    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)
    for e, batches in enumerate(epochs_data):
        losses, lrs = [], []
        for b in batches:
            bb = {k: v for k, v in b.items() if k not in ("id_codes", "valid")}
            state, m = tstep(state, bb, key, flag)
            losses.append(float(m["loss"]))
            if "lr" in m:
                lrs.append(float(m["lr"]))
        c1 = t1 = 0.0
        for b in val_data:
            bb = {k: v for k, v in b.items() if k != "id_codes"}
            mm = estep(state, bb)
            c1 += float(mm["correct"]); t1 += float(mm["count"])
        c2 = t2 = 0
        c3 = 0
        for b in val_data:
            bb = {k: v for k, v in b.items() if k not in ("id_codes",)}
            pred = np.asarray(eval_batchstats(state, bb))
            pred3 = np.asarray(eval_runstats_direct(state, bb))
            keep = b.get("valid", np.ones(len(pred))).astype(bool)
            c2 += int((pred[keep] == b["labels"][keep]).sum()); t2 += int(keep.sum())
            c3 += int((pred3[keep] == b["labels"][keep]).sum())
        print(f"epoch {e+1}: train loss {np.mean(losses):.4f} "
              f"lr {np.mean(lrs) if lrs else float('nan'):.5f} "
              f"val(run-stats) {c1/max(t1,1):.3f} "
              f"val(batch-stats) {c2/max(t2,1):.3f} "
              f"val(run-stats-direct) {c3/max(t2,1):.3f}", flush=True)

    # ------------------------------------------------------------------
    # localize: stored running stats vs freshly measured batch moments
    # ------------------------------------------------------------------
    @jax.jit
    def fresh_stats(st, batch):
        if args.no_augment:
            # train batches already hold precomputed center-crop views
            views = batch["images"]
        else:
            views = augment_batch(batch["images"], batch["mean"],
                                  batch["std"], jax.random.PRNGKey(0),
                                  crop_size=CROP, train=False)
        _, mut = model.apply(
            {"params": st.params, "batch_stats": st.batch_stats}, views,
            train=True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)})
        return mut["batch_stats"]

    # run over the TRAIN batches (the distribution the running stats
    # average); mutated value = m*old + (1-m)*batch => batch = (new - m*old)/(1-m)
    acc = None
    nb = 0
    for b in epochs_data[-1]:
        bb = {k: v for k, v in b.items() if k not in ("id_codes", "valid")}
        mut = fresh_stats(state, bb)
        batch_only = jax.tree_util.tree_map(
            lambda new, old: (new - 0.9 * old) / 0.1, mut, state.batch_stats)
        acc = batch_only if acc is None else jax.tree_util.tree_map(
            lambda a, x: a + x, acc, batch_only)
        nb += 1
    avg = jax.tree_util.tree_map(lambda a: a / nb, acc)

    flat_run = jax.tree_util.tree_flatten_with_path(state.batch_stats)[0]
    flat_avg = jax.tree_util.tree_flatten_with_path(avg)[0]
    rows = []
    for (path, rv), (_, av) in zip(flat_run, flat_avg):
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        rv, av = np.asarray(rv, np.float64), np.asarray(av, np.float64)
        rel = np.linalg.norm(rv - av) / max(np.linalg.norm(av), 1e-9)
        rows.append((rel, name, float(np.mean(rv)), float(np.mean(av))))
    rows.sort(reverse=True)
    print("\nworst running-vs-measured stats (rel L2, stored-mean, measured-mean):")
    for rel, name, mr, ma in rows[:12]:
        print(f"  {rel:8.3f}  {name}  stored {mr:+.4f} measured {ma:+.4f}")


if __name__ == "__main__":
    main()
