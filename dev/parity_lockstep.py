"""Lockstep cross-framework training parity: identical inputs, step-for-step.

The accuracy-race parity run (dev/parity_run.py) compares full pipelines
with independent augmentation RNG — statistically meaningful only at
scale. This harness removes ALL stochastic differences instead:

- the SAME pre-generated augmented+normalized view tensors feed both
  frameworks every step (rxtpu augment_batch with a fixed key, exported
  to torch as numpy),
- dropout = 0.0 on both sides,
- identical initial weights (flax init exported to the torch mirror,
  tests/test_torch_parity.py machinery),
- identical SGD(momentum=.9, nesterov, wd=3e-5) + per-epoch cosine.

rxtpu trains through its PRODUCTION step (make_train_step with the
'none' augment backend); torch through the reference transcription
(models.py:7-57, main.py:89-93). With every input equal, any divergence
of the per-step loss trajectories is a genuine optimizer/BN dynamics
bug; trajectories that track to float tolerance prove the two training
dynamics are the same function.

Usage: python dev/parity_lockstep.py [--epochs 10] [--batch 4]
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

from parity_run import CROP, NB_CLASSES, build_data, record_epochs  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--root", default="/tmp/rxtpu_parity_leak_data")
    args = ap.parse_args()

    import torch

    from parity_run import torch_model_from_flax
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.ops import augment_batch
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import make_eval_step, make_train_step

    (train_pipe, val_pipe, _t, _pg, _et, _truth) = build_data(
        args.root, args.batch)
    epochs_data = record_epochs(train_pipe, args.epochs)
    val_data = [dict(b) for b in val_pipe.epoch(0)]

    cfg = Config(
        data=DataConfig(path_data=args.root, crop_size=CROP, src_size=64),
        model=ModelConfig(backbone="resnet50", pretrained=False,
                          nb_classes=NB_CLASSES, compute_dtype="float32",
                          dropout=0.0),
        train=TrainConfig(bs_per_device=args.batch, nb_epochs=args.epochs),
        experiment_id="lockstep",
    )
    model = build_model(cfg)
    state, lr = create_train_state(
        cfg, model, steps_per_epoch=len(epochs_data[0]))
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    # pre-generate the SHARED augmented views, one tensor per step
    print("generating shared views...", flush=True)
    views_all = []
    for e, batches in enumerate(epochs_data):
        for i, b in enumerate(batches):
            key = jax.random.fold_in(jax.random.PRNGKey(99), e * 1000 + i)
            v = augment_batch(b["images"], b["mean"], b["std"], key,
                              crop_size=CROP, train=True,
                              out_dtype=jnp.float32)
            views_all.append((np.asarray(v), b["labels"].astype(np.int64)))

    # --- rxtpu side: production step, 'none' augment backend -------------
    tstep = make_train_step(model, CROP, donate=False, augment="none")
    estep = make_eval_step(model, CROP)
    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)
    jx_losses = []
    for v, y in views_all:
        batch = {"images": jnp.asarray(v), "labels": jnp.asarray(y, jnp.int32),
                 "mean": jnp.zeros((len(y), 6)), "std": jnp.ones((len(y), 6))}
        state, m = tstep(state, batch, key, flag)
        jx_losses.append(float(m["loss"]))
    c = t = 0.0
    for b in val_data:
        bb = {k: vv for k, vv in b.items() if k != "id_codes"}
        mm = estep(state, bb)
        c += float(mm["correct"]); t += float(mm["count"])
    jx_val = c / max(t, 1.0)

    # --- torch side: reference transcription on the same views -----------
    tmodel = torch_model_from_flax(params0, stats0)
    # torch mirror was built with dropout=0.3; zero it to match
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=0.9,
                          nesterov=True, weight_decay=3e-5)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, args.epochs, eta_min=lr / 100)
    crit = torch.nn.CrossEntropyLoss()
    th_losses = []
    steps_per_epoch = len(epochs_data[0])
    tmodel.train()
    for si, (v, y) in enumerate(views_all):
        x = torch.from_numpy(np.moveaxis(v, -1, 2).copy())  # BGHWC -> BGCHW
        opt.zero_grad()
        loss = crit(tmodel(x), torch.from_numpy(y))
        loss.backward()
        opt.step()
        th_losses.append(float(loss))
        if (si + 1) % steps_per_epoch == 0:
            sched.step()
    tmodel.eval()
    from parity_run import torch_batch

    rng = np.random.default_rng(0)
    c = t = 0
    with torch.no_grad():
        for b in val_data:
            x = torch.from_numpy(torch_batch(b, rng, train=False))
            pred = tmodel(x).argmax(1).numpy()
            keep = b.get("valid", np.ones(len(pred))).astype(bool)
            c += int((pred[keep] == b["labels"][keep]).sum()); t += int(keep.sum())
    th_val = c / max(t, 1)

    jx, th = np.asarray(jx_losses), np.asarray(th_losses)
    diff = np.abs(jx - th) / np.maximum(np.abs(th), 1e-6)
    print("\nstep |  rxtpu loss | torch loss | rel diff")
    for i in range(0, len(jx), max(1, len(jx) // 20)):
        print(f"{i:4d} | {jx[i]:11.6f} | {th[i]:10.6f} | {diff[i]:.2e}")
    print(f"final| {jx[-1]:11.6f} | {th[-1]:10.6f} | {diff[-1]:.2e}")
    print(f"\nmax rel loss diff over {len(jx)} steps: {diff.max():.3e} "
          f"(at step {int(diff.argmax())})")
    print(f"val acc: rxtpu {jx_val:.3f} vs torch {th_val:.3f} "
          "(identical inputs, dropout 0)")
    ok = diff.max() < 0.02
    print("LOCKSTEP", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
