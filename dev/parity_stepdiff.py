"""Per-step parameter divergence between rxtpu and the torch mirror.

Runs both frameworks in lockstep on IDENTICAL views (dropout 0), and
after every step ports the current rxtpu params into a fresh torch
mirror and diffs its state_dict against the actually-trained torch
model, per top-level module. Localizes WHERE the first-step divergence
of dev/parity_lockstep.py enters.

Usage: python dev/parity_stepdiff.py [--steps 5] [--batch 4]
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
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--root", default="/tmp/rxtpu_parity_leak_data")
    args = ap.parse_args()

    import torch

    from parity_run import torch_model_from_flax
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.ops import augment_batch
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import make_train_step

    (train_pipe, _v, _t, _pg, _et, _truth) = build_data(args.root, args.batch)
    epochs_data = record_epochs(train_pipe, 1)

    cfg = Config(
        data=DataConfig(path_data=args.root, crop_size=CROP, src_size=64),
        model=ModelConfig(backbone="resnet50", pretrained=False,
                          nb_classes=NB_CLASSES, compute_dtype="float32",
                          dropout=0.0),
        train=TrainConfig(bs_per_device=args.batch, nb_epochs=1),
        experiment_id="stepdiff",
    )
    model = build_model(cfg)
    state, lr = create_train_state(
        cfg, model, steps_per_epoch=len(epochs_data[0]))
    params0 = jax.tree_util.tree_map(np.asarray, state.params)
    stats0 = jax.tree_util.tree_map(np.asarray, state.batch_stats)

    views = []
    for i, b in enumerate(epochs_data[0][: args.steps]):
        key = jax.random.fold_in(jax.random.PRNGKey(99), i)
        v = augment_batch(b["images"], b["mean"], b["std"], key,
                          crop_size=CROP, train=True, out_dtype=jnp.float32)
        views.append((np.asarray(v), b["labels"].astype(np.int64)))

    tstep = make_train_step(model, CROP, donate=False, augment="none")
    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)

    tmodel = torch_model_from_flax(params0, stats0)
    for mod in tmodel.modules():
        if isinstance(mod, torch.nn.Dropout):
            mod.p = 0.0
    opt = torch.optim.SGD(tmodel.parameters(), lr=lr, momentum=0.9,
                          nesterov=True, weight_decay=3e-5)
    crit = torch.nn.CrossEntropyLoss()
    tmodel.train()

    for si, (v, y) in enumerate(views):
        batch = {"images": jnp.asarray(v), "labels": jnp.asarray(y, jnp.int32),
                 "mean": jnp.zeros((len(y), 6)), "std": jnp.ones((len(y), 6))}
        state, m = tstep(state, batch, key, flag)

        x = torch.from_numpy(np.moveaxis(v, -1, 2).copy())
        opt.zero_grad()
        loss = crit(tmodel(x), torch.from_numpy(y))
        loss.backward()
        opt.step()

        # port current rxtpu params -> fresh torch mirror; diff state_dicts
        jx_params = jax.tree_util.tree_map(np.asarray, state.params)
        jx_stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        mirror = torch_model_from_flax(jx_params, jx_stats)
        sd_j, sd_t = mirror.state_dict(), tmodel.state_dict()
        per_mod = {}
        for k in sd_t:
            a = sd_j[k].detach().numpy().astype(np.float64)
            b2 = sd_t[k].detach().numpy().astype(np.float64)
            top = k.split(".")[0] + "." + k.split(".")[1]
            rel = float(np.linalg.norm(a - b2) /
                        max(float(np.linalg.norm(b2)), 1e-12))
            cur = per_mod.get(top)
            if cur is None or rel > cur[0]:
                per_mod[top] = (rel, k)
        worst = sorted(per_mod.items(), key=lambda kv: -kv[1][0])[:6]
        print(f"\nstep {si}: rxtpu loss {float(m['loss']):.6f} "
              f"torch loss {float(loss):.6f}")
        for top, (rel, k) in worst:
            print(f"   {rel:9.2e}  {top}  (worst: {k})")


if __name__ == "__main__":
    main()
