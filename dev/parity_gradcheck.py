"""Teacher-forced gradient parity along the rxtpu training trajectory.

SGD on a deep net is chaotic: two correct implementations with f32
round-off differences produce diverging trajectories (see
dev/parity_lockstep.py). The well-posed equivalence check is therefore:
at every step of rxtpu's OWN trajectory, load the current rxtpu params
into the torch reference mirror, run the identical views through both,
and compare losses and full gradient vectors AT THE SAME POINT. If the
two frameworks compute the same loss and the same gradient at every
visited point (to f32 tolerance), their training dynamics are the same
mathematical function and any accuracy difference between free-running
runs is trajectory chaos, not a framework bug.

Usage: python dev/parity_gradcheck.py [--steps 12] [--batch 4]
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
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--root", default="/tmp/rxtpu_parity_leak_data")
    ap.add_argument("--tol", type=float, default=5e-3)
    ap.add_argument("--f64", action="store_true",
                    help="compute both frameworks in float64: separates f32 "
                         "roundoff amplification from semantic differences")
    args = ap.parse_args()
    if args.f64:
        jax.config.update("jax_enable_x64", True)

    import torch

    from parity_run import torch_model_from_flax
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.ops import augment_batch
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import cross_entropy, make_train_step

    (train_pipe, _v, _t, _pg, _et, _truth) = build_data(args.root, args.batch)
    n_epochs = (args.steps // 6) + 1
    epochs_data = record_epochs(train_pipe, n_epochs)
    flat_batches = [b for ep in epochs_data for b in ep][: args.steps]

    cfg = Config(
        data=DataConfig(path_data=args.root, crop_size=CROP, src_size=64),
        model=ModelConfig(backbone="resnet50", pretrained=False,
                          nb_classes=NB_CLASSES,
                          compute_dtype="float64" if args.f64 else "float32",
                          # f64 params too: value_and_grad returns grads at
                          # param dtype, and an f32 grad round-off would cap
                          # the comparison at ~6e-8 relative
                          param_dtype="float64" if args.f64 else "float32",
                          dropout=0.0),
        train=TrainConfig(bs_per_device=args.batch, nb_epochs=n_epochs),
        experiment_id="gradcheck",
    )
    model = build_model(cfg)
    state, lr = create_train_state(
        cfg, model, steps_per_epoch=len(epochs_data[0]))

    tstep = make_train_step(model, CROP, donate=False, augment="none")

    @jax.jit
    def grads_at(st, views, labels):
        def loss_fn(params):
            logits, _ = model.apply(
                {"params": params, "batch_stats": st.batch_stats}, views,
                train=True, labels=labels, mutable=["batch_stats"],
                rngs={"dropout": jax.random.PRNGKey(0)})
            return cross_entropy(logits, labels)

        return jax.value_and_grad(loss_fn)(st.params)

    key = jax.random.PRNGKey(0)
    flag = jnp.asarray(True)
    crit = torch.nn.CrossEntropyLoss()
    worst_overall = (0.0, "", -1)
    worst_grel = 0.0
    worst_core = 0.0
    worst_lrel = 0.0
    for si, b in enumerate(flat_batches):
        kk = jax.random.fold_in(jax.random.PRNGKey(99), si)
        v = np.asarray(augment_batch(b["images"], b["mean"], b["std"], kk,
                                     crop_size=CROP, train=True,
                                     out_dtype=jnp.float32))
        y = b["labels"].astype(np.int64)
        views = jnp.asarray(v)
        labels = jnp.asarray(y, jnp.int32)

        jx_loss, jx_grads = grads_at(state, views, labels)
        jx_loss = float(jx_loss)

        # torch at the SAME params (teacher-forced)
        jx_params = jax.tree_util.tree_map(np.asarray, state.params)
        jx_stats = jax.tree_util.tree_map(np.asarray, state.batch_stats)
        port_dtype = np.float64 if args.f64 else np.float32
        tmodel = torch_model_from_flax(jx_params, jx_stats, dtype=port_dtype)
        for mod in tmodel.modules():
            if isinstance(mod, torch.nn.Dropout):
                mod.p = 0.0
        tmodel.train()
        x = torch.from_numpy(np.moveaxis(v, -1, 2).copy())
        if args.f64:
            x = x.double()
        loss = crit(tmodel(x), torch.from_numpy(y))
        loss.backward()
        th_loss = float(loss)

        # port the jax GRAD tree through the same param mapping: a mirror
        # whose "params" are the grads; its state_dict params == jax grads
        g_np = jax.tree_util.tree_map(np.asarray, jx_grads)
        gmirror = torch_model_from_flax(g_np, jx_stats, dtype=port_dtype)
        gsd = gmirror.state_dict()
        bn_bias = {
            f"{mn}.bias" for mn, m in tmodel.named_modules()
            if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d))
        }
        worst = (0.0, "", 0.0, 0.0)
        gnorm_sq = err_sq = 0.0
        core_gnorm_sq = core_err_sq = 0.0
        for name, p in tmodel.named_parameters():
            if p.grad is None:
                continue
            a = gsd[name].detach().numpy().astype(np.float64)
            t = p.grad.detach().numpy().astype(np.float64)
            d = float(np.linalg.norm(a - t))
            tn = float(np.linalg.norm(t))
            gnorm_sq += tn * tn
            err_sq += d * d
            if name not in bn_bias:
                # BN bias grads are pure sum(dy): batch*spatial-sized
                # cancellation sums whose f32 round-off amplification is
                # unbounded relative to the cancelled result, and torch's
                # own CPU reductions are run-to-run nondeterministic —
                # measured spikes to ~6e-2 between two runs of the SAME
                # binaries. Gate on everything else; --f64 gates them too.
                core_gnorm_sq += tn * tn
                core_err_sq += d * d
            rel = d / max(tn, 1e-12)
            if rel > worst[0]:
                worst = (rel, name, d, tn)
        lrel = abs(jx_loss - th_loss) / max(abs(th_loss), 1e-9)
        grel = (err_sq ** 0.5) / max(gnorm_sq ** 0.5, 1e-12)
        core_grel = (core_err_sq ** 0.5) / max(core_gnorm_sq ** 0.5, 1e-12)
        print(f"step {si:3d}: loss rxtpu {jx_loss:.6f} torch {th_loss:.6f} "
              f"(rel {lrel:.1e}); global grad rel {grel:.2e} "
              f"(ex-BN-bias {core_grel:.2e}); worst leaf "
              f"rel {worst[0]:.2e} @ {worst[1]} "
              f"(|d|={worst[2]:.2e} |g|={worst[3]:.2e})", flush=True)
        if worst[0] > worst_overall[0]:
            worst_overall = (worst[0], worst[1], si)
        worst_grel = max(worst_grel, grel)
        worst_core = max(worst_core, core_grel)
        worst_lrel = max(worst_lrel, lrel)

        # advance the rxtpu trajectory with the production step
        batch = {"images": views, "labels": labels,
                 "mean": jnp.zeros((len(y), 6)), "std": jnp.ones((len(y), 6))}
        state, _ = tstep(state, batch, key, flag)

    print(f"\nworst GLOBAL grad rel over {len(flat_batches)} steps: "
          f"{worst_grel:.3e} (ex-BN-bias {worst_core:.3e}); worst single "
          f"leaf rel {worst_overall[0]:.3e} "
          f"@ {worst_overall[1]} (step {worst_overall[2]})")
    # What each precision can gate on:
    # - f64: the semantic test — EVERY gradient leaf must agree (measured
    #   <=6e-12; tol gives huge margin).
    # - f32: train-mode BN backprop amplifies round-off chaotically at
    #   depth — equally-correct implementations measure percent-level
    #   global gradient differences (worst leaves in BN biases), so a
    #   tight f32 gradient gate would be testing round-off, not
    #   semantics. Gate f32 on the loss (tight, ~1e-6 measured) plus a
    #   10x-margin sanity bound on the gradient noise.
    if args.f64:
        ok = worst_grel < args.tol
    else:
        ok = worst_lrel < 1e-4 and worst_grel < 0.2
        print(f"(f32 mode: gating on loss rel {worst_lrel:.1e} < 1e-4 and "
              f"grad-noise sanity bound {worst_grel:.1e} < 0.2; the "
              f"semantic gradient gate is --f64)")
    print("GRADCHECK", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
