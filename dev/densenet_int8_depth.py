"""Depth profile of densenet121 W8A8 error on a TRAINED checkpoint.

The round-5 4-seed trained-checkpoint race exposed what the random-init
test bar (rel err < 0.1, argmax agreement >= 0.75) hid: per-TENSOR
activation scales collapse on trained pre-activation BNs (67% submission
agreement). Per-channel scales (quantize_densenet_backbone) recovered
most of it; this probe localizes what remains by comparing every
block/transition output between the bf16 eval forward and the
int8-resident forward on a checkpoint trained the same way the race
trains (dev/parity_run.py --backbone densenet121, e4 dataset).

Usage: PARITY_N_EXPS=4 python dev/densenet_int8_depth.py [--epochs 15]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("PARITY_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import parity_run as pr
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.infer.quant import calibrate, prepare_quantized
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import eval_batch_normalize

    root = f"/tmp/rxtpu_parity_leak_data_e{pr.N_TRAIN_EXPS}"
    (train_pipe, val_pipe, test_pipe, plate_groups, exp_types,
     truth) = pr.build_data(root, 4, pipe_seed=args.seed)
    epochs_data = pr.record_epochs(train_pipe, args.epochs)
    val_data = [dict(b) for b in val_pipe.epoch(0)]
    test_data = [dict(b) for b in test_pipe.epoch(0)]
    cfg = Config(
        data=DataConfig(path_data=root, crop_size=pr.CROP, src_size=pr.IMG),
        model=ModelConfig(backbone="densenet121", pretrained=False,
                          nb_classes=pr.NB_CLASSES, compute_dtype="float32"),
        train=TrainConfig(bs_per_device=4, nb_epochs=args.epochs,
                          seed=args.seed),
        experiment_id="dnprobe",
    )
    model = build_model(cfg)
    import pickle

    cache = f"/tmp/dn_depth_state_s{args.seed}_e{args.epochs}.pkl"
    if os.path.exists(cache):
        with open(cache, "rb") as f:
            params, stats = pickle.load(f)
        state, _ = create_train_state(cfg, model,
                                      steps_per_epoch=len(epochs_data[0]))
        best_state = state.replace(params=params, batch_stats=stats)
        print("loaded cached trained state")
    else:
        state, _ = create_train_state(cfg, model,
                                      steps_per_epoch=len(epochs_data[0]))
        accs, probs, ids, best_state = pr.run_rxtpu(
            cfg, model, state, epochs_data, val_data, test_data, args.epochs,
            seed=args.seed, augment="gather")
        print(f"trained: best val {max(accs):.3f}")
        with open(cache, "wb") as f:
            pickle.dump((jax.device_get(best_state.params),
                         jax.device_get(best_state.batch_stats)), f)

    calib = [{k: b[k] for k in ("images", "mean", "std")}
             for b in test_data[:4]]
    qstats = calibrate(model, best_state, calib)
    qvars = prepare_quantized(model, best_state, qstats)

    from rxtpu.models.densenet import densenet121

    batch = test_data[0]
    views = eval_batch_normalize(
        batch["images"], batch["mean"], batch["std"], None)
    v = np.asarray(views.reshape((-1,) + views.shape[-3:])[:8])

    evars = {"params": best_state.params["backbone"],
             "batch_stats": best_state.batch_stats["backbone"]}
    qb = {"params": qvars["params"]["backbone"]}
    _, ef = densenet121(dtype=jnp.float32).apply(
        evars, v, train=False, capture_intermediates=True,
        mutable=["intermediates"])
    _, qf = densenet121(dtype=jnp.float32, quantized=True).apply(
        qb, v, train=False, capture_intermediates=True,
        mutable=["intermediates"])
    ei = ef["intermediates"]
    qi = qf["intermediates"]

    def dequant(v):
        if isinstance(v, tuple) and len(v) == 2:
            q, s = v
            if hasattr(q, "dtype") and q.dtype == jnp.int8:
                return np.asarray(q, np.float32) * np.asarray(s, np.float32)
        return None

    print(f"{'module':24s} {'rel_err':>9s} {'absmax_f':>9s}")
    for name in sorted(ei.keys()):
        if name not in qi or not isinstance(ei[name], dict) \
                or not isinstance(qi[name], dict):
            continue
        e_out = ei[name].get("__call__", (None,))[0]
        q_out = qi[name].get("__call__", (None,))[0]
        if e_out is None or q_out is None:
            continue
        # eval DenseLayer returns the concat (float); quantized returns
        # an (int8 state, svec) pair — dequantize for comparison
        qd = dequant(q_out)
        if qd is None:
            continue
        ef_ = np.asarray(e_out, np.float32)
        if ef_.shape != qd.shape:
            continue
        rel = np.abs(qd - ef_).max() / max(np.abs(ef_).max(), 1e-9)
        print(f"{name:24s} {rel:9.4f} {np.abs(ef_).max():9.3f}")

    # final features
    feats_e = densenet121(dtype=jnp.float32).apply(evars, v, train=False)
    feats_q = densenet121(dtype=jnp.float32, quantized=True).apply(
        qb, v, train=False)
    fe, fq = np.asarray(feats_e, np.float32), np.asarray(feats_q, np.float32)
    rel = np.abs(fq - fe).max() / max(np.abs(fe).max(), 1e-9)
    print(f"\nfinal features: max rel err {rel:.4f}  "
          f"mean rel {np.abs(fq-fe).mean()/max(np.abs(fe).mean(),1e-9):.4f}")


if __name__ == "__main__":
    main()
