"""Clip-factor sweep for densenet121 int8 calibration on a TRAINED ckpt.

dev/densenet_int8_depth.py localized the residual per-channel-int8 error
to the STEM segment (9.3% rel at block1_layer1, ~5% steady after): absmax
calibration hands outlier pixels the whole int8 range, coarsening the
step for the bulk of each channel. This sweeps a global clip factor f
applied to every calibrated activation absmax (scalar and per-channel)
before quantize_densenet_backbone, measuring final-feature error and
logits agreement on the cached e4 trained checkpoint
(dev/densenet_int8_depth.py writes /tmp/dn_depth_state_s0_e15.pkl).

Usage: python dev/densenet_clip_sweep.py
"""

from __future__ import annotations

import os
import pickle
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("PARITY_DEVICE", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def clip_tree(t, f):
    if isinstance(t, dict):
        return {k: clip_tree(v, f) for k, v in t.items()}
    return np.asarray(t) * f


def main():
    import parity_run as pr
    from rxtpu.config import Config, DataConfig, ModelConfig, TrainConfig
    from rxtpu.infer.quant import calibrate, prepare_quantized
    from rxtpu.models.densenet import densenet121
    from rxtpu.train import build_model, create_train_state
    from rxtpu.train.step import eval_batch_normalize

    root = f"/tmp/rxtpu_parity_leak_data_e{pr.N_TRAIN_EXPS}"
    (train_pipe, val_pipe, test_pipe, plate_groups, exp_types,
     truth) = pr.build_data(root, 4, pipe_seed=0)
    test_data = [dict(b) for b in test_pipe.epoch(0)]
    cfg = Config(
        data=DataConfig(path_data=root, crop_size=pr.CROP, src_size=pr.IMG),
        model=ModelConfig(backbone="densenet121", pretrained=False,
                          nb_classes=pr.NB_CLASSES, compute_dtype="float32"),
        train=TrainConfig(bs_per_device=4, nb_epochs=15, seed=0),
        experiment_id="dnclip",
    )
    model = build_model(cfg)
    cache = "/tmp/dn_depth_state_s0_e15.pkl"
    if not os.path.exists(cache):
        raise SystemExit("run dev/densenet_int8_depth.py first (trains and "
                         "caches the checkpoint)")
    with open(cache, "rb") as f:
        params, stats = pickle.load(f)
    state, _ = create_train_state(cfg, model, steps_per_epoch=1)
    state = state.replace(params=params, batch_stats=stats)

    calib = [{k: b[k] for k in ("images", "mean", "std")}
             for b in test_data[:4]]
    qstats0 = calibrate(model, state, calib)

    # reference bf16 logits over the whole test split
    evars = {"params": state.params["backbone"],
             "batch_stats": state.batch_stats["backbone"]}

    def all_views():
        vs = []
        for b in test_data:
            v = eval_batch_normalize(b["images"], b["mean"], b["std"], None)
            vs.append(np.asarray(v.reshape((-1,) + v.shape[-3:])))
        return np.concatenate(vs)

    v = all_views()
    net_f = densenet121(dtype=jnp.float32)
    net_q = densenet121(dtype=jnp.float32, quantized=True)
    fe = np.asarray(net_f.apply(evars, v, train=False), np.float32)

    print(f"{'clip':>5s} {'feat_maxrel':>11s} {'feat_meanrel':>12s}")
    for f in (1.0, 0.95, 0.9, 0.85, 0.8, 0.7, 0.6):
        qstats = clip_tree(qstats0, f)
        qvars = prepare_quantized(model, state, qstats)
        fq = np.asarray(net_q.apply(
            {"params": qvars["params"]["backbone"]}, v, train=False),
            np.float32)
        maxrel = np.abs(fq - fe).max() / max(np.abs(fe).max(), 1e-9)
        meanrel = np.abs(fq - fe).mean() / max(np.abs(fe).mean(), 1e-9)
        print(f"{f:5.2f} {maxrel:11.4f} {meanrel:12.4f}")


if __name__ == "__main__":
    main()
