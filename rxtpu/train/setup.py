"""Model + optimizer + state construction (the main.py:86-94 equivalent)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from rxtpu.config import Config, resolve_lr
from rxtpu.models import TwoSitesNN
from rxtpu.train.optim import head_only_mask, make_optimizer, make_schedule
from rxtpu.train.step import TrainState


def build_model(cfg: Config, bn_axis_name: Optional[str] = None) -> TwoSitesNN:
    fuse = cfg.model.fuse_blocks
    if fuse is None:
        # Default OFF: the fused path is numerically a drop-in but measured
        # 2.2x SLOWER than XLA's composition on real stage1 shapes (v5e,
        # dev/tpu_fused_probe.py: 62.7 vs 28.2 ms for the 3-block chain) —
        # VMEM caps slabs at ~1k pixels so grid overhead dominates. Opt-in
        # via ModelConfig.fuse_blocks=True; see OPTIMIZATION.md.
        fuse = False
    return TwoSitesNN(
        backbone=cfg.model.backbone,
        nb_classes=cfg.model.nb_classes,
        size_features=cfg.model.size_features,
        dropout=cfg.model.dropout,
        head=cfg.model.head,
        arcface_margin=cfg.model.arcface_margin,
        arcface_scale=cfg.model.arcface_scale,
        control_calibration=cfg.model.control_calibration,
        dtype=jnp.dtype(cfg.model.compute_dtype),
        param_dtype=jnp.dtype(cfg.model.param_dtype),
        bn_axis_name=bn_axis_name,
        fuse_blocks=fuse,
    )


def create_train_state(
    cfg: Config,
    model: TwoSitesNN,
    steps_per_epoch: int,
    n_devices: int = 1,
    rng: Optional[jax.Array] = None,
) -> Tuple[TrainState, float]:
    """Initialize params (+ optional pretrained port), optimizer, TrainState.

    Initialization uses a tiny dummy spatial size — conv/BN params are
    shape-independent of H/W, so init is cheap even for 512^2 training.
    Returns (state, resolved_lr); lr = 0.0005 * global batch (main.py:70-73).
    """
    if rng is None:
        rng = jax.random.PRNGKey(cfg.train.seed)
    dummy = jnp.zeros((1, 3, 32, 32, 6), jnp.float32)
    if cfg.model.head == "arcface":
        variables = model.init(
            {"params": rng, "dropout": rng}, dummy, train=False, labels=None
        )
    else:
        variables = model.init({"params": rng, "dropout": rng}, dummy, train=False)
    params = variables["params"]
    batch_stats = variables["batch_stats"]

    if cfg.model.pretrained_path:  # explicit weights win over debug shrinking
        from rxtpu.models.pretrained import (
            _RESNET_ARCH, load_torch_state_dict, port_torch_densenet121,
            port_torch_resnet,
        )

        sd = load_torch_state_dict(cfg.model.pretrained_path)
        if cfg.model.backbone in _RESNET_ARCH:
            params, batch_stats = port_torch_resnet(
                sd, dict(params), dict(batch_stats), arch=cfg.model.backbone
            )
        elif cfg.model.backbone == "densenet121":
            params, batch_stats = port_torch_densenet121(
                sd, dict(params), dict(batch_stats)
            )
        else:
            raise ValueError(
                f"pretrained porting supports {sorted(_RESNET_ARCH) + ['densenet121']}, "
                f"not {cfg.model.backbone!r}"
            )

    lr = resolve_lr(cfg, n_devices)
    schedule = make_schedule(
        lr, cfg.train.nb_epochs, steps_per_epoch, cfg.train.scheduler
    )
    tx = make_optimizer(
        lr=lr,
        nb_epochs=cfg.train.nb_epochs,
        steps_per_epoch=steps_per_epoch,
        momentum=cfg.train.momentum,
        nesterov=cfg.train.nesterov,
        use_scheduler=cfg.train.scheduler,
        schedule=schedule,
    )
    state = TrainState.create(
        params=params,
        batch_stats=batch_stats,
        tx=tx,
        freeze_mask=head_only_mask(params),
        weight_decay=cfg.train.weight_decay,
        lr_schedule=schedule,
    )
    return state, lr
