"""Optimizer + schedule: SGD/nesterov/wd + per-epoch cosine annealing.

Parity targets:
- SGD(momentum=0.9, nesterov=True, weight_decay=3e-5) (main.py:89-93).
  optax's nesterov trace computes the same update as torch SGD.
- CosineAnnealingLR(T_max=nb_epochs, eta_min=lr/100) stepped once per EPOCH
  (train.py:104-112): the schedule below is a function of the global step but
  quantizes to epoch granularity to match the reference exactly.
- Progressive unfreezing (train.py:46-67): epochs 1-2 train only the head
  when pretrained, epoch 3+ everything. Implemented as an update mask applied
  AFTER the full optax transform, so frozen params receive no momentum or
  weight-decay drift (torch ``requires_grad=False`` semantics). The mask flag
  is a traced scalar: one compiled step serves both phases.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def cosine_epoch_schedule(
    lr0: float, nb_epochs: int, steps_per_epoch: int, eta_min_ratio: float = 0.01
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """lr(epoch) = eta_min + (lr0 - eta_min) * (1 + cos(pi * epoch / T)) / 2."""
    eta_min = lr0 * eta_min_ratio

    def schedule(step):
        epoch = jnp.minimum(step // steps_per_epoch, nb_epochs)
        frac = epoch.astype(jnp.float32) / nb_epochs
        return eta_min + (lr0 - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def make_optimizer(
    lr: float,
    nb_epochs: int,
    steps_per_epoch: int,
    momentum: float = 0.9,
    nesterov: bool = True,
    weight_decay: float = 3e-5,
    use_scheduler: bool = True,
) -> optax.GradientTransformation:
    if use_scheduler:
        schedule: Any = cosine_epoch_schedule(lr, nb_epochs, max(1, steps_per_epoch))
    else:
        schedule = lr
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=nesterov),
    )


def head_only_mask(params: Any, head_scope: str = "head") -> Any:
    """Pytree of bools: True where the param belongs to the classification head.

    Mirrors train.py:50-59: only 'mlp'/'classifier' children stay trainable
    during the frozen phase; in our tree that is the ``head`` module scope.
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    leaves = []
    for path, _ in flat:
        top = path[0]
        key = getattr(top, "key", getattr(top, "name", None))
        leaves.append(key == head_scope)
    return jax.tree_util.tree_unflatten(treedef, leaves)


def apply_freeze_mask(updates: Any, mask: Any, backbone_trainable: jnp.ndarray) -> Any:
    """Zero non-head updates while the backbone is frozen (traced flag)."""
    return jax.tree_util.tree_map(
        lambda u, m: jnp.where(jnp.logical_or(backbone_trainable, m), u, jnp.zeros_like(u)),
        updates,
        mask,
    )


def backbone_trainable_at_epoch(epoch: int, pretrained: bool, head_only_epochs: int = 2) -> bool:
    """train.py:46-67: when pretrained, epochs 1..head_only_epochs are head-only."""
    if not pretrained:
        return True
    return epoch > head_only_epochs
