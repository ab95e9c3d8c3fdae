"""Optimizer + schedule: SGD/nesterov/wd + per-epoch cosine annealing.

Parity targets:
- SGD(momentum=0.9, nesterov=True, weight_decay=3e-5) (main.py:89-93).
  optax's nesterov trace computes the same update as torch SGD.
- CosineAnnealingLR(T_max=nb_epochs, eta_min=lr/100) stepped once per EPOCH
  (train.py:104-112): the schedule below is a function of the global step but
  quantizes to epoch granularity to match the reference exactly.
- Progressive unfreezing (train.py:46-67): epochs 1-2 train only the head
  when pretrained, epoch 3+ everything. Implemented as a mask applied to the
  (grad + wd*param) INPUT of the optimizer, so frozen params feed exactly
  zero into the momentum trace — torch skips params with ``p.grad is None``
  entirely, leaving their momentum buffers at zero, and a zeroed input
  reproduces that (the trace starts at zero and stays there). Weight decay
  is therefore applied here, masked, rather than via an unconditional
  ``optax.add_decayed_weights`` in the chain (which would leak wd*param
  into frozen params' momentum). The mask flag is a traced scalar: one
  compiled step serves both phases.
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


def make_schedule(
    lr: float, nb_epochs: int, steps_per_epoch: int, use_scheduler: bool = True
) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """The step->lr function, also used to log the lr (train.py:128-134)."""
    if use_scheduler:
        return cosine_epoch_schedule(lr, nb_epochs, max(1, steps_per_epoch))
    return lambda step: jnp.asarray(lr, jnp.float32)


def make_optimizer(
    lr: float,
    nb_epochs: int,
    steps_per_epoch: int,
    momentum: float = 0.9,
    nesterov: bool = True,
    use_scheduler: bool = True,
    schedule: Any = None,
) -> optax.GradientTransformation:
    """SGD/nesterov on a (possibly scheduled) lr.

    Weight decay is NOT in this chain: the train step adds ``wd * param`` to
    the gradient under the freeze mask (see ``masked_grads_with_wd``), which
    matches torch's coupled SGD weight decay (d_p = g + wd*p before the
    momentum buffer) while keeping frozen params' buffers untouched.
    """
    if schedule is None:
        schedule = make_schedule(lr, nb_epochs, steps_per_epoch, use_scheduler)
    return optax.sgd(learning_rate=schedule, momentum=momentum, nesterov=nesterov)


def masked_grads_with_wd(
    grads: Any, params: Any, mask: Any, backbone_trainable: jnp.ndarray,
    weight_decay: float,
) -> Any:
    """(grad + wd*param) where trainable, exactly zero where frozen.

    Zero input keeps the frozen params' momentum trace at its initial zero,
    reproducing torch's skip-None-grads behavior (torch.optim.SGD with
    requires_grad=False params, reference train.py:46-67 + main.py:89-93).
    """
    return jax.tree_util.tree_map(
        lambda g, p, m: jnp.where(
            jnp.logical_or(backbone_trainable, m),
            g + weight_decay * p.astype(g.dtype),
            jnp.zeros_like(g),
        ),
        grads,
        params,
        mask,
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
