"""jit-compiled train / eval steps.

Replaces the reference's pytorch-ignite engine iteration
(``train.py:44,141``) with pure functions compiled once by XLA:

- the device-side augmentation (``rxtpu.ops``) is fused INTO the step, so
  the host ships raw uint8 channel planes and the whole
  decode-crop-normalize-forward-backward-update chain is a single XLA
  program (one launch, full fusion, no host sync)
- loss = softmax cross-entropy (train.py:37), metrics loss + accuracy
  (train.py:39-42)
- progressive unfreezing rides in as a traced bool so both phases share one
  compilation (see rxtpu.train.optim)
- the PRNG key is folded with the global step: reproducible regardless of
  prefetch order or restart point
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from rxtpu.ops import eval_batch_normalize, get_augment_fn
from rxtpu.train.optim import apply_freeze_mask, masked_grads_with_wd


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    freeze_mask: Any = None
    # coupled SGD weight decay, applied masked in the step (see
    # rxtpu.train.optim.masked_grads_with_wd)
    weight_decay: float = struct.field(pytree_node=False, default=0.0)
    # step -> lr, for per-step lr logging (reference train.py:128-134)
    lr_schedule: Any = struct.field(pytree_node=False, default=None)

    @classmethod
    def create(cls, params, batch_stats, tx, freeze_mask,
               weight_decay=0.0, lr_schedule=None):
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
            freeze_mask=freeze_mask,
            weight_decay=weight_decay,
            lr_schedule=lr_schedule,
        )


def cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def make_train_step(
    model,
    crop_size: int,
    donate: bool = True,
    augment: str = "shear",
) -> Callable:
    """Build the fused augment+forward+backward+update step.

    batch: dict with
      images: uint8 [B, G, C, H, W] raw decoded channel planes
      labels: int32 [B]
      mean/std: f32 [B, C] per-sample experiment stats

    ``augment`` selects the device augmentation backend (see
    rxtpu.ops.get_augment_fn); 'shear' is the TPU-fast default.
    """
    augment_batch = get_augment_fn(augment)

    def step_fn(
        state: TrainState,
        batch: Dict[str, jnp.ndarray],
        base_key: jax.Array,
        backbone_trainable: jnp.ndarray,
    ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        key = jax.random.fold_in(base_key, state.step)
        aug_key, dropout_key = jax.random.split(key)
        views = augment_batch(
            batch["images"], batch["mean"], batch["std"], aug_key,
            crop_size=crop_size, train=True,
        )

        def loss_fn(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                views,
                train=True,
                labels=batch["labels"],
                rngs={"dropout": dropout_key},
                mutable=["batch_stats"],
            )
            loss = cross_entropy(logits, batch["labels"])
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        # freeze + weight decay applied to the optimizer INPUT so frozen
        # params' momentum buffers stay at zero (torch requires_grad=False
        # semantics; see rxtpu.train.optim)
        grads_in = masked_grads_with_wd(
            grads, state.params, state.freeze_mask, backbone_trainable,
            state.weight_decay,
        )
        updates, new_opt_state = state.tx.update(grads_in, state.opt_state, state.params)
        updates = apply_freeze_mask(updates, state.freeze_mask, backbone_trainable)
        new_params = optax.apply_updates(state.params, updates)

        def _gsq(tree):
            return sum(
                jnp.sum(jnp.square(g.astype(jnp.float32)))
                for g in jax.tree_util.tree_leaves(tree)
            )

        metrics = {
            "loss": loss,
            "accuracy": (jnp.argmax(logits, -1) == batch["labels"]).mean(),
            # the reference logged per-epoch gradient histograms
            # (train.py:136-138); global + per-top-level-module norms are the
            # SPMD-cheap equivalent with the same diagnostic intent
            "grad_norm": jnp.sqrt(_gsq(grads)),
        }
        if isinstance(state.params, dict) and len(state.params) > 1:
            for top, sub in state.params.items():
                metrics[f"grad_norm/{top}"] = jnp.sqrt(_gsq(grads[top]))
        if state.lr_schedule is not None:
            # lr the optimizer used for THIS step (train.py:128-134 parity)
            metrics["lr"] = state.lr_schedule(state.step)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, metrics

    return jax.jit(step_fn, donate_argnums=(0,) if donate else ())


def _make_eval_apply(model, fold: bool = True) -> Callable:
    """(state, views) -> logits for eval/predict steps.

    When the model supports it (resnet backbone + mlp head), the eval
    forward consumes BN-FOLDED weights (rxtpu.infer.fold): the per-channel
    eval-BN affines are folded into conv kernels/biases inside the jitted
    step, so the compiled forward contains no normalization ops at all.
    """
    from rxtpu.infer.fold import fold_variables, foldable

    if fold and foldable(model):
        folded_model = model.clone(folded=True, fuse_blocks=False)

        def apply_fn(state, views):
            fvars = fold_variables(state.params, state.batch_stats)
            return folded_model.apply(fvars, views, train=False)

        return apply_fn

    def apply_fn(state, views):
        return model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            views,
            train=False,
        )

    return apply_fn


def _make_fused_stem_apply(model, crop_size) -> Callable:
    """(state, batch) -> logits with the fused Pallas stem kernel.

    The whole crop+normalize+conv7x7/2+BN-affine/relu+maxpool chain runs
    as ONE kernel per view (rxtpu.ops.fused_stem) on the raw uint8 batch;
    the rest of the network consumes BN-folded weights from the stem
    output (ResNet + mlp head only; see fold.foldable)."""
    from rxtpu.infer.fold import fold_variables, foldable
    from rxtpu.ops.fused_stem import fused_stem

    if not foldable(model):
        raise ValueError(
            "fused_stem=True needs a BN-foldable model (resnet backbone + "
            f"mlp head); got backbone={model.backbone!r} head={model.head!r}"
        )
    stem_model = model.clone(folded=True, fuse_blocks=False, stem_input=True)
    stem_dtype = model.dtype

    def apply_fn(state, batch):
        images = batch["images"]  # uint8 [B, G, C, H, W]
        b, g = images.shape[0], images.shape[1]
        imgs = images.reshape((b * g,) + images.shape[2:])
        scale = jnp.repeat(1.0 / (255.0 * batch["std"]), g, axis=0)
        nbias = jnp.repeat(-batch["mean"] / batch["std"], g, axis=0)
        fvars = fold_variables(state.params, state.batch_stats)
        stem_k = fvars["params"]["backbone"]["conv_init"]["kernel"]
        stem_b = fvars["params"]["backbone"]["conv_init"]["bias"]
        maps = fused_stem(imgs, scale, nbias, stem_k, stem_b,
                          crop_size=crop_size, out_dtype=stem_dtype)
        maps = jnp.transpose(maps, (0, 2, 3, 1))  # NCHW -> NHWC (~free)
        maps = maps.reshape((b, g) + maps.shape[1:])
        return stem_model.apply(fvars, maps, train=False)

    return apply_fn


def _make_eval_body(model, crop_size: int, fold: bool = True,
                    fused_stem: bool = False) -> Callable:
    """Unjitted eval step body (shared by the per-batch and scanned steps)."""
    apply_fn = _make_eval_apply(model, fold)
    fused_apply = (
        _make_fused_stem_apply(model, crop_size) if fused_stem else None
    )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if fused_apply is not None:
            logits = fused_apply(state, batch)
        else:
            views = eval_batch_normalize(
                batch["images"], batch["mean"], batch["std"], crop_size
            )
            logits = apply_fn(state, views)
        labels = batch["labels"]
        valid = batch.get("valid")
        if valid is None:
            valid = jnp.ones_like(labels, jnp.float32)
        losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        correct = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        return {
            "loss_sum": (losses * valid).sum(),
            "correct": (correct * valid).sum(),
            "count": valid.sum(),
        }

    return step_fn


def make_eval_step(model, crop_size: int, fold: bool = True,
                   fused_stem: bool = False) -> Callable:
    """Center-crop + normalize + forward; returns per-batch (loss_sum, correct, n).

    Mirrors the ignite evaluator metrics (train.py:39-42) as exact sums so
    epoch metrics are independent of batch partitioning.
    """
    return jax.jit(_make_eval_body(model, crop_size, fold, fused_stem))


def make_scanned_eval_step(model, crop_size: int, fold: bool = True,
                           fused_stem: bool = False) -> Callable:
    """Eval over a WINDOW of batches in one compiled program.

    Takes batches stacked along a leading axis ([K, B, ...] per leaf) and
    ``lax.scan``s the eval body over them, returning the summed metric
    dict. One dispatch serves K batches — per-launch host/runtime overhead
    (which does not overlap execution on relay-attached chips) is paid
    once per window instead of once per batch. Numerically identical to
    summing K ``make_eval_step`` calls (metrics are exact sums,
    train.py:39-42 parity).
    """
    body = _make_eval_body(model, crop_size, fold, fused_stem)

    def step_fn(state: TrainState, batches: Dict[str, jnp.ndarray]):
        def f(carry, batch):
            m = body(state, batch)
            return carry, m

        _, ms = jax.lax.scan(f, None, batches)
        return jax.tree_util.tree_map(lambda x: x.sum(0), ms)

    return jax.jit(step_fn)


def _make_predict_body(
    model, crop_size: Optional[int] = None, fold: bool = True,
    fused_stem: bool = False, transforms: Optional[Sequence[Callable]] = None,
    average: str = "probs", apply_fn: Optional[Callable] = None,
    normalize_fn: Optional[Callable] = None,
) -> Callable:
    """Unjitted predict step body (shared by per-batch and scanned steps).

    Test-time softmax probabilities (test.py:27-29): G=6 two-site TTA.

    ``crop_size=None`` (default) matches the reference TEST transform,
    which normalizes WITHOUT cropping (dataloader.py:128-139 applies the
    crop only for train/val); pass an int to trade parity for ~2x faster
    cropped inference.

    ``transforms`` (optional list of view->view fns, e.g. dihedral TTA
    variants from rxtpu.infer.tta) averages over geometric variants:
    ``average='probs'`` averages softmax outputs, ``'logits'`` averages
    pre-softmax logits then softmaxes once (BASELINE config 3).
    """
    if transforms and fused_stem:
        raise ValueError("TTA transforms need materialized views; "
                         "fused_stem=True is incompatible")
    if average not in ("probs", "logits"):
        raise ValueError(f"unknown tta average mode {average!r}")
    if apply_fn is None:
        apply_fn = _make_eval_apply(model, fold)
    fused_apply = (
        _make_fused_stem_apply(model, crop_size) if fused_stem else None
    )

    def step_fn(state: TrainState, batch: Dict[str, jnp.ndarray]):
        if fused_apply is not None:
            return jax.nn.softmax(fused_apply(state, batch), axis=-1)
        if normalize_fn is not None:
            # caller-supplied view producer (e.g. the int8 quantize-at-
            # source normalize, rxtpu/infer/quant._make_quantized_body)
            views = normalize_fn(state, batch)
        else:
            views = eval_batch_normalize(
                batch["images"], batch["mean"], batch["std"], crop_size
            )
        ts = transforms or (lambda v: v,)
        acc = None
        for t in ts:
            logits = apply_fn(state, t(views))
            term = (jax.nn.softmax(logits, axis=-1)
                    if average == "probs" else logits)
            acc = term if acc is None else acc + term
        acc = acc / len(ts)
        return acc if average == "probs" else jax.nn.softmax(acc, axis=-1)

    return step_fn


def make_predict_step(
    model, crop_size: Optional[int] = None, fold: bool = True,
    fused_stem: bool = False, transforms: Optional[Sequence[Callable]] = None,
    average: str = "probs",
) -> Callable:
    """Jitted per-batch predict step; see _make_predict_body for semantics."""
    return jax.jit(_make_predict_body(
        model, crop_size, fold, fused_stem, transforms, average
    ))


def make_scanned_predict_step(
    model, crop_size: Optional[int] = None, fold: bool = True,
    fused_stem: bool = False, transforms: Optional[Sequence[Callable]] = None,
    average: str = "probs",
) -> Callable:
    """Predict over a WINDOW of batches in one compiled program.

    Takes batches stacked along a leading axis ([K, B, ...] per leaf) and
    returns stacked probabilities [K, B, nb_classes]. One dispatch serves
    K batches, amortizing per-launch runtime overhead; each window slice
    is numerically identical to a ``make_predict_step`` call on that
    batch.
    """
    body = _make_predict_body(
        model, crop_size, fold, fused_stem, transforms, average
    )

    def step_fn(state: TrainState, batches: Dict[str, jnp.ndarray]):
        def f(carry, batch):
            return carry, body(state, batch)

        _, probs = jax.lax.scan(f, None, batches)
        return probs

    return jax.jit(step_fn)
