"""Training loop: epochs, validation, best-checkpoint, early stopping.

Replaces the pytorch-ignite engine wiring of ``cell_classifier/train.py``:

- validation runs once BEFORE training and after every epoch
  (``train.py:82-86`` runs the evaluator at STARTED and EPOCH_COMPLETED)
- best-val-accuracy checkpointing with the "New best accuracy!" announcement
  (``train.py:88-96``)
- optional early stopping on val accuracy with patience
  (``train.py:74-80``, off by default per ``main.py:51``)
- progressive unfreezing by epoch when pretrained (``train.py:46-67``)
- cosine LR annealing is inside the optimizer (see rxtpu.train.optim)
- step-time + input-stall instrumentation and metric logging that actually
  flushes (fixes SURVEY.md §2 quirk 2)
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

import os

from rxtpu.config import Config
from rxtpu.data.pipeline import Pipeline, device_prefetch
from rxtpu.train.checkpoint import (
    BestCheckpointer,
    checkpoint_exists,
    load_checkpoint,
    save_checkpoint,
)
from rxtpu.train.metrics import MetricLogger, StepTimer
from rxtpu.train.optim import backbone_trainable_at_epoch
from rxtpu.train.step import TrainState, make_eval_step, make_train_step


def last_checkpoint_path(cfg: Config) -> str:
    """Rolling full-state checkpoint enabling mid-training resume — a
    capability the reference lacks (it only phase-skips, SURVEY.md §5)."""
    return os.path.join(cfg.train.checkpoint_dir, f"last_{cfg.experiment_id}.ckpt")


def _progress_bar(total: int, epoch: int):
    """Per-epoch tqdm bar (the reference's ignite ProgressBar, train.py:69-70);
    suppressed when stderr is not a tty (logs stay clean under drivers)."""
    import sys

    if not sys.stderr.isatty():
        return None
    from tqdm import tqdm

    return tqdm(total=total, desc=f"epoch {epoch}", leave=False)


@dataclasses.dataclass
class TrainResult:
    state: TrainState
    best_accuracy: float
    epochs_run: int
    history: list


def evaluate(
    eval_step: Callable, state: TrainState, pipe: Pipeline, put: Callable
) -> Dict[str, float]:
    """Aggregate exact loss/accuracy over a validation pipeline."""
    loss_sum, correct, count = 0.0, 0.0, 0.0
    for batch in put(pipe.epoch(0)):
        batch.pop("id_codes", None)
        m = eval_step(state, batch)
        loss_sum += float(m["loss_sum"])
        correct += float(m["correct"])
        count += float(m["count"])
    count = max(count, 1.0)
    return {"loss": loss_sum / count, "accuracy": correct / count}


def run_training(
    cfg: Config,
    model,
    state: TrainState,
    train_pipe: Pipeline,
    val_pipe: Pipeline,
    base_key: jax.Array,
    put: Optional[Callable] = None,
    logger: Optional[MetricLogger] = None,
    print_fn: Callable = print,
    resume: bool = False,
    place_fn: Optional[Callable] = None,
) -> TrainResult:
    """Run the full epoch loop; returns final state + best metric.

    ``put`` maps a host-batch iterator to device batches (default:
    single-device double-buffered prefetch; the data-parallel path passes a
    sharding-aware version from rxtpu.parallel).
    """
    if put is None:
        put = device_prefetch
    if cfg.train.early_stopping and cfg.train.patience < 1:
        # ignite EarlyStopping rejects patience < 1 too; with the loop-top
        # plateau check, patience 0 would train zero epochs
        raise ValueError("early stopping requires patience >= 1")

    crop = cfg.data.crop_size
    train_step = make_train_step(model, crop, augment=cfg.train.augment_backend)
    eval_step = make_eval_step(model, crop)
    ckpt = BestCheckpointer(cfg.checkpoint_path, backend=cfg.train.checkpoint_backend)
    timer = StepTimer()
    history = []
    epoch = 0
    start_epoch = 1
    epochs_without_improvement = 0
    own_logger = logger is None
    if own_logger:
        logger = MetricLogger(cfg.train.board_dir, cfg.experiment_id)

    last_path = last_checkpoint_path(cfg)
    start_batch = 0
    if resume and checkpoint_exists(last_path):
        saved = load_checkpoint(last_path)
        state = state.replace(
            step=saved["step"],
            params=saved["params"],
            batch_stats=saved["batch_stats"],
            opt_state=saved["opt_state"],
        )
        ckpt.best = saved.get("best_metric")
        epochs_without_improvement = int(saved.get("epochs_without_improvement", 0))
        start_batch = int(saved.get("batch_in_epoch", 0))
        if start_batch > 0:
            # mid-epoch (preemption-safe) checkpoint: re-enter the SAME
            # epoch and replay its deterministic stream from batch_in_epoch
            start_epoch = int(saved["epoch"])
            print_fn(
                f"Resumed mid-epoch {start_epoch} at batch {start_batch} "
                f"(step {int(saved['step'])})")
        else:
            start_epoch = int(saved["epoch"]) + 1
            print_fn(
                f"Resumed from epoch {saved['epoch']} (step {int(saved['step'])})")
        if place_fn is not None:
            # restore loads host arrays; re-apply the mesh shardings so the
            # resumed state matches the compiled step's expectations
            state = place_fn(state)

    def checkpoint_payload(st: TrainState) -> Dict:
        return {
            "params": st.params,
            "batch_stats": st.batch_stats,
            "opt_state": st.opt_state,
            "step": st.step,
        }

    try:
        if start_epoch == 1 and start_batch == 0:
            # Validation at STARTED (train.py:82-86) — epoch 0 seeds best-acc.
            val_m = evaluate(eval_step, state, val_pipe, put)
            if ckpt.update(val_m["accuracy"], checkpoint_payload(state)):
                print_fn(f"New best accuracy! Accuracy: {val_m['accuracy']}\nModel saved!")
            print_fn(
                f"Validation Results - Epoch: 0 Average Loss: {val_m['loss']:.4f} "
                f"| Accuracy: {val_m['accuracy']:.4f}"
            )
            logger.log(0, val_m, prefix="validation")

        # host-side step counter: reading state.step (or any same-step
        # output) every iteration would block dispatch on a full device
        # round-trip per step (~32 ms on relay-attached chips)
        step_i = int(state.step)

        # epochs actually trained: stays start_epoch-1 if the resume plateau
        # gate below fires before any epoch runs (the for statement would
        # already have bound `epoch` to the first UNRUN epoch)
        epochs_run = start_epoch - 1

        for epoch in range(start_epoch, cfg.train.nb_epochs + 1):
            if (cfg.train.early_stopping
                    and epochs_without_improvement >= cfg.train.patience):
                # resuming a run that had already early-stopped must not
                # retrain an extra epoch before re-noticing the plateau
                break
            trainable = backbone_trainable_at_epoch(
                epoch, cfg.model.pretrained, cfg.train.freeze_head_only_epochs
            )
            if cfg.model.pretrained and epoch == 1:
                print_fn("head is unfrozen")  # train.py:50-56 announcements
            if cfg.model.pretrained and epoch == cfg.train.freeze_head_only_epochs + 1:
                print_fn("Turn on all the layers")
            flag = jnp.asarray(trainable)

            timer.reset()
            sb = start_batch if epoch == start_epoch else 0
            it = put(train_pipe.epoch(epoch, start_batch=sb))
            pbar = _progress_bar(len(train_pipe) - sb, epoch)
            batch_i = sb
            prev_m = None
            prev_loss = float("nan")
            while True:
                with timer.waiting():
                    batch = next(it, None)
                if batch is None:
                    break
                batch.pop("id_codes", None)
                batch.pop("valid", None)
                with timer.stepping():
                    state, m = train_step(state, batch, base_key, flag)
                    step_i += 1
                    batch_i += 1
                    if prev_m is not None:
                        # lag-one readback: blocks until step i-1 finished
                        # (keeps the stepping timer ~= device step time)
                        # without draining the pipeline on step i
                        prev_loss = float(prev_m["loss"])
                    prev_m = m
                if pbar is not None:
                    pbar.update(1)
                    pbar.set_postfix(loss=f"{prev_loss:.3f}", refresh=False)
                if step_i % cfg.train.log_every_steps == 0:
                    logger.log(step_i, {k: float(v) for k, v in m.items()}, prefix="training")
                every = cfg.train.checkpoint_every_steps
                if every and step_i % every == 0 and batch_i < len(train_pipe):
                    # preemption-safe roll: epoch is INCOMPLETE, record how
                    # far its deterministic stream got
                    save_checkpoint(
                        last_path,
                        {**checkpoint_payload(state), "epoch": epoch,
                         "batch_in_epoch": batch_i,
                         "best_metric": ckpt.best,
                         "epochs_without_improvement": epochs_without_improvement},
                        backend=cfg.train.checkpoint_backend,
                    )
            if pbar is not None:
                pbar.close()
            logger.log(step_i, timer.summary(), prefix="perf")

            val_m = evaluate(eval_step, state, val_pipe, put)
            improved = ckpt.update(val_m["accuracy"], checkpoint_payload(state))
            if improved:
                print_fn(f"New best accuracy! Accuracy: {val_m['accuracy']}\nModel saved!")
            print_fn(
                f"Validation Results - Epoch: {epoch} Average Loss: {val_m['loss']:.4f} "
                f"| Accuracy: {val_m['accuracy']:.4f}"
            )
            logger.log(step_i, val_m, prefix="validation")
            history.append({"epoch": epoch, **val_m, **timer.summary()})
            epochs_run = epoch

            # EarlyStopping(patience) on val accuracy (train.py:74-80).
            # ignite counts a TIE as no improvement — only strict improvement
            # (the checkpointer's own criterion) resets the counter.
            if improved:
                epochs_without_improvement = 0
            else:
                epochs_without_improvement += 1

            # rolling full-state checkpoint for mid-training resume
            save_checkpoint(
                last_path,
                {**checkpoint_payload(state), "epoch": epoch,
                 "best_metric": ckpt.best,
                 "epochs_without_improvement": epochs_without_improvement},
                backend=cfg.train.checkpoint_backend,
            )

            if cfg.train.early_stopping and epochs_without_improvement >= cfg.train.patience:
                print_fn(f"EarlyStopping: stop after {epoch} epochs")
                break
    finally:
        if own_logger:
            logger.close()

    return TrainResult(
        state=state,
        best_accuracy=float(ckpt.best or 0.0),
        epochs_run=epochs_run,
        history=history,
    )
