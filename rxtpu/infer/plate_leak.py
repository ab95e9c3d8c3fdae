"""Plate-leak constrained label assignment.

The competition leak: each sirna appears on exactly one of 4 plate groups
per experiment. The reference exploits it by masking impossible classes and
greedily assigning the globally most-confident (sample, class) pairs one at
a time (``cell_classifier/test.py:34-56``, groups built at
``main.py:157-167`` — see ``rxtpu.data.records.build_plate_groups``).

This module provides:
- ``apply_plate_mask`` / ``rescale``: exact semantics of test.py:34-46.
- ``greedy_assign``: exact host reimplementation of the reference loop
  (prediction-parity: same tie-breaking via argmax-first-index).
- ``greedy_assign_jax``: the same algorithm as one jit-compiled
  ``fori_loop`` on device — O(N) iterations over an [N, C] matrix with no
  host round trips (the reference's numpy loop is O(N^2 * C) on CPU).
- ``hungarian_assign``: optimal one-to-one assignment (upgraded variant,
  BASELINE config 5).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NB_CLASSES = 1108


def rescale(preds: np.ndarray) -> np.ndarray:
    """Row-normalize with zero-sum guard (test.py:34-39)."""
    s = preds.sum(axis=1)
    s[s == 0] = 1.0
    return preds / s[:, None]


def apply_plate_mask(
    preds: np.ndarray,
    plates: np.ndarray,
    plate_groups: np.ndarray,
    experiment_type: int,
) -> np.ndarray:
    """Zero out classes whose plate-group plate != the sample's plate.

    Parity with test.py:41-46: ``plate_groups[:, experiment_type]`` gives
    each sirna's plate under this experiment's layout permutation.
    """
    preds = preds.copy()
    class_plates = plate_groups[:, experiment_type]          # [C]
    mask = class_plates[None, :] != plates[:, None]           # [N, C]
    preds[mask] = 0.0
    return rescale(preds)


def greedy_assign(preds: np.ndarray) -> np.ndarray:
    """Reference greedy one-to-one assignment (test.py:48-56), exact.

    Repeatedly take the globally most confident (row, class), assign it,
    zero that row and column, renormalize. N iterations for N rows. Input
    rows are normalized first (in the reference pipeline ``rescale`` always
    runs right before this loop, test.py:46).
    """
    preds = rescale(preds.copy())
    results = np.zeros(preds.shape[0])
    for _ in range(preds.shape[0]):
        best_class_per_sample = np.argmax(preds, axis=1)
        winner = np.argmax(
            preds[np.arange(len(preds)), best_class_per_sample])
        winner_class = best_class_per_sample[winner]
        results[winner] = winner_class
        preds[:, winner_class] = 0.0
        preds[winner, :] = 0.0
        preds = rescale(preds)
    return results


@jax.jit
def greedy_assign_jax(preds: jnp.ndarray) -> jnp.ndarray:
    """Device version of ``greedy_assign``: one fori_loop, no host syncs.

    Tie-breaking matches numpy argmax (first index wins) because jnp.argmax
    has the same semantics. The reference rescales at the END of each
    iteration; here each iteration renormalizes at its START, which is
    equivalent (rescale is idempotent on normalized rows) and keeps the
    loop body a single fused select/argmax chain.
    """
    n, c = preds.shape

    def body(_, carry):
        p, results = carry
        s = p.sum(axis=1)
        p = p / jnp.where(s == 0, 1.0, s)[:, None]           # rescale guard
        row_best = jnp.argmax(p, axis=1)                     # [N]
        row_vals = jnp.take_along_axis(p, row_best[:, None], axis=1)[:, 0]
        r = jnp.argmax(row_vals)
        col = row_best[r]
        results = results.at[r].set(col.astype(results.dtype))
        p = p.at[:, col].set(0.0)
        p = p.at[r, :].set(0.0)
        return p, results

    _, results = jax.lax.fori_loop(
        0, n, body, (preds.astype(jnp.float32), jnp.zeros((n,), jnp.float32))
    )
    return results


def hungarian_assign(preds: np.ndarray) -> np.ndarray:
    """Optimal assignment maximizing total log-probability (config 5).

    Each row must get a distinct class; with C >= N the optimum exists.
    Uses -log(p) cost (clipped) so zero-probability (masked) classes are
    effectively forbidden.
    """
    from scipy.optimize import linear_sum_assignment

    cost = -np.log(np.clip(preds, 1e-30, None))
    rows, cols = linear_sum_assignment(cost)
    results = np.zeros(preds.shape[0])
    results[rows] = cols
    return results


def constrained_predict(
    probs: np.ndarray,
    plates: np.ndarray,
    plate_groups: np.ndarray,
    experiment_type: int,
    method: str = "greedy",
) -> np.ndarray:
    """Full per-experiment postprocess: mask -> assign (test.py:41-56)."""
    masked = apply_plate_mask(probs, plates, plate_groups, experiment_type)
    if method == "greedy":
        return greedy_assign(masked)
    if method == "greedy_jax":
        return np.asarray(greedy_assign_jax(jnp.asarray(masked)))
    if method == "hungarian":
        return hungarian_assign(masked)
    if method == "argmax":  # no one-to-one constraint
        return masked.argmax(axis=1).astype(np.float64)
    raise ValueError(f"unknown assignment method {method!r}")
