"""Checkpointing: best-metric tracking + full mid-training resume.

The reference saves only ``model.state_dict()`` on each val-accuracy
improvement (``train.py:88-96``) and skips the whole training phase when the
file exists (``main.py:96-97``). This module keeps that capability surface
(best-checkpoint + phase-skip) and extends it to full resume: params,
batch_stats, optimizer state, step counter and best metric are all captured,
via orbax when available with a flax-serialization fallback.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


def _to_host(tree: Any) -> Any:
    """Materialize a pytree on this host.

    On a pod, device arrays span non-addressable devices; gather each one
    to replicated (a collective — every process must call this) and read
    the local copy.
    """

    def get(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            # model-parallel shard (e.g. TP head kernels): replicate first
            from jax.sharding import NamedSharding, PartitionSpec as P

            x = jax.jit(
                lambda a: a,
                out_shardings=NamedSharding(x.sharding.mesh, P()),
            )(x)
            return np.asarray(x.addressable_shards[0].data)
        return np.asarray(x)

    return jax.tree_util.tree_map(get, tree)


def save_checkpoint(path: str, payload: Dict[str, Any], backend: str = "pickle") -> None:
    """Checkpoint the pytree: atomic single-file pickle (default) or orbax.

    Multi-process safe: the host gather is collective (all processes call
    in), then only process 0 writes — hosts on a shared filesystem must
    not race the same file.
    """
    payload = _to_host(payload)
    if jax.process_index() != 0:
        return
    if backend == "orbax":
        save_checkpoint_orbax(path, payload)
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(payload, f, protocol=4)
    os.replace(tmp, path)


def load_checkpoint(path: str, backend: str = "auto") -> Dict[str, Any]:
    """Load a checkpoint; 'auto' detects orbax directories vs pickle files.

    A crash between save_checkpoint_orbax's two os.replace calls leaves
    only ``path.old`` on disk; the public loader must find it too, not
    just load_checkpoint_orbax.
    """
    if backend == "orbax" or (backend == "auto" and (
            os.path.isdir(path)
            or (not os.path.exists(path) and os.path.isdir(path + ".old")))):
        # a stale .old directory must not shadow a newer pickle at `path`
        return load_checkpoint_orbax(path)
    with open(path, "rb") as f:
        return pickle.load(f)


def checkpoint_exists(path: str) -> bool:
    """Phase-skip / resume predicate (main.py:96-97).

    True also for an orbax ``path.old`` left by a crash mid-promote, so
    run_training resumes from the demoted copy instead of restarting.
    """
    return os.path.exists(path) or os.path.isdir(path + ".old")


# ---------------------------------------------------------------------------
# Orbax backend — sharding-aware, async-capable checkpointing for pod-scale
# runs (directory-based; the pickle backend remains the single-file default).
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, payload: Dict[str, Any]) -> None:
    """Atomic directory swap (same discipline as the pickle tmp+rename):
    save to ``path.tmp``, demote any existing checkpoint to ``path.old``,
    promote tmp. A crash at any point leaves at least one complete
    checkpoint on disk (``path`` or ``path.old``), which the loader finds."""
    import shutil

    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, _to_host(payload))
    if os.path.exists(old):
        shutil.rmtree(old)
    if os.path.exists(path):
        os.replace(path, old)
    os.replace(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not os.path.exists(path) and os.path.exists(path + ".old"):
        path = path + ".old"  # crash mid-swap: the demoted copy is complete
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path)


class BestCheckpointer:
    """Save-on-improvement tracker (train.py:88-96 semantics).

    ``update(metric, payload)`` saves when ``metric`` beats the best seen
    (first call always saves, matching the epoch-0 behavior of train.py:88).
    """

    def __init__(self, path: str, backend: str = "pickle"):
        self.path = path
        self.backend = backend
        self.best: Optional[float] = None

    def update(self, metric: float, payload: Dict[str, Any]) -> bool:
        if self.best is None or metric > self.best:
            self.best = float(metric)
            payload = dict(payload)
            payload["best_metric"] = self.best
            save_checkpoint(self.path, payload, backend=self.backend)
            return True
        return False
