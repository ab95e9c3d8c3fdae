"""Checkpointing: best-metric tracking + full mid-training resume.

The reference saves only ``model.state_dict()`` on each val-accuracy
improvement (``train.py:88-96``) and skips the whole training phase when the
file exists (``main.py:96-97``). This module keeps that capability surface
(best-checkpoint + phase-skip) and extends it to full resume: params,
batch_stats, optimizer state, step counter and best metric are all captured,
via orbax when available with a flax-serialization fallback.

Multi-process contract: on a pod, ``checkpoint_dir`` must live on storage
shared by all hosts (GCS/NFS — the same contract orbax itself has). Saves
are collective: every process calls in; sharded leaves are gathered
(collective), and for the pickle backend only process 0 writes the file.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import Any, Dict, Optional

import jax
import numpy as np


@functools.lru_cache(maxsize=8)
def _replicator(mesh):
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.jit(lambda a: a, out_shardings=NamedSharding(mesh, P()))


def replicate_to_host(x) -> np.ndarray:
    """Materialize one (possibly globally-sharded) array on this host.

    Collective when the value spans non-addressable devices — every
    process must call in with the same value. Shared by checkpointing and
    the multi-host prediction path (rxtpu.infer.tta).
    """
    if (isinstance(x, jax.Array) and not x.is_fully_addressable
            and not x.is_fully_replicated):
        # model-parallel shard (e.g. TP head kernels): replicate first
        x = _replicator(x.sharding.mesh)(x)
        return np.asarray(x.addressable_shards[0].data)
    return np.asarray(x)


def _to_host(tree: Any, materialize: bool = True) -> Any:
    """Gather a pytree for saving (collective — all processes call in).

    ``materialize=False`` still runs the collective gathers for sharded
    leaves (required for correctness) but skips the device->host readback
    of already-replicated leaves — non-writer processes discard the
    payload anyway.
    """

    def get(x):
        sharded = (isinstance(x, jax.Array) and not x.is_fully_addressable
                   and not x.is_fully_replicated)
        if sharded or materialize:
            return replicate_to_host(x)
        return x

    return jax.tree_util.tree_map(get, tree)


def _sync_processes(tag: str) -> None:
    """Barrier: no process returns from a save before the file/promote is
    visible — a host checking checkpoint_exists right after a collective
    save must not observe the pre-write or mid-promote state."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(tag)


def save_checkpoint(path: str, payload: Dict[str, Any], backend: str = "pickle") -> None:
    """Checkpoint the pytree: atomic single-file pickle (default) or orbax.

    Collective on pods (see module docstring): all processes must call;
    the pickle file is written by process 0 only, and every process
    returns only after the write landed.
    """
    if backend == "orbax":
        save_checkpoint_orbax(path, payload)
        return
    primary = jax.process_index() == 0
    payload = _to_host(payload, materialize=primary)
    if primary:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        os.replace(tmp, path)
    _sync_processes("rxtpu:ckpt_pickle_written")


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


def assert_consistent_checkpoint_view(*paths: str) -> None:
    """Pod contract check: every host must see the same checkpoint files.

    The phase-skip and resume gates branch on checkpoint_exists; if hosts
    disagree (checkpoint_dir on per-host local disks), they take different
    code paths and the pod hangs on mismatched collectives or silently
    diverges. Fail loudly with guidance instead.
    """
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    local = np.asarray([int(checkpoint_exists(p)) for p in paths], np.int32)
    view = np.asarray(multihost_utils.process_allgather(local))
    if not (view == view[0]).all():
        raise RuntimeError(
            "checkpoint visibility differs across hosts "
            f"(per-path exists flags by process: {view.tolist()}): "
            "checkpoint_dir must live on storage shared by all processes "
            "(GCS/NFS) for pod runs — per-host local disks are unsupported"
        )


# ---------------------------------------------------------------------------
# Orbax backend — sharding-aware, async-capable checkpointing for pod-scale
# runs (directory-based; the pickle backend remains the single-file default).
# ---------------------------------------------------------------------------

def save_checkpoint_orbax(path: str, payload: Dict[str, Any]) -> None:
    """Atomic directory swap (same discipline as the pickle tmp+rename):
    save to ``path.tmp``, demote any existing checkpoint to ``path.old``,
    promote tmp. A crash at any point leaves at least one complete
    checkpoint on disk (``path`` or ``path.old``), which the loader finds.

    Collective: orbax's save opens with a global-process barrier, so EVERY
    process must call in (gating this behind process 0 would deadlock the
    pod at the first checkpoint); the directory bookkeeping around the
    save runs on process 0 only.
    """
    import shutil

    import orbax.checkpoint as ocp

    primary = jax.process_index() == 0
    path = os.path.abspath(path)
    tmp, old = path + ".tmp", path + ".old"
    if primary and os.path.exists(tmp):
        shutil.rmtree(tmp)
    # orbax's own save_start barrier orders the clean above before any
    # process begins writing into tmp. The payload is host-materialized
    # first — saving device jax.Arrays natively would bind the checkpoint
    # to the saving topology (orbax then refuses to restore without
    # matching devices/target shardings), breaking restore-anywhere:
    # pod-train -> single-host test, or resume on a different slice.
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(tmp, _to_host(payload))
    if primary:
        if os.path.exists(old):
            shutil.rmtree(old)
        if os.path.exists(path):
            os.replace(path, old)
        os.replace(tmp, path)
        if os.path.exists(old):
            shutil.rmtree(old)
    _sync_processes("rxtpu:ckpt_orbax_promoted")


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
