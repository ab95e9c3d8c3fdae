"""Device mesh construction and sharding rules.

The reference's only device parallelism is single-process
``torch.nn.DataParallel`` (``main.py:94``): replicate the model, scatter the
batch, gather outputs. The TPU-native equivalent is SPMD under ``jit`` over
a ``jax.sharding.Mesh``:

- axis ``"data"``: the batch dimension is sharded; XLA inserts the gradient
  all-reduce over ICI automatically (the pmean the reference never had to
  write, because DataParallel hid a gather instead).
- axis ``"model"`` (optional, >1 only when requested): tensor-parallel
  sharding of the classifier head's large matmuls (6144x1024 and
  1024x1108), the one place this CNN has weight matrices worth splitting.

Batch-size/LR scaling rules carry over from ``main.py:67,71`` via
``rxtpu.config.global_batch_size`` / ``resolve_lr``.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    model_parallel: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Create a ('data', 'model') mesh over the first n devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = list(devices)[:n_devices]
    assert n_devices % model_parallel == 0, (n_devices, model_parallel)
    arr = np.array(devices).reshape(n_devices // model_parallel, model_parallel)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> Dict[str, NamedSharding]:
    """Shardings for the host batch dict: batch dim over 'data'."""
    s = NamedSharding(mesh, P("data"))
    return {
        "images": s,
        "labels": s,
        "mean": s,
        "std": s,
        "valid": s,
    }


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Replicate everything except the head's large Dense kernels (TP).

    With model axis size 1 this degrades to full replication (pure DP).
    The head kernels are sharded on their OUTPUT dim so each model shard
    computes a logits slice; XLA all-gathers at the loss.
    """
    replicated = NamedSharding(mesh, P())
    tp_dense = NamedSharding(mesh, P(None, "model"))

    def rule(path, leaf) -> NamedSharding:
        keys = [str(getattr(p, "key", getattr(p, "name", ""))) for p in path]
        if mesh.shape["model"] > 1 and "head" in keys and keys[-1] == "kernel":
            if leaf.ndim == 2:
                return tp_dense
        return replicated

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(batch: Dict[str, np.ndarray], mesh: Mesh) -> Dict[str, Any]:
    """Device-put a host batch with batch-dim sharding (id_codes pass through)."""
    shardings = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if isinstance(v, np.ndarray) and k in shardings:
            out[k] = jax.device_put(v, shardings[k])
        else:
            out[k] = v
    return out


def shard_batch_window(batches: Sequence[Dict[str, np.ndarray]],
                       mesh: Mesh) -> Dict[str, Any]:
    """Stack K host batches along a leading scan axis and device-put them.

    Output leaves are [K, B, ...] with the BATCH dim sharded over 'data'
    (the scan axis is replicated) — the input shape expected by
    rxtpu.train.step.make_scanned_eval_step / make_scanned_predict_step.
    Non-array metadata (e.g. id_codes) is collected into lists.
    """
    assert batches, "empty batch window"
    shardings = batch_sharding(mesh)
    out: Dict[str, Any] = {}
    for k in batches[0]:
        vs = [b[k] for b in batches]
        if isinstance(vs[0], np.ndarray) and k in shardings:
            spec = shardings[k].spec
            s = NamedSharding(mesh, P(None, *spec))
            out[k] = jax.device_put(np.stack(vs), s)
        else:
            out[k] = vs
    return out


def sharded_prefetch(host_iter, mesh: Mesh):
    """Double-buffered sharded device feed (the DP version of device_prefetch)."""
    from rxtpu.data.pipeline import double_buffer

    return double_buffer(host_iter, lambda b: shard_batch(b, mesh))
