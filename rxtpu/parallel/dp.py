"""Data-parallel (+ optional tensor-parallel head) execution.

Design: the SAME jitted step functions from ``rxtpu.train.step`` serve both
single-chip and multi-chip runs. Parallelism is expressed purely through
input shardings — the TrainState is placed with ``param_shardings`` (all
replicated; head kernels optionally split over 'model') and each batch is
placed with the batch dim split over 'data'. XLA's SPMD partitioner then
emits the ICI all-reduces for gradients and (global-batch) BatchNorm
statistics automatically.

Note on BN semantics: under this scheme batch statistics are computed over
the GLOBAL batch (cross-replica), unlike the per-replica stats of
``torch.nn.DataParallel``. This is the better-behaved variant (equivalent
to SyncBN); the reference's per-replica behavior is an artifact of
DataParallel, not a design choice (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
from typing import Callable, Iterator

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from rxtpu.parallel.mesh import param_shardings, sharded_prefetch
from rxtpu.train.step import TrainState


def place_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Device-put the TrainState according to the mesh's sharding rules."""
    p_shard = param_shardings(state.params, mesh)
    replicated = NamedSharding(mesh, P())

    def put_rep(tree):
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, replicated), tree)

    params = jax.tree_util.tree_map(jax.device_put, state.params, p_shard)

    # Optimizer buffers that mirror the param tree (the SGD momentum trace)
    # live WITH their params: under TP the head kernels' momentum is sharded
    # identically, so the update step needs no per-step reshard. Leaves are
    # matched by param path suffix (optax state paths end with the param
    # path, e.g. [..., 'trace', 'head', 'dense', 'kernel']).
    shapes = {
        tuple(str(k) for k in path): getattr(v, "shape", None)
        for path, v in jax.tree_util.tree_flatten_with_path(state.params)[0]
    }
    by_path = {
        tuple(str(k) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(p_shard)[0]
    }
    suffix_lens = {len(p) for p in by_path}

    def put_opt(path, x):
        keys = tuple(str(k) for k in path)
        for n in sorted(suffix_lens, reverse=True):
            if len(keys) < n:
                continue
            suffix = keys[-n:]
            s = by_path.get(suffix)
            if s is not None and shapes.get(suffix) == getattr(x, "shape", None):
                return jax.device_put(x, s)
        return jax.device_put(x, replicated)

    opt_state = jax.tree_util.tree_map_with_path(put_opt, state.opt_state)
    return state.replace(
        step=jax.device_put(state.step, replicated),
        params=params,
        batch_stats=put_rep(state.batch_stats),
        opt_state=opt_state,
        freeze_mask=put_rep(state.freeze_mask),
    )


def make_put(mesh: Mesh) -> Callable[[Iterator], Iterator]:
    """The ``put`` argument for rxtpu.train.loop.run_training under a mesh.

    Single-process: batch-dim sharded device_put with double buffering.
    Multi-process (pod): each host feeds only its local Pipeline slice;
    ``multihost_prefetch`` assembles the global array from per-process
    shards (jax.make_array_from_process_local_data), so no host ever
    materializes or ships the full global batch.
    """
    if jax.process_count() > 1:
        from rxtpu.parallel.multihost import multihost_prefetch

        return functools.partial(multihost_prefetch, mesh=mesh)
    return functools.partial(sharded_prefetch, mesh=mesh)
