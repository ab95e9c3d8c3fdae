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
    # optimizer state mirrors param structure per transform; momentum buffers
    # should live with their params
    def put_opt(x):
        return jax.device_put(x, replicated)

    opt_state = jax.tree_util.tree_map(put_opt, state.opt_state)
    return state.replace(
        step=jax.device_put(state.step, replicated),
        params=params,
        batch_stats=put_rep(state.batch_stats),
        opt_state=opt_state,
        freeze_mask=put_rep(state.freeze_mask),
    )


def make_put(mesh: Mesh) -> Callable[[Iterator], Iterator]:
    """The ``put`` argument for rxtpu.train.loop.run_training under a mesh."""
    return functools.partial(sharded_prefetch, mesh=mesh)
