"""Multi-host SPMD input feeding.

The reference is strictly single-host (``torch.nn.DataParallel``,
SURVEY.md §2). For multi-host TPU pods the standard JAX recipe is:

- every host builds the SAME global sample order (seeded permutation),
- each host decodes only its contiguous 1/num_hosts slice of every batch,
- ``jax.make_array_from_process_local_data`` assembles the global sharded
  array; gradient all-reduce rides ICI, only input coordination metadata
  ever touches DCN.

Single-host degenerates to the identity, so the same pipeline code serves
both; the host-slicing logic is unit-testable without a pod.
"""

from __future__ import annotations

import os
import sys
from typing import Dict, Iterator, List

import numpy as np


def host_shard_bounds(global_batch: int, num_hosts: int, host_id: int):
    """[start, stop) rows of a global batch owned by ``host_id``.

    Global batch must divide evenly (the pipeline pads batches to a static
    shape, so this always holds in steady state).
    """
    assert global_batch % num_hosts == 0, (global_batch, num_hosts)
    per_host = global_batch // num_hosts
    return host_id * per_host, (host_id + 1) * per_host


def shard_records_for_host(
    order: np.ndarray, global_batch: int, num_hosts: int, host_id: int
) -> List[np.ndarray]:
    """Split a global epoch order into this host's per-batch index slices.

    Every host computes the identical ``order`` (same seed); slicing is
    deterministic, so no cross-host communication is needed to agree on
    who decodes what.
    """
    if len(order) % global_batch:
        # fail loud: silently truncating would drop up to global_batch-1
        # samples (missing predictions on a pod). Pad the order to a
        # batch multiple first (Pipeline pads its last batch this way).
        raise ValueError(
            f"epoch order length {len(order)} is not a multiple of "
            f"global_batch {global_batch}; pad the tail batch first"
        )
    n_batches = len(order) // global_batch
    lo, hi = host_shard_bounds(global_batch, num_hosts, host_id)
    return [
        order[i * global_batch : (i + 1) * global_batch][lo:hi]
        for i in range(n_batches)
    ]


def assemble_global_batch(local_batch: Dict[str, np.ndarray], mesh) -> Dict:
    """Host-local arrays -> global sharded jax.Arrays on the 'data' axis.

    On a single host this is equivalent to ``shard_batch``; on a pod each
    process contributes its slice via make_array_from_process_local_data.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    out = {}
    for k, v in local_batch.items():
        if isinstance(v, np.ndarray):
            out[k] = jax.make_array_from_process_local_data(sharding, v)
        else:
            out[k] = v
    return out


def initialize_distributed(
    coordinator_address: str = None,
    num_processes: int = None,
    process_id: int = None,
) -> int:
    """Initialize JAX multi-process runtime for pod slices.

    Wraps ``jax.distributed.initialize`` (args auto-detected on Cloud TPU
    when omitted). Returns this process's id. Safe no-op if already
    initialized or single-process.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # tolerate only double-init; a swallowed real failure (wrong
        # coordinator address, backend initialized too early) would
        # silently degrade the pod to independent single-process runs
        if "already initialized" not in str(e).lower():
            raise
    except ValueError as e:
        # `is not None` (not truthiness): an explicit process_id=0 is still
        # an explicit cluster arg and its config errors must surface
        if (coordinator_address is not None or num_processes is not None
                or process_id is not None):
            raise  # explicit cluster args that don't parse are an error
        # auto-detect failed with no explicit args. If cluster-manager env
        # hints are present this IS a pod whose detection broke — raise
        # rather than silently degrade every worker to an identical
        # single-process run; otherwise warn and continue single-process.
        cluster_hints = ("SLURM_JOB_ID", "OMPI_COMM_WORLD_SIZE",
                         "TPU_WORKER_HOSTNAMES", "TPU_WORKER_ID",
                         "MEGASCALE_COORDINATOR_ADDRESS")
        found = [h for h in cluster_hints if os.environ.get(h)]
        if found:
            raise RuntimeError(
                "jax.distributed auto-detection failed but cluster "
                f"environment hints are present ({', '.join(found)}); "
                "pass explicit coordinator_address/num_processes/"
                "process_id rather than training each host independently"
            ) from e
        print(f"initialize_distributed: auto-detect found no cluster "
              f"({e}); continuing single-process", file=sys.stderr)
    return jax.process_index()


def multihost_prefetch(host_iter: Iterator[Dict[str, np.ndarray]], mesh):
    """Double-buffered multi-host device feed (drop-in for sharded_prefetch)."""
    from rxtpu.data.pipeline import double_buffer

    return double_buffer(host_iter, lambda b: assemble_global_batch(b, mesh))
