"""Multi-host SPMD launch (SURVEY.md §2.3 "Multi-host" row, M7).

The reference is single-process (no MPI/NCCL anywhere in its tree); the
TPU-native story is jax.distributed: every host runs THE SAME program,
`jax.distributed.initialize()` wires the hosts into one JAX runtime, and
the existing `shard_map` programs (tile_sharding.py, ring.py) scale from
"all chips on one host" to "all chips on the pod slice" without changing a
line — `jax.devices()` simply returns the global device list, collectives
ride ICI within a slice and DCN across slices, and XLA overlaps the psum
gradient reduction with the backward sweep.

What IS multi-host specific:
  - initialization (this module): coordinator discovery + process ids;
  - host-local IO: each process feeds only its addressable shard of the
    pixel array (make_global_pixel_array) and reads back only local
    shards (the driver validates the single-process path; this module is
    exercised on a real pod via the same entry points).

Determinism: the counter-based RNG is keyed by absolute pixel id, so the
image is bit-identical for any (hosts x chips) decomposition — the
multi-host analogue of the reference's scheduler-independent output.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visionaray_tpu.parallel.tile_sharding import TILE_AXIS


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the multi-host runtime (idempotent).

    With no arguments, relies on the TPU environment's auto-discovery
    (GCE metadata / megascale env vars), falling back to the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    Returns True if running multi-process after the call.
    """
    # do NOT probe jax.process_count() before distributed.initialize():
    # it initializes the XLA backend, after which initialize() raises.
    # The distributed client handle is the side-effect-free signal.
    from jax._src import distributed as _dist
    if getattr(_dist.global_state, "client", None) is not None:
        return jax.process_count() > 1
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr is None and num_processes is None:
        # single-host run or TPU auto-discovery environment
        try:
            jax.distributed.initialize()
        except Exception:
            return jax.process_count() > 1
        return jax.process_count() > 1
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if process_id is None:  # NOT `or`: process_id=0 is a valid explicit arg
        process_id = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def global_mesh() -> Mesh:
    """1-D mesh over ALL chips of every host (ICI-major device order)."""
    return Mesh(np.asarray(jax.devices()), (TILE_AXIS,))


def make_global_pixel_array(x_local, mesh: Mesh):
    """Assemble a process-spanning sharded array from host-local shards.

    ``x_local``: this process's slice of the flat pixel array, shape
    (n_global // process_count, ...).  Each host passes only the data its
    chips will render; jax.make_array_from_process_local_data glues the
    shards into one global jax.Array without any cross-host copy.
    """
    sharding = NamedSharding(mesh, P(TILE_AXIS))
    return jax.make_array_from_process_local_data(sharding, x_local)


def padded_global_size(n_global: int) -> int:
    """n_global rounded up so every DEVICE holds an equal-shaped shard.

    P(TILE_AXIS) partitions axis 0 over all devices, so the global size
    must divide by the device count (which also makes the process-local
    shards equal — device counts are uniform across processes).  Callers
    pad the pixel/ray arrays to this size (mirroring the tile padding in
    tile_sharding.py) and slice the results back to n_global.  (First
    exercised multi-process by tests/test_multiprocess_distributed.py,
    which caught the original process-count-only padding.)
    """
    nd = jax.device_count()
    return -(-n_global // nd) * nd


def local_slice(n_global: int) -> slice:
    """This process's contiguous range of the PADDED flat index space.

    Always length padded_global_size(n)//process_count — the tail process's
    range may extend past n_global; those indices are padding the caller
    must mask (clamped pixel ids render harmlessly and are dropped on
    unpad).
    """
    pc = jax.process_count()
    pid = jax.process_index()
    per = padded_global_size(n_global) // pc
    return slice(pid * per, (pid + 1) * per)
