"""Multi-host wiring (single-process degenerate case on the CPU mesh).

A real pod run exercises jax.distributed; here we validate the pieces that
can run in one process: mesh construction over all devices, process-local
data assembly, and the local index-range arithmetic.
"""

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.parallel import multihost
from visionaray_tpu.parallel.tile_sharding import TILE_AXIS


def test_global_mesh_covers_all_devices():
    mesh = multihost.global_mesh()
    assert mesh.devices.size == len(jax.devices()) == 8
    assert mesh.axis_names == (TILE_AXIS,)


def test_make_global_pixel_array_single_process():
    mesh = multihost.global_mesh()
    x = np.arange(64, dtype=np.float32)
    arr = multihost.make_global_pixel_array(x, mesh)
    assert arr.shape == (64,)
    assert np.allclose(np.asarray(arr), x)
    # sharded over the tile axis: 8 shards of 8
    assert len(arr.addressable_shards) == 8
    assert arr.addressable_shards[0].data.shape == (8,)


def test_local_slice_partitions_index_space():
    # single process: the local slice is everything, padded so every
    # DEVICE (not just every process) gets an equal shard — P(TILE_AXIS)
    # partitions over devices (caught by the 2-process smoke test)
    padded = multihost.padded_global_size(100)
    assert padded % jax.device_count() == 0 and 100 <= padded
    s = multihost.local_slice(100)
    assert s == slice(0, padded)


def test_initialize_single_host_is_safe():
    # idempotent no-op in a single-process environment
    assert multihost.initialize() in (False, True)
    assert jax.process_count() == 1
