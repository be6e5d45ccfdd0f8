"""TPU bench: treelet-binned vs global-consensus traversal on incoherent
rays (the round-2 perf wall experiment).

Run on the TPU host:  python -m tests.bench_binned_tpu
Env: K (cluster size), T (treelet size), M (slots/ray), N (log2 rays)
"""

import os
import time

import jax
import jax.numpy as jnp

from visionaray_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import visionaray_tpu.ops.pallas.traverse as trav
from visionaray_tpu.core.types import Ray
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.pallas.traverse import (
    binned_closest_hit, cluster_closest_hit,
)
from visionaray_tpu.scenes import sponza_like_scene

K = int(os.environ.get("K", 32))
T = int(os.environ.get("T", 32))
M = int(os.environ.get("M", 8))
N = 1 << int(os.environ.get("N", 20))
SAH = os.environ.get("SAH", "1") == "1"   # SAH-scored kd split axes
MODE = os.environ.get("MODE", "binned")  # binned | global | both
if "ROWS" in os.environ:       # tile geometry sweep (coherent path)
    trav.TILE_ROWS = int(os.environ["ROWS"])
if "BROWS" in os.environ:      # binned-path tile rows (BINNED_ROWS)
    trav.BINNED_ROWS = int(os.environ["BROWS"])
if "IL" in os.environ:
    trav.INTERLEAVE = int(os.environ["IL"])

scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
mesh = scene.mesh
cbvh = jax.jit(build_cluster_bvh,
               static_argnames=("cluster_size", "treelet_size",
                                "sah_axis"))(
    mesh, cluster_size=K, treelet_size=T, sah_axis=SAH)
jax.block_until_ready(cbvh.nodes)
print(f"K={K} T={T} S={cbvh.num_treelets} C={cbvh.num_clusters} M={M} "
      f"N={N} SAH={SAH}", flush=True)

lo, hi = jnp.asarray(cbvh.nodes[0, 0:3]), jnp.asarray(cbvh.nodes[0, 3:6])
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
o = lo + jax.random.uniform(k1, (N, 3)) * (hi - lo)
d = jax.random.normal(k2, (N, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
ray = Ray(ori=o, dir=d)


def measure(name, fn):
    # cbvh/mesh ride as jit ARGUMENTS: closed-over device arrays would be
    # fetched host-side during lowering (slow axon D2H; see PERF.md r4)
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(ray, cbvh, mesh)
    out.block_until_ready()
    print(f"{name}: compile+run {time.perf_counter() - t0:.1f}s "
          f"hit {float((out < 1e30).mean()):.3f}", flush=True)
    t0 = time.perf_counter()
    for _ in range(3):
        out = f(ray, cbvh, mesh)
    float(out[0])   # fetch forces completion (block can return early
                    # right after an async dispatch on the axon backend)
    dt = (time.perf_counter() - t0) / 3
    print(f"{name}: {dt * 1e3:.1f} ms, {N / dt / 1e6:.2f} Mrays/s",
          flush=True)


if MODE in ("binned", "both"):
    measure("binned", lambda r, b, ms: binned_closest_hit(r, b, ms, m=M).t)
if MODE in ("global", "both"):
    measure("global", lambda r, b, ms: cluster_closest_hit(r, b, ms).t)
