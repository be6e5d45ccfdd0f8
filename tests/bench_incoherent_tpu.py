import os, time, jax, jax.numpy as jnp
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import visionaray_tpu.ops.pallas.traverse as trav
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.pallas.traverse import cluster_closest_hit
from visionaray_tpu.scenes import sponza_like_scene
from visionaray_tpu.core.types import Ray

trav.TILE_ROWS = int(os.environ.get("ROWS", 32))
trav.INTERLEAVE = int(os.environ.get("G", 2))
K = int(os.environ.get("K", 32))

scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
mesh = scene.mesh
cbvh = jax.jit(build_cluster_bvh, static_argnames=("cluster_size",))(mesh, cluster_size=K)
jax.block_until_ready(cbvh.nodes)

n = 1 << 20
lo, hi = jnp.asarray(cbvh.nodes[0, 0:3]), jnp.asarray(cbvh.nodes[0, 3:6])
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
o = lo + jax.random.uniform(k1, (n, 3)) * (hi - lo)
d = jax.random.normal(k2, (n, 3))
d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
ray = Ray(ori=o, dir=d)
f = jax.jit(lambda r: cluster_closest_hit(r, cbvh, mesh).t)
t0 = time.perf_counter(); out = f(ray); out.block_until_ready()
print(f"rows={trav.TILE_ROWS} G={trav.INTERLEAVE} K={K} compile+run {time.perf_counter()-t0:.1f}s hit {float((out<1e30).mean()):.3f}")
t0 = time.perf_counter()
for _ in range(3): out = f(ray)
out.block_until_ready()
dt = (time.perf_counter()-t0)/3
print(f"incoherent closest: {dt*1e3:.1f} ms, {n/dt/1e6:.2f} Mrays/s")
