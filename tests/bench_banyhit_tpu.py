import os, time, jax, jax.numpy as jnp
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.pallas.traverse import binned_any_hit
from visionaray_tpu.scenes import sponza_like_scene
from visionaray_tpu.core.types import Ray

M = int(os.environ.get("M", 8))
import visionaray_tpu.ops.pallas.traverse as trav
if "BROWS" in os.environ: trav.BINNED_ROWS = int(os.environ["BROWS"])
scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
mesh = scene.mesh
cbvh = jax.jit(build_cluster_bvh, static_argnames=("cluster_size","treelet_size"))(mesh, cluster_size=32, treelet_size=128)
jax.block_until_ready(cbvh.nodes)
n = 1 << 20
key = jax.random.PRNGKey(0)
lo, hi = jnp.asarray(cbvh.nodes[0, 0:3]), jnp.asarray(cbvh.nodes[0, 3:6])
o = lo + jax.random.uniform(key, (n, 3)) * (hi - lo)
L = jnp.asarray([12.0, 9.0, 6.0])
to = L - o
dist = jnp.linalg.norm(to, axis=-1)
d = to / dist[:, None]
ray = Ray(ori=o, dir=d)
# cbvh/mesh as jit ARGS (closure constants fetch host-side at lowering)
f = jax.jit(lambda r, mt, b, ms: binned_any_hit(r, b, ms, mt, m=M).hit)
t0 = time.perf_counter()
hit = f(ray, dist - 1e-3, cbvh, mesh); float(hit.mean())
print(f"M={M} compile+run {time.perf_counter()-t0:.1f}s, occl frac {float(hit.mean()):.3f}")
t0 = time.perf_counter()
for _ in range(5): hit = f(ray, dist - 1e-3, cbvh, mesh)
float(hit[0])   # fetch forces completion (block can return early)
dt = (time.perf_counter()-t0)/5
print(f"binned any_hit M={M}: {dt*1e3:.1f} ms, {n/dt/1e6:.2f} Mrays/s")
