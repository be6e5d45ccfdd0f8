"""Profile one binned traversal call on TPU; attribute time by op."""
import glob, gzip, json, os, time
from collections import defaultdict

import jax, jax.numpy as jnp
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from visionaray_tpu.core.types import Ray
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.pallas.traverse import binned_closest_hit
from visionaray_tpu.scenes import sponza_like_scene

M = int(os.environ.get("M", 8))
T = int(os.environ.get("T", 128))
K = int(os.environ.get("K", 32))
scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
mesh = scene.mesh
cbvh = jax.jit(build_cluster_bvh, static_argnames=("cluster_size","treelet_size"))(mesh, cluster_size=K, treelet_size=T)
jax.block_until_ready(cbvh.nodes)
n = 1 << 20
lo, hi = jnp.asarray(cbvh.nodes[0, 0:3]), jnp.asarray(cbvh.nodes[0, 3:6])
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
o = lo + jax.random.uniform(k1, (n, 3)) * (hi - lo)
d = jax.random.normal(k2, (n, 3)); d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
ray = Ray(ori=o, dir=d)
f = jax.jit(lambda r: binned_closest_hit(r, cbvh, mesh, m=M).t)
out = f(ray); out.block_until_ready()
print("compiled", flush=True)

logdir = "/tmp/binprof"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir):
    out = f(ray); out.block_until_ready()

durs = defaultdict(float)
for path in glob.glob(logdir + "/plugins/profile/*/*.trace.json.gz"):
    with gzip.open(path, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") == "X" and "dur" in ev:
            name = ev.get("name", "?")[:70]
            pid = ev.get("pid", 0)
            durs[(name)] += ev["dur"]
top = sorted(durs.items(), key=lambda kv: -kv[1])[:25]
for name, d in top:
    print(f"{d/1e3:10.1f} ms  {name}")
