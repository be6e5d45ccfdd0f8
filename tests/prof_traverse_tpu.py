import os, time, glob
import jax, jax.numpy as jnp, numpy as np
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import visionaray_tpu.ops.pallas.traverse as trav
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.ops.pallas.traverse import cluster_closest_hit
from visionaray_tpu.scenes import sponza_like_scene

trav.TILE_ROWS = 32; trav.INTERLEAVE = 2
scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
mesh = scene.mesh
cbvh = jax.jit(build_cluster_bvh, static_argnames=("cluster_size",))(mesh, cluster_size=32)
jax.block_until_ready(cbvh.nodes)

W,H,B=1920,1080,64
Wp,Hp=-(-W//B)*B,-(-H//B)*B
yy,xx=np.meshgrid(np.arange(Hp),np.arange(Wp),indexing="ij")
order=(yy//B)*(Wp//B)+(xx//B)
flat=np.argsort(order.reshape(-1),kind="stable")
ray=cam.primary_rays(jnp.asarray(xx.reshape(-1)[flat]),jnp.asarray(yy.reshape(-1)[flat]),W,H)
f=jax.jit(lambda r: cluster_closest_hit(r,cbvh,mesh).t)
out=f(ray); out.block_until_ready()
with jax.profiler.trace("/tmp/jaxtrace"):
    for _ in range(2):
        out=f(ray)
    out.block_until_ready()
print("trace files:", glob.glob("/tmp/jaxtrace/**/*", recursive=True)[:10])
