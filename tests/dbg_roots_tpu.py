"""Decisive: does tile_roots actually confine the kernel?"""
import time, jax, jax.numpy as jnp, numpy as np
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import visionaray_tpu.ops.pallas.traverse as trav
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.scenes import sponza_like_scene

scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
mesh = scene.mesh
cbvh = jax.jit(build_cluster_bvh, static_argnames=("cluster_size","treelet_size"))(mesh, cluster_size=32, treelet_size=32)
jax.block_until_ready(cbvh.nodes)
S = cbvh.num_treelets
troots = np.asarray(cbvh.treelet_roots)
tlo = np.asarray(cbvh.treelet_lo); thi = np.asarray(cbvh.treelet_hi)

# rays confined to treelet 37: origins inside its box, random dirs
sid = 37
rng = np.random.default_rng(0)
n = 1 << 20
o = tlo[sid] + rng.uniform(size=(n,3)).astype(np.float32) * (thi[sid]-tlo[sid])
d = rng.normal(size=(n,3)).astype(np.float32)
d /= np.linalg.norm(d,axis=-1,keepdims=True)
chunk = trav.TILE_ROWS*128*trav.INTERLEAVE
npad = -(-n//chunk)*chunk
ng = npad//chunk
rays8 = trav._pack_rays(jnp.asarray(o), jnp.asarray(d), jnp.full((n,),3.4e38,jnp.float32), n, npad, ng, trav.INTERLEAVE, trav.TILE_ROWS, pad_maxt=-1.0)

def run(label, root):
    tr = jnp.full((ng, trav.INTERLEAVE), root, jnp.int32)
    f = jax.jit(lambda r8: trav._cluster_traverse(r8, cbvh.nodes, cbvh.tris, cbvh.num_clusters, cbvh.cluster_size, tile_roots=tr)[0])
    out = f(rays8); out.block_until_ready()
    t0=time.perf_counter()
    for _ in range(3): out = f(rays8)
    out.block_until_ready()
    print(f"{label}: {(time.perf_counter()-t0)/3*1e3:.1f} ms", flush=True)

run("root=treelet", int(troots[sid]))
run("root=0 (global)", 0)
