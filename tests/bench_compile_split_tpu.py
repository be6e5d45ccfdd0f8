"""AOT-split cold-compile probe of the bench step program.

Times trace+lower, .compile(), and first-exec+fetch SEPARATELY (wipe
.jax_cache first for a cold number).  On the axon remote backend the
server-side XLA/Mosaic compile is deferred into the first execution, so
".compile()" returns in ~1 s and the real compile cost lands in the
first-exec line — which is also what bench.py's compile_s measures.

Run: python -m tests.bench_compile_split_tpu
"""
import dataclasses, time
from functools import partial
import jax, jax.numpy as jnp
from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.scenes import sponza_like_scene
from visionaray_tpu.sched.render import render_pixels

W, H, TILE = 1920, 1080, 1 << 21
scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
scene = dataclasses.replace(scene, bvh=jax.jit(
    build_cluster_bvh, static_argnames=("cluster_size", "treelet_size"))(
        scene.mesh, cluster_size=32, treelet_size=128))
jax.block_until_ready(scene.bvh)
params = KernelParams.create(scene, num_bounces=5, epsilon=1e-3,
    bg_color=(0.2, 0.3, 0.5, 1.0), ambient_color=(1.0, 1.0, 1.0, 1.0))
n = W * H
npad = -(-n // TILE) * TILE
xt = jnp.zeros((npad // TILE, TILE), jnp.int32)
yt = jnp.zeros((npad // TILE, TILE), jnp.int32)

def loss_fn(verts, cd, frame, p, kam, txt, tyt, nee):
    mesh2 = dataclasses.replace(p.scene.mesh, vertices=verts)
    mats2 = dataclasses.replace(p.scene.materials, cd=cd)
    scene2 = dataclasses.replace(p.scene, mesh=mesh2, materials=mats2)
    p2 = dataclasses.replace(p, scene=scene2)
    def tile_fn(args):
        tx, ty = args
        color, _ = render_pixels(p2, kam, tx, ty, W, H, "pathtracing", 1,
                                 "jittered_blend", frame, nee=nee)
        return jnp.sum(color[..., :3])
    return jnp.sum(jax.lax.map(tile_fn, (txt, tyt))) / (n * 3)

step = jax.jit(jax.value_and_grad(partial(loss_fn, nee=True), argnums=(0, 1)))
t0 = time.perf_counter()
lowered = step.lower(scene.mesh.vertices, scene.materials.cd, jnp.uint32(1),
                     params, cam, xt, yt)
t1 = time.perf_counter()
print(f"trace+lower: {t1 - t0:.1f}s", flush=True)
compiled = lowered.compile()
t2 = time.perf_counter()
print(f"xla+mosaic compile: {t2 - t1:.1f}s", flush=True)
out = compiled(scene.mesh.vertices, scene.materials.cd, jnp.uint32(1),
               params, cam, xt, yt)
float(out[0])
t3 = time.perf_counter()
print(f"first exec+fetch: {t3 - t2:.1f}s  total {t3 - t0:.1f}s", flush=True)
