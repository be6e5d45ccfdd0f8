"""Identify which device arrays get fetched as MLIR constants at lowering."""
import dataclasses, time, traceback
from functools import partial

from visionaray_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()
import jax, jax.numpy as jnp
import jax._src.array as _arr

orig = _arr.ArrayImpl._value.fget
def noisy(self):
    t0 = time.time()
    v = orig(self)
    lines = [l for l in traceback.format_stack(limit=25)
             if "/root/repo/" in l or "mlir" in l]
    print(f"FETCH shape={self.shape} dtype={self.dtype} "
          f"{time.time()-t0:.2f}s", flush=True)
    for l in lines[-3:]:
        print("   ", l.strip().splitlines()[0], flush=True)
    return v
_arr.ArrayImpl._value = property(noisy)

from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.scenes import sponza_like_scene
from visionaray_tpu.sched.render import render_pixels

WIDTH, HEIGHT, TILE = 1920, 1080, 1 << 18
scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
scene = dataclasses.replace(scene, bvh=jax.jit(
    build_cluster_bvh, static_argnames=("cluster_size", "treelet_size"))(
        scene.mesh, cluster_size=32, treelet_size=128))
jax.block_until_ready(scene.bvh)
params = KernelParams.create(
    scene, num_bounces=5, epsilon=1e-3,
    bg_color=(0.2, 0.3, 0.5, 1.0), ambient_color=(1.0, 1.0, 1.0, 1.0))
n = WIDTH * HEIGHT
npad = -(-n // TILE) * TILE
xt = jnp.zeros((npad // TILE, TILE), jnp.int32)
yt = jnp.zeros((npad // TILE, TILE), jnp.int32)

def loss_fn(verts, cd, frame, p, txt, tyt, nee):
    mesh2 = dataclasses.replace(p.scene.mesh, vertices=verts)
    mats2 = dataclasses.replace(p.scene.materials, cd=cd)
    scene2 = dataclasses.replace(p.scene, mesh=mesh2, materials=mats2)
    p2 = dataclasses.replace(p, scene=scene2)
    def tile_fn(args):
        tx, ty = args
        color, _ = render_pixels(p2, cam, tx, ty, WIDTH, HEIGHT,
                                 "pathtracing", 1, "jittered_blend",
                                 frame, nee=nee)
        return jnp.sum(color[..., :3])
    return jnp.sum(jax.lax.map(tile_fn, (txt, tyt))) / (n * 3)

step = jax.jit(jax.value_and_grad(partial(loss_fn, nee=True),
                                  argnums=(0, 1)))
t0 = time.perf_counter()
step.lower(scene.mesh.vertices, scene.materials.cd, jnp.uint32(1),
           params, xt, yt)
print(f"trace+lower: {time.perf_counter()-t0:.1f}s")
