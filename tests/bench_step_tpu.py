"""Time one full bench-config fwd+bwd step (treelet BVH, NEE) end to end.

Run on the TPU host: python -m tests.bench_step_tpu
Env: NEE=0/1, TILE (log2 rays per lax.map tile), T (treelet size),
M (slots), B (pixel block), REPS.
Prints seconds/step and Mrays/s under the bench.py accounting.
"""
import dataclasses
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from visionaray_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.scenes import sponza_like_scene
from visionaray_tpu.sched.render import render_pixels

W, H, BOUNCES = 1920, 1080, 5
NEE = os.environ.get("NEE", "1") == "1"
TILE = 1 << int(os.environ.get("TILE", 18))
T = int(os.environ.get("T", 128))
B = int(os.environ.get("B", 64))
REPS = int(os.environ.get("REPS", 3))

scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
scene = dataclasses.replace(scene, bvh=jax.jit(
    build_cluster_bvh, static_argnames=("cluster_size", "treelet_size"))(
        scene.mesh, cluster_size=32, treelet_size=T))
params = KernelParams.create(scene, num_bounces=BOUNCES, epsilon=1e-3,
                             bg_color=(0.2, 0.3, 0.5, 1.0),
                             ambient_color=(1.0, 1.0, 1.0, 1.0))
Wp, Hp = -(-W // B) * B, -(-H // B) * B
yy, xx = np.meshgrid(np.arange(Hp), np.arange(Wp), indexing="ij")
inb = (xx < W) & (yy < H)
order = (yy // B) * (Wp // B) + (xx // B)
flat = np.argsort(np.where(inb, order, 1 << 30).reshape(-1),
                  kind="stable")[: W * H]
x = jnp.asarray(xx.reshape(-1)[flat], jnp.int32)
y = jnp.asarray(yy.reshape(-1)[flat], jnp.int32)
n = x.shape[0]
n_t = -(-n // TILE)
pad = n_t * TILE - n
xt = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]).reshape(n_t, TILE)
yt = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)]).reshape(n_t, TILE)


def loss_fn(verts, cd, frame):
    mesh2 = dataclasses.replace(params.scene.mesh, vertices=verts)
    mats2 = dataclasses.replace(params.scene.materials, cd=cd)
    scene2 = dataclasses.replace(params.scene, mesh=mesh2, materials=mats2)
    p2 = dataclasses.replace(params, scene=scene2)

    def tile_fn(args):
        tx, ty = args
        color, _ = render_pixels(p2, cam, tx, ty, W, H, "pathtracing", 1,
                                 "jittered_blend", frame, nee=NEE)
        return jnp.sum(color[..., :3])

    return jnp.sum(jax.lax.map(tile_fn, (xt, yt))) / (n * 3)


step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
v, c = params.scene.mesh.vertices, params.scene.materials.cd
t0 = time.perf_counter()
out = step(v, c, jnp.uint32(1))
jax.block_until_ready(out)
print(f"compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
best = float("inf")
for i in range(REPS):
    t0 = time.perf_counter()
    out = step(v, c, jnp.uint32(2 + i))
    jax.block_until_ready(out)
    best = min(best, time.perf_counter() - t0)
rays = W * H * BOUNCES * (2 if NEE else 1)
print(f"TILE=2^{TILE.bit_length()-1} T={T} B={B} NEE={int(NEE)}: "
      f"{best:.2f}s/step  {rays/best/1e6:.3f} Mrays/s", flush=True)
