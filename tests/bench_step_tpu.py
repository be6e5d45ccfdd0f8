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


# params/cam/tiles ride as jit ARGUMENTS (closed-over device arrays embed
# as MLIR constants and fetch host-side through the slow tunnel during
# lowering — the r4 compile trap, docs/PERF.md)
def loss_fn(verts, cd, frame, p, kam, txt, tyt):
    mesh2 = dataclasses.replace(p.scene.mesh, vertices=verts)
    mats2 = dataclasses.replace(p.scene.materials, cd=cd)
    scene2 = dataclasses.replace(p.scene, mesh=mesh2, materials=mats2)
    p2 = dataclasses.replace(p, scene=scene2)

    def tile_fn(args):
        tx, ty = args
        color, _ = render_pixels(p2, kam, tx, ty, W, H, "pathtracing", 1,
                                 "jittered_blend", frame, nee=NEE)
        return jnp.sum(color[..., :3])

    return jnp.sum(jax.lax.map(tile_fn, (txt, tyt))) / (n * 3)


step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))
v, c = params.scene.mesh.vertices, params.scene.materials.cd
t0 = time.perf_counter()
out = step(v, c, jnp.uint32(1), params, cam, xt, yt)
float(out[0])     # fetch forces completion (block_until_ready can return
                  # before the execution ran on this backend)
print(f"compile+1st: {time.perf_counter() - t0:.1f}s", flush=True)
t0 = time.perf_counter()
for i in range(REPS):
    out = step(v, c, jnp.uint32(2 + i), params, cam, xt, yt)
float(out[0])     # dispatch all reps, fetch only the last
avg = (time.perf_counter() - t0) / REPS
rays = W * H * BOUNCES * (2 if NEE else 1)
print(f"TILE=2^{TILE.bit_length()-1} T={T} B={B} NEE={int(NEE)}: "
      f"{avg:.2f}s/step  {rays/avg/1e6:.3f} Mrays/s", flush=True)
