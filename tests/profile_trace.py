"""cProfile of jax trace+lower of the bench step program (no XLA compile).

trace+lower measured 365 s at bench shapes even with all arrays passed as
jit arguments; this pinpoints where.  Run: python -m tests.profile_trace
"""

import cProfile
import dataclasses
import pstats
import time
from functools import partial

import jax
import jax.numpy as jnp

from visionaray_tpu.kernels.params import KernelParams
from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
from visionaray_tpu.scenes import sponza_like_scene
from visionaray_tpu.sched.render import render_pixels

WIDTH, HEIGHT, TILE = 1920, 1080, 1 << 21

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
prof = cProfile.Profile()
prof.enable()
lowered = step.lower(scene.mesh.vertices, scene.materials.cd,
                     jnp.uint32(1), params, xt, yt)
prof.disable()
print(f"trace+lower: {time.perf_counter() - t0:.1f}s")
st = pstats.Stats(prof)
st.sort_stats("cumulative").print_stats(40)
st.sort_stats("tottime").print_stats(25)
