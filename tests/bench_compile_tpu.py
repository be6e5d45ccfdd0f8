"""Compile-time profile of the bench step program (run on TPU host).

Times XLA compilation (AOT .lower().compile(), no execution) of the
bench.py flagship program at bench shapes, split into:
  - fwd+NEE loss (the forward program)
  - value_and_grad step (forward + checkpointed backward)

Usage: python -m tests.bench_compile_tpu [--bounces N] [--tile LOG2]
"""

from __future__ import annotations

import argparse
import dataclasses
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bounces", type=int, default=5)
    ap.add_argument("--tile", type=int, default=21)
    ap.add_argument("--no-cache", action="store_true")
    args = ap.parse_args()

    if not args.no_cache:
        from visionaray_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from visionaray_tpu.kernels.params import KernelParams
    from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
    from visionaray_tpu.scenes import sponza_like_scene
    from visionaray_tpu.sched.render import render_pixels

    WIDTH, HEIGHT = 1920, 1080
    TILE = 1 << args.tile

    t0 = time.perf_counter()
    scene, cam = sponza_like_scene(target_tris=260_000, build_bvh=False)
    scene = dataclasses.replace(scene, bvh=jax.jit(
        build_cluster_bvh, static_argnames=("cluster_size", "treelet_size"))(
            scene.mesh, cluster_size=32, treelet_size=128))
    jax.block_until_ready(scene.bvh)
    print(f"scene+cbvh build: {time.perf_counter() - t0:.1f}s")

    params = KernelParams.create(
        scene, num_bounces=args.bounces, epsilon=1e-3,
        bg_color=(0.2, 0.3, 0.5, 1.0), ambient_color=(1.0, 1.0, 1.0, 1.0))

    n = WIDTH * HEIGHT
    n_tiles = -(-n // TILE)
    npad = n_tiles * TILE
    xt = jnp.zeros((n_tiles, TILE), jnp.int32)
    yt = jnp.zeros((n_tiles, TILE), jnp.int32)

    def loss_fn(verts, cd, frame):
        mesh2 = dataclasses.replace(params.scene.mesh, vertices=verts)
        mats2 = dataclasses.replace(params.scene.materials, cd=cd)
        scene2 = dataclasses.replace(params.scene, mesh=mesh2,
                                     materials=mats2)
        p2 = dataclasses.replace(params, scene=scene2)

        def tile_fn(targs):
            tx, ty = targs
            color, _ = render_pixels(p2, cam, tx, ty, WIDTH, HEIGHT,
                                     "pathtracing", 1, "jittered_blend",
                                     frame, nee=True)
            return jnp.sum(color[..., :3])

        sums = jax.lax.map(tile_fn, (xt, yt))
        return jnp.sum(sums) / (npad * 3)

    verts = scene.mesh.vertices
    cd = scene.materials.cd

    t0 = time.perf_counter()
    fwd_l = jax.jit(loss_fn).lower(verts, cd, jnp.uint32(1))
    t_lower_f = time.perf_counter() - t0
    t0 = time.perf_counter()
    fwd_l.compile()
    t_comp_f = time.perf_counter() - t0
    print(f"fwd+NEE  : trace {t_lower_f:6.1f}s  xla {t_comp_f:6.1f}s")

    t0 = time.perf_counter()
    step_l = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1))).lower(
        verts, cd, jnp.uint32(1))
    t_lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    step_l.compile()
    t_comp_s = time.perf_counter() - t0
    print(f"fwd+bwd  : trace {t_lower_s:6.1f}s  xla {t_comp_s:6.1f}s")


if __name__ == "__main__":
    main()
