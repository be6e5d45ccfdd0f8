#!/usr/bin/env python
"""Benchmark: Mrays/s/chip fwd+bwd, sponza-class scene, 1080p path tracing.

The BASELINE.json north-star metric.  The reference publishes no numbers
(BASELINE.md); ``vs_baseline`` is therefore measured against this repo's own
scalar-CPU oracle throughput (tests/oracle.py — the stand-in for "Visionaray
CPU reference" on this machine), measured once and pinned below.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "Mrays/s", "vs_baseline": N, ...}

Ray accounting: pixels * spp * num_bounces * 2 rays per frame (the PT
kernel with next-event estimation traces one closest-hit and one shadow
ray per bounce for every live-or-masked lane).  fwd+bwd = the full
value_and_grad step with gradients w.r.t. vertices + albedo.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

# Measured once on this machine: tests/oracle.py (numpy, vectorized over
# pixels) traces ~1.23 Mrays/s on the CPU (whitted, 3-prim scene — an upper
# bound for the oracle: it has no BVH, so 260k tris would be ~5 orders
# slower).  Provenance: `python -m tests.bench_oracle`.
CPU_ORACLE_MRAYS = 1.23

WIDTH, HEIGHT = 1920, 1080
SPP = 1
BOUNCES = 5
NEE = os.environ.get("BENCH_NEE", "1") == "1"
TARGET_TRIS = 260_000
TILE = 1 << 18  # 262144-ray tiles (bounds live memory incl. traversal stacks)
REPS = 3


def main():
    from visionaray_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from visionaray_tpu.kernels.params import KernelParams
    from visionaray_tpu.scenes import sponza_like_scene

    dev = jax.devices()[0]
    scene, cam = sponza_like_scene(target_tris=TARGET_TRIS, build_bvh=False)
    n_tris = scene.num_triangles

    # Pallas fast path: ClusterBVH (SMEM-resident top tree)
    import dataclasses as _dc
    from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
    scene = _dc.replace(scene, bvh=jax.jit(
        build_cluster_bvh, static_argnames=("cluster_size",))(
            scene.mesh, cluster_size=32))

    from visionaray_tpu.sched.render import _pixel_grid, render_pixels

    params = KernelParams.create(
        scene, num_bounces=BOUNCES, epsilon=1e-3,
        bg_color=(0.2, 0.3, 0.5, 1.0), ambient_color=(1.0, 1.0, 1.0, 1.0))

    # pixel-block swizzle: consecutive rays form 64x64 pixel tiles so the
    # traversal kernel's per-tile frustum stays tight
    import numpy as _np
    B = 64
    Wp, Hp = -(-WIDTH // B) * B, -(-HEIGHT // B) * B
    yy, xx = _np.meshgrid(_np.arange(Hp), _np.arange(Wp), indexing="ij")
    inb = (xx < WIDTH) & (yy < HEIGHT)
    order = (yy // B) * (Wp // B) + (xx // B)
    flat = _np.argsort(_np.where(inb, order, 1 << 30).reshape(-1),
                       kind="stable")[: WIDTH * HEIGHT]
    x = jnp.asarray(xx.reshape(-1)[flat], jnp.int32)
    y = jnp.asarray(yy.reshape(-1)[flat], jnp.int32)
    n = x.shape[0]
    n_tiles = -(-n // TILE)
    pad = n_tiles * TILE - n
    xp = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x
    yp = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)]) if pad else y
    xt = xp.reshape(n_tiles, TILE)
    yt = yp.reshape(n_tiles, TILE)

    def loss_fn(verts, cd, frame):
        mesh2 = dataclasses.replace(params.scene.mesh, vertices=verts)
        mats2 = dataclasses.replace(params.scene.materials, cd=cd)
        scene2 = dataclasses.replace(params.scene, mesh=mesh2,
                                     materials=mats2)
        p2 = dataclasses.replace(params, scene=scene2)

        def tile_fn(args):
            tx, ty = args
            color, _ = render_pixels(p2, cam, tx, ty, WIDTH, HEIGHT,
                                     "pathtracing", SPP, "jittered_blend",
                                     frame, nee=NEE)
            return jnp.sum(color[..., :3])

        sums = jax.lax.map(tile_fn, (xt, yt))
        return jnp.sum(sums) / (n * 3)

    step = jax.jit(jax.value_and_grad(loss_fn, argnums=(0, 1)))

    verts = scene.mesh.vertices
    cd = scene.materials.cd

    # warm up / compile
    t0 = time.perf_counter()
    loss, grads = step(verts, cd, jnp.uint32(1))
    loss.block_until_ready()
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(REPS):
        loss, grads = step(verts, cd, jnp.uint32(i + 2))
    jax.block_until_ready((loss, grads))
    sec_per_step = (time.perf_counter() - t0) / REPS

    rays = WIDTH * HEIGHT * SPP * BOUNCES * (2 if NEE else 1)
    mrays = rays / sec_per_step / 1e6
    print(json.dumps({
        "metric": "sponza_like_260k_1080p_pt_fwd_bwd",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / CPU_ORACLE_MRAYS, 2),
        "detail": {
            "device": str(dev),
            "tris": int(n_tris),
            "bounces": BOUNCES,
            "spp": SPP,
            "step_ms": round(sec_per_step * 1e3, 2),
            "compile_s": round(compile_s, 1),
            "loss": float(loss),
            "grad_finite": bool(all(
                jnp.isfinite(g).all() for g in grads)),
            "baseline_source": "tests/oracle.py scalar CPU tracer on this host",
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
