"""Scaling-efficiency harness (BASELINE north-star: >=80% linear 1->4 hosts).

One command prints the config-#4 (tile-sharded render, strong scaling) and
config-#5 (geometry-sharded closest hit, weak scaling) tables over device
meshes of 1..D devices, with efficiency percentages from
utils.metrics.scaling_efficiency.

On a CPU host it runs on the virtual 8-device mesh (logic validation; the
absolute numbers are meaningless there but the efficiency column flags
sharding-induced overheads).  On a pod slice the same command measures real
chips: `python -m scripts.scaling_sweep --devices 1 2 4 8`.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--width", type=int, default=256)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--bounces", type=int, default=3)
    p.add_argument("--tris-per-shard", type=int, default=8192,
                   help="weak-scaling geometry per shard")
    p.add_argument("--cpu", action="store_true",
                   help="force the virtual CPU mesh")
    p.add_argument("--json", action="store_true")
    args = p.parse_args(argv)

    import os
    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count="
                f"{max(args.devices)}").strip()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from visionaray_tpu.core.scene import TriangleMesh
    from visionaray_tpu.core.types import Ray
    from visionaray_tpu.kernels.params import KernelParams
    from visionaray_tpu.parallel.ring import (
        geometry_sharded_closest_hit, shard_geometry,
    )
    from visionaray_tpu.parallel.tile_sharding import (
        make_mesh, render_image_sharded,
    )
    from visionaray_tpu.scenes import random_triangles, teapot_mesh
    from visionaray_tpu.utils.metrics import scaling_efficiency

    avail = len(jax.devices())
    devs = [d for d in args.devices if d <= avail]

    # ---- config #4 analogue: tile-sharded render, strong scaling
    verts, faces = teapot_mesh(detail=16)
    tm = TriangleMesh.create(verts, faces)
    from visionaray_tpu.core.scene import Scene
    from visionaray_tpu.ops.lbvh import build_lbvh
    from visionaray_tpu.shading.lights import PointLights
    import dataclasses
    scene = Scene.create(
        mesh=tm, lights=PointLights.create(position=[[3.0, 8.0, 8.0]]))
    scene = dataclasses.replace(scene, bvh=build_lbvh(tm))
    params = KernelParams.create(scene, num_bounces=args.bounces,
                                 bg_color=(0, 0, 0, 1),
                                 ambient_color=(1, 1, 1, 1))
    from visionaray_tpu.core.camera import Pinhole
    lo = verts.min(0)
    hi = verts.max(0)
    c = 0.5 * (lo + hi)
    cam = Pinhole.create(eye=tuple(c + np.float32([0, 1, 7])),
                         center=tuple(c),
                         fovy=np.deg2rad(45),
                         aspect=args.width / args.height)

    strong = {}
    for d in devs:
        mesh = make_mesh(d)
        color, _ = render_image_sharded(
            params, cam, args.width, args.height, mesh,
            algo="pathtracing", spp=1, pixel_sampler="jittered_blend",
            frame_num=1)
        jax.block_until_ready(color)
        t0 = time.perf_counter()
        reps = 3
        for f in range(reps):
            color, _ = render_image_sharded(
                params, cam, args.width, args.height, mesh,
                algo="pathtracing", spp=1,
                pixel_sampler="jittered_blend", frame_num=f + 2)
        jax.block_until_ready(color)
        dt = (time.perf_counter() - t0) / reps
        rays = args.width * args.height * args.bounces
        strong[d] = rays / dt / 1e6

    # ---- config #5 analogue: geometry-sharded closest hit, weak scaling
    weak = {}
    n_rays = 4096 * max(devs)
    for d in devs:
        verts, faces = random_triangles(args.tris_per_shard * d, seed=7,
                                        extent=8.0, tri_size=0.3)
        tm = TriangleMesh.create(verts, faces)
        geo = shard_geometry(tm, d, backend="lbvh")
        rng = np.random.default_rng(1)
        cent = verts.reshape(-1, 3, 3).mean(axis=1)
        o = rng.uniform(-7, 7, (n_rays, 3)).astype(np.float32)
        dirs = (cent[rng.integers(0, len(cent), n_rays)] - o)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ray = Ray(jnp.asarray(o), jnp.asarray(dirs.astype(np.float32)))
        mesh = make_mesh(d)
        hr = geometry_sharded_closest_hit(ray, geo, mesh)
        jax.block_until_ready(hr.t)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            hr = geometry_sharded_closest_hit(ray, geo, mesh)
        jax.block_until_ready(hr.t)
        dt = (time.perf_counter() - t0) / reps
        weak[d] = n_rays / dt / 1e6

    eff_s = scaling_efficiency(strong)
    # weak scaling: constant work per device -> efficiency = rate(d)/rate(1)
    base_w = weak[min(weak)]
    eff_w = {d: 100.0 * v / base_w for d, v in weak.items()}

    if args.json:
        print(json.dumps({
            "strong_tile_sharded": {str(d): {"mrays_per_s": strong[d],
                                             "efficiency_pct": eff_s[d]}
                                    for d in devs},
            "weak_geometry_sharded": {str(d): {"mrays_per_s": weak[d],
                                               "efficiency_pct": eff_w[d]}
                                      for d in devs},
            "devices_available": avail,
            "backend": jax.default_backend(),
        }))
    else:
        print(f"backend={jax.default_backend()} devices={avail}")
        print("\nconfig #4 — tile-sharded PT render (strong scaling)")
        print(f"{'devices':>8} {'Mrays/s':>10} {'efficiency':>11}")
        for d in devs:
            print(f"{d:>8} {strong[d]:>10.3f} {eff_s[d]:>10.1f}%")
        print("\nconfig #5 — geometry-sharded closest hit (weak scaling)")
        print(f"{'devices':>8} {'Mrays/s':>10} {'efficiency':>11}")
        for d in devs:
            print(f"{d:>8} {weak[d]:>10.3f} {eff_w[d]:>10.1f}%")
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
