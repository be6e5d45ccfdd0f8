#!/usr/bin/env python
"""CLI renderer — the headless analogue of vsnray-viewer (src/viewer/viewer.cpp).

Examples:
    python render.py --scene builtin:tri_sphere_plane --algorithm simple \
        --width 256 --height 256 --output out.png
    python render.py --scene scene.obj --algorithm pathtracing --spp 16 \
        --bounces 10 --output out.png
    python render.py --scene builtin:cornell --algorithm pathtracing \
        --spp 64 --benchmark

Flags mirror the viewer's CmdLine options (viewer.cpp:134-217): algorithm,
spp/ssaa, bounces, ambient, camera file, plus TPU-specific tiling/sharding.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def build_scene(name: str, args):
    if name.startswith("builtin:"):
        key = name.split(":", 1)[1]
        if key in ("tri_sphere_plane", "config1"):
            from visionaray_tpu.scenes import tri_sphere_plane
            return tri_sphere_plane()
        if key in ("cornell", "cornell_box"):
            from visionaray_tpu.scenes import cornell_box
            return cornell_box()
        if key == "cornell_spectral":
            from visionaray_tpu.scenes import cornell_box_spectral
            return cornell_box_spectral()
        if key == "teapot":
            from visionaray_tpu.scenes import teapot_scene
            return teapot_scene(build_bvh=not args.no_bvh)
        if key.startswith("sponza"):
            from visionaray_tpu.scenes import sponza_like_scene
            return sponza_like_scene(target_tris=args.target_tris,
                                     build_bvh=not args.no_bvh)
        if key == "volume":
            from visionaray_tpu.scenes import volume_scene
            return volume_scene()
        if key == "multi_volume":
            from visionaray_tpu.scenes import multi_volume_scene
            return multi_volume_scene()
        if key in ("sponza_x16", "config5"):
            from visionaray_tpu.scenes import sponza_x16_scene
            return sponza_x16_scene(
                target_tris_per_instance=args.target_tris)
        raise SystemExit(f"unknown builtin scene: {key}")
    # OBJ file
    from visionaray_tpu.io.obj import load_obj_scene
    from visionaray_tpu.shading.lights import PointLights
    scene = load_obj_scene(name, build_bvh=not args.no_bvh)
    return scene, None


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("--scene", required=True,
                   help="OBJ path or builtin:{tri_sphere_plane,cornell,teapot,sponza}")
    p.add_argument("--algorithm", default="simple",
                   choices=["simple", "whitted", "pathtracing", "ao",
                            "volume"])
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--spp", type=int, default=1)
    p.add_argument("--frames", type=int, default=1,
                   help="progressive accumulation frames (pathtracing)")
    p.add_argument("--bounces", type=int, default=None)
    p.add_argument("--ambient", type=float, nargs=3, default=None)
    p.add_argument("--camera", default=None, help="camera file to load")
    p.add_argument("--camera-matrix", action="store_true",
                   help="generate primary rays through the inverse "
                        "view-proj matrix path (MatrixCamera, the "
                        "reference's sched_common.h:152-178) instead of "
                        "the pinhole basis")
    p.add_argument("--eye", type=float, nargs=3, default=None)
    p.add_argument("--center", type=float, nargs=3, default=None)
    p.add_argument("--fovy", type=float, default=45.0, help="degrees")
    p.add_argument("--output", "-o", default="out.png")
    p.add_argument("--no-srgb", action="store_true")
    p.add_argument("--no-bvh", action="store_true")
    p.add_argument("--bvh", choices=["lbvh", "cluster", "sah", "sbvh"],
                   default="lbvh",
                   help="acceleration structure: lbvh (jnp tier, runs "
                        "anywhere), cluster (Pallas TPU fast path), or the "
                        "native quality builders sah / sbvh (host binned "
                        "SAH, sbvh adds spatial splits; jnp tier — the "
                        "reference's --bvh split analogue, viewer.cpp)")
    p.add_argument("--treelet", type=int, default=-1,
                   help="ClusterBVH treelet size for binned incoherent-ray "
                        "traversal (-1 = auto: 128 for pathtracing, off "
                        "otherwise; 0 = off)")
    p.add_argument("--nee", action="store_true",
                   help="next-event estimation for pathtracing (soft "
                        "shadows / direct light sampling)")
    p.add_argument("--spectral", type=int, default=0, metavar="N",
                   help="spectral pathtracing with N wavelength samples "
                        "(VSNRAY_SPECTRUM_RGB off; 0 = RGB mode)")
    p.add_argument("--tile-size", type=int, default=0)
    p.add_argument("--target-tris", type=int, default=260_000)
    p.add_argument("--benchmark", action="store_true",
                   help="print Mrays/s metrics as JSON")
    p.add_argument("--dump-bvh", default=None, metavar="PNG",
                   help="write a level-colored AABB-outline rendering of "
                        "the built BVH + a stats line, then exit (the "
                        "headless analogue of the reference's "
                        "gl/bvh_outline_renderer.h debug view)")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--elastic", action="store_true",
                   help="elastic scheduler: per-batch re-dispatch on "
                        "failure + npz checkpoint/resume "
                        "(sched/elastic.py)")
    p.add_argument("--elastic-batch", type=int, default=1 << 16,
                   help="pixels per elastic batch")
    p.add_argument("--elastic-checkpoint", default=None, metavar="PATH",
                   help="npz checkpoint for elastic resume (preemption "
                        "loses at most one checkpoint window)")
    args = p.parse_args(argv)

    if args.cpu:
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import numpy as np

    from visionaray_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from visionaray_tpu.io.image import save_png
    from visionaray_tpu.sched.render import render

    scene, cam = build_scene(args.scene, args)
    if args.bvh in ("sah", "sbvh") and scene.mesh is not None \
            and not args.no_bvh:
        import dataclasses

        from visionaray_tpu.ops import sah as _sah
        if not _sah.available():
            p.error("--bvh %s needs the native builder "
                    "(native/sah_builder.cpp; auto-compiled on first use — "
                    "needs g++ on PATH)" % args.bvh)
        scene = dataclasses.replace(
            scene, bvh=_sah.build(scene.mesh, builder=args.bvh))
    if args.bvh == "cluster" and scene.mesh is not None and not args.no_bvh:
        import dataclasses
        from visionaray_tpu.ops.pallas.cluster_bvh import build_cluster_bvh
        # treelets enable binned traversal of incoherent bounce rays — the
        # path-tracing fast path (docs/PERF.md: T=128 measured optimal)
        tsize = args.treelet if args.treelet >= 0 else (
            128 if args.algorithm == "pathtracing" else 0)
        scene = dataclasses.replace(
            scene, bvh=jax.jit(
                build_cluster_bvh,
                static_argnames=("cluster_size", "treelet_size"))(
                    scene.mesh, treelet_size=tsize))
    if cam is None or args.eye is not None or args.camera is not None:
        from visionaray_tpu.core.camera import Pinhole
        if args.camera:
            from visionaray_tpu.io.camera_io import load_camera
            cam = load_camera(args.camera)
        else:
            import jax.numpy as jnp
            bbox = scene.bbox()
            cam0 = Pinhole.create(eye=(0, 0, 1), center=(0, 0, 0),
                                  fovy=np.deg2rad(args.fovy),
                                  aspect=args.width / args.height)
            if args.eye is not None:
                center = args.center or [float(c) for c in
                                         np.asarray(bbox.center())]
                cam = cam0.look_at(args.eye, center)
            else:
                cam = cam0.view_all(np.asarray(bbox.lo), np.asarray(bbox.hi))

    if args.camera_matrix:
        from visionaray_tpu.core.camera import MatrixCamera
        cam = MatrixCamera.from_pinhole(cam)

    if args.dump_bvh:
        import json as _json

        from visionaray_tpu.utils.bvh_debug import dump_bvh
        tgt = scene.bvh if scene.bvh is not None else scene.sphere_bvh
        if tgt is None:
            p.error("--dump-bvh: the scene has no BVH "
                    "(drop --no-bvh or pick --bvh)")
        stats = dump_bvh(tgt, args.dump_bvh, width=args.width)
        print(_json.dumps({"bvh_dump": args.dump_bvh, **stats}))
        return 0

    ambient = tuple(args.ambient) + (1.0,) if args.ambient else None
    t_start = time.perf_counter()
    rt = None
    if args.elastic:
        # production scheduler: per-batch re-dispatch, fresh-executable
        # retry, npz checkpoint/resume (sched/elastic.py)
        import jax.numpy as jnp

        from visionaray_tpu.kernels.params import KernelParams
        from visionaray_tpu.sched.elastic import render_frame_elastic
        from visionaray_tpu.sched.render import RenderTarget

        bounces = args.bounces or (
            10 if args.algorithm == "pathtracing" else 4)
        amb = ambient or ((1.0, 1.0, 1.0, 1.0)
                          if args.algorithm == "pathtracing"
                          else (0.0, 0.0, 0.0, 0.0))
        bbox = scene.bbox()
        epsv = max(1e-3, float(np.linalg.norm(
            np.asarray(bbox.hi) - np.asarray(bbox.lo))) * 1e-5)
        params = KernelParams.create(
            scene, num_bounces=bounces, epsilon=epsv,
            bg_color=(0.1, 0.4, 1.0, 1.0), ambient_color=amb)
        sampler = ("jittered_blend"
                   if args.algorithm in ("pathtracing", "ao") else "uniform")
        acc = None
        for frame in range(1, args.frames + 1):
            ck = (f"{args.elastic_checkpoint}.f{frame}.npz"
                  if args.elastic_checkpoint else None)
            img, report = render_frame_elastic(
                params, cam, args.width, args.height, algo=args.algorithm,
                spp=args.spp, pixel_sampler=sampler, frame_num=frame,
                nee=args.nee, batch=args.elastic_batch,
                checkpoint_path=ck)
            if not report.ok:
                print(f"elastic: frame {frame} had {report.failed} "
                      f"abandoned batches")
            alpha = 1.0 / frame
            acc = img if acc is None else acc * (1 - alpha) + img * alpha
        rt = RenderTarget(color=jnp.asarray(acc),
                          depth=jnp.zeros(acc.shape[:2], jnp.float32),
                          width=args.width, height=args.height)
    else:
        for frame in range(1, args.frames + 1):
            rt = render(scene, cam, args.width, args.height,
                        algo=args.algorithm, spp=args.spp,
                        bounces=args.bounces, ambient=ambient,
                        frame_num=frame, tile_size=args.tile_size, rt=rt,
                        nee=args.nee, spectral=args.spectral)
    rt.color.block_until_ready()
    elapsed = time.perf_counter() - t_start

    save_png(args.output, np.asarray(rt.color)[..., :3],
             srgb=not args.no_srgb)
    n_pixels = args.width * args.height
    n_prims = scene.num_triangles + scene.num_spheres + scene.num_planes
    print(f"rendered {args.width}x{args.height} {args.algorithm} "
          f"({n_prims} prims, {args.spp} spp x {args.frames} frames) "
          f"in {elapsed:.2f}s -> {args.output}")

    if args.benchmark:
        # honest timing: re-render post-compile
        t0 = time.perf_counter()
        reps = 3
        for frame in range(1, reps + 1):
            rt = render(scene, cam, args.width, args.height,
                        algo=args.algorithm, spp=args.spp,
                        bounces=args.bounces, ambient=ambient,
                        frame_num=frame, tile_size=args.tile_size, rt=rt,
                        nee=args.nee, spectral=args.spectral)
        rt.color.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        bounces = args.bounces or (10 if args.algorithm == "pathtracing" else 4)
        rays_per_frame = n_pixels * args.spp * (
            1 if args.algorithm == "simple" else bounces)
        print(json.dumps({
            "metric": "Mrays/s",
            "value": rays_per_frame / dt / 1e6,
            "frame_ms": dt * 1e3,
            "device": str(jax.devices()[0]),
        }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
