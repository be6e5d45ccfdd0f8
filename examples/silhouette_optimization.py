#!/usr/bin/env python
"""Silhouette-driven shape optimization — the capability plain autodiff
cannot deliver.

A triangle is rendered at a target pose; we then try to recover that pose
from a shifted initialization by gradient descent on the pixel L2 loss.
At fixed hit topology the gradient of "which pixels does the triangle
cover" is exactly zero — without the boundary term the optimizer cannot
move the silhouette at all (try --no-boundary).  With
`diff.boundary_image` in the loss, silhouette motion gets a gradient
(screen-space edge sampling, docs/diff.md) and the triangle slides into
place.

Run: python examples/silhouette_optimization.py [--steps 60] [--size 48]
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--size", type=int, default=48)
    ap.add_argument("--lr", type=float, default=0.02)
    ap.add_argument("--no-boundary", action="store_true",
                    help="ablation: interior-only gradients (goes nowhere)")
    args = ap.parse_args()

    from visionaray_tpu.core.camera import Pinhole
    from visionaray_tpu.core.scene import Scene, TriangleMesh
    from visionaray_tpu.diff.boundary import (
        boundary_image, build_edge_adjacency,
    )
    from visionaray_tpu.io.image import save_png
    from visionaray_tpu.kernels.params import KernelParams
    from visionaray_tpu.sched.render import _render_frame
    from visionaray_tpu.shading.lights import PointLights
    from visionaray_tpu.shading.materials import Materials

    W = H = args.size
    faces = np.array([[0, 1, 2]], np.int32)
    target_v = jnp.asarray([[-0.5, -0.4, 0.0], [0.6, -0.3, 0.0],
                            [0.05, 0.7, 0.0]], jnp.float32)
    init_v = target_v + jnp.asarray([0.35, -0.25, 0.0])
    cam = Pinhole.create(eye=(0, 0, 3), center=(0, 0, 0),
                         fovy=np.deg2rad(45), aspect=1.0)
    adj = build_edge_adjacency(faces)
    mats = Materials.matte(cd=(0.85, 0.3, 0.2))
    lights = PointLights.create(position=[[2, 3, 4]])

    def make_params(v):
        mesh = TriangleMesh.create(v, faces)
        return KernelParams.create(
            Scene.create(mesh=mesh, materials=mats, lights=lights),
            num_bounces=1, epsilon=1e-3,
            bg_color=(0.05, 0.1, 0.3, 1.0),
            ambient_color=(0.2, 0.2, 0.2, 1.0))

    def frame(v):
        p = make_params(v)
        color, _ = _render_frame(p, cam, W, H, "simple", 1, "uniform", 0,
                                 jnp.uint32(1), 0)
        if not args.no_boundary:
            color = color + boundary_image(p, cam, W, H, adj,
                                           algo="simple", vertices=v,
                                           samples_per_edge=16)
        return color

    target = jax.lax.stop_gradient(frame(target_v))

    @jax.jit
    def step(v, m, u, i):
        loss, g = jax.value_and_grad(
            lambda vv: jnp.mean((frame(vv)[..., :3]
                                 - target[..., :3]) ** 2))(v)
        # Adam: the boundary gradient's magnitude shrinks as the overlap
        # grows (only the silhouette ring contributes), so a normalized
        # optimizer converges where plain SGD crawls
        m = 0.9 * m + 0.1 * g
        u = 0.999 * u + 0.001 * g * g
        mh = m / (1.0 - 0.9 ** (i + 1))
        uh = u / (1.0 - 0.999 ** (i + 1))
        return loss, v - args.lr * mh / (jnp.sqrt(uh) + 1e-8), m, u

    v = init_v
    m = jnp.zeros_like(v)
    u = jnp.zeros_like(v)
    loss0 = None
    for i in range(args.steps):
        loss, v, m, u = step(v, m, u, i)
        if loss0 is None:
            loss0 = float(loss)
        if i % 10 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.6f}  "
                  f"|v - target| {float(jnp.abs(v - target_v).max()):.4f}",
                  flush=True)

    save_png("silhouette_before.png",
             np.asarray(frame(init_v))[..., :3])
    save_png("silhouette_after.png", np.asarray(frame(v))[..., :3])
    print(f"wrote silhouette_before.png silhouette_after.png  "
          f"loss {loss0:.6f} -> {float(loss):.6f}")
    # note: |v - target| need not reach 0 — a pinhole camera cannot see
    # the depth/scale ambiguity, only the IMAGE loss is constrained
    if args.no_boundary:
        print("(interior-only ablation: the silhouette cannot move)")


if __name__ == "__main__":
    main()
