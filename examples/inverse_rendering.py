#!/usr/bin/env python
"""Inverse rendering: recover Cornell-box albedos from a target image.

The capability the reference never had (no autodiff): render -> L2 loss vs
target -> grads w.r.t. material albedo + emission -> Adam-style updates,
with optimizer-state checkpointing (utils/checkpoint.py) so a preempted run
resumes.  Run with --devices N to tile-shard pixels over a device mesh
(psum'd grads via shard_map transpose).
"""

import sys
sys.path.insert(0, __file__.rsplit("/", 2)[0])

import argparse
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--size", type=int, default=32)
    p.add_argument("--bounces", type=int, default=4)
    p.add_argument("--lr", type=float, default=0.2)
    p.add_argument("--devices", type=int, default=1)
    p.add_argument("--checkpoint", default="inverse_ckpt.npz")
    p.add_argument("--resume", action="store_true")
    args = p.parse_args()

    from visionaray_tpu.kernels.params import KernelParams
    from visionaray_tpu.parallel.tile_sharding import (
        make_mesh, render_image_sharded,
    )
    from visionaray_tpu.scenes import cornell_box
    from visionaray_tpu.utils.checkpoint import OptimCheckpoint

    scene, cam = cornell_box()
    W = H = args.size
    mesh = make_mesh(args.devices)
    base = KernelParams.create(scene, num_bounces=args.bounces, epsilon=1e-3,
                               bg_color=(0, 0, 0, 1),
                               ambient_color=(0, 0, 0, 0))

    def render_theta(theta, frame):
        mats = dataclasses.replace(base.scene.materials,
                                   cd=theta["cd"], ls=theta["ls"])
        p2 = dataclasses.replace(
            base, scene=dataclasses.replace(base.scene, materials=mats))
        color, _ = render_image_sharded(
            p2, cam, W, H, mesh, algo="pathtracing", spp=1,
            pixel_sampler="jittered_blend", frame_num=frame)
        return color[..., :3]

    # ground truth: the true scene
    true_theta = {"cd": scene.materials.cd, "ls": scene.materials.ls}
    target = jax.jit(render_theta)(true_theta, jnp.uint32(9999))

    # start from wrong albedos
    theta = {"cd": jnp.clip(scene.materials.cd * 0.3 + 0.3, 0.05, 0.95),
             "ls": scene.materials.ls * 0.5}
    opt_state = jax.tree_util.tree_map(jnp.zeros_like, theta)  # momentum
    step0 = 0
    if args.resume:
        theta, opt_state, step0 = OptimCheckpoint.load(
            args.checkpoint, theta, opt_state)
        print(f"resumed at step {step0}")

    @jax.jit
    def train_step(theta, opt_state, frame):
        def loss_fn(th):
            img = render_theta(th, frame)
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(theta)
        new_m = jax.tree_util.tree_map(
            lambda m, g: 0.9 * m + g, opt_state, grads)
        new_theta = jax.tree_util.tree_map(
            lambda p, m: jnp.clip(p - args.lr * m, 0.0, 20.0), theta, new_m)
        return new_theta, new_m, loss

    for step in range(step0, args.steps):
        theta, opt_state, loss = train_step(theta, opt_state,
                                            jnp.uint32(step + 1))
        if step % 10 == 0 or step == args.steps - 1:
            err = float(jnp.abs(theta["cd"] - true_theta["cd"]).mean())
            print(f"step {step:4d}  loss {float(loss):.6f}  "
                  f"albedo L1 {err:.4f}")
            OptimCheckpoint.save(args.checkpoint, theta, opt_state, step + 1)

    err = float(jnp.abs(theta["cd"] - true_theta["cd"]).mean())
    print(f"final albedo L1 error: {err:.4f} (started ~0.3)")


if __name__ == "__main__":
    main()
