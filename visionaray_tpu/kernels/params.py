"""Kernel parameters (reference kernels.h:94-333 kernel_params/make_kernel_params)."""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp

from visionaray_tpu.core.types import pytree_dataclass


@pytree_dataclass(static=("num_bounces", "hit_filter"))
class KernelParams:
    """Bundle of scene + render options passed to every kernel.

    Mirrors make_kernel_params (kernels.h): primitives/normals/materials/
    lights live in ``scene``; num_bounces, scene_epsilon, background and
    ambient colors are carried here.  ``num_bounces`` is static (it bounds
    an unrolled/scanned loop).

    ``hit_filter`` is the custom-intersector hook the reference threads
    from the scheduler into every kernel's closest/any-hit call
    (sched_common.h:786-818, intersector.h:24; the alpha-mask transparency
    example examples/intersector/main.cpp:256-330): a static callable
    ``fn(prim_id, t, u, v, hit) -> hit`` applied to every candidate hit on
    both traversal tiers (ops/trace.py).
    """

    scene: Any
    epsilon: Any        # f32 scalar — self-intersection offset
    bg_color: Any       # (4,) RGBA
    ambient_color: Any  # (4,) RGBA
    num_bounces: int = 4
    hit_filter: Any = None

    @staticmethod
    def create(scene, num_bounces=4, epsilon=1e-3,
               bg_color=(0.1, 0.4, 1.0, 1.0), ambient_color=None,
               hit_filter=None) -> "KernelParams":
        """Defaults mirror the viewer (src/viewer/viewer.cpp:489-496):
        bounces = 4 (10 for path tracing), epsilon = max(1e-3, diag*1e-5),
        ambient = 1 for path tracing else 0.
        """
        if ambient_color is None:
            ambient_color = (0.0, 0.0, 0.0, 0.0)
        return KernelParams(
            scene=scene,
            epsilon=jnp.float32(epsilon),
            bg_color=jnp.asarray(bg_color, jnp.float32),
            ambient_color=jnp.asarray(ambient_color, jnp.float32),
            num_bounces=num_bounces,
            hit_filter=hit_filter,
        )
