"""Config #5 in miniature: geometry-sharded + tile-sharded path tracing.

The reference's largest configuration (instanced Sponza x16 at 4K on a
v5e-32 slice) sharded over whatever devices are available — here run on
the CPU's virtual 8-device mesh so the example works anywhere:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/sharded_render.py

Each device owns 1/8 of the instanced scene (a morton-compact soup slice
+ its own LBVH); rays visit every shard over a ppermute ring that carries
the running closest hit AND its locally-gathered surface data home
(parallel/ring.py, parallel/sharded_pt.py).
"""

import numpy as np

import jax

from visionaray_tpu.parallel.ring import shard_geometry
from visionaray_tpu.parallel.sharded_pt import render_image_geometry_sharded
from visionaray_tpu.parallel.tile_sharding import make_mesh
from visionaray_tpu.scenes import sponza_x16_scene


def main():
    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev)
    scene, cam = sponza_x16_scene(target_tris_per_instance=2000,
                                  instances=16)
    print(f"{scene.mesh.num_prims} triangles over {n_dev} devices "
          f"(~{scene.mesh.num_prims // n_dev} per shard)")
    geo = shard_geometry(scene.mesh, n_dev, backend="lbvh",
                         with_shading=True)
    color, depth = render_image_geometry_sharded(
        geo, scene.materials, scene.lights, cam, 160, 90, mesh,
        num_bounces=3, spp=1, nee=True, bg_color=(0.2, 0.3, 0.5, 1.0),
        ambient=(1.0, 1.0, 1.0))
    from visionaray_tpu.io.image import save_png
    save_png("sharded_render.png", np.asarray(color)[..., :3], srgb=True)
    print("wrote sharded_render.png")


if __name__ == "__main__":
    main()
