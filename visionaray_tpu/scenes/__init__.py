"""Procedurally generated built-in scenes for tests, examples and benchmarks.

The reference ships no scene assets (the viewer loads user OBJ files); the
BASELINE.json config ladder names triangle+sphere+plane, the Utah teapot,
the Cornell box, and Sponza-class geometry.  With no network egress, teapot
geometry is generated from the canonical 32-patch Bezier control points and
Sponza is substituted by a deterministic "sponza-like" architectural scene
with a comparable triangle count.
"""

from visionaray_tpu.scenes.basic import (
    tri_sphere_plane, cornell_box, cornell_box_spectral, random_triangles,
)
from visionaray_tpu.scenes.teapot import teapot_scene, teapot_mesh
from visionaray_tpu.scenes.sponza_like import sponza_like_scene
from visionaray_tpu.scenes.volume_demo import multi_volume_scene, volume_scene
from visionaray_tpu.scenes.instanced import (
    grid_transforms, instance_mesh, sponza_x16_scene,
)

__all__ = [
    "tri_sphere_plane", "cornell_box", "cornell_box_spectral",
    "random_triangles", "teapot_scene", "teapot_mesh",
    "sponza_like_scene", "volume_scene", "multi_volume_scene",
    "grid_transforms", "instance_mesh", "sponza_x16_scene",
]
