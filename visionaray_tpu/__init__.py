"""visionaray_tpu — a TPU-native differentiable ray tracing framework.

A from-scratch re-design of the capabilities of tu500/visionaray (a C++ header-only
SIMD/CUDA ray tracing library) as a JAX/Pallas framework:

- Data model: frozen dataclass pytrees of SoA jnp arrays (Scene, BVH, Ray batches).
- Compute: rank-polymorphic jnp kernels (the correctness/autodiff tier) plus Pallas
  TPU kernels for the hot paths (traversal, intersection) with hand-derived VJPs.
- Parallelism: the reference's SIMD packets/tiled thread pool/CUDA megakernel all
  map onto XLA vectorization, Pallas grids, and `shard_map` over TPU meshes.

Reference layer map: see SURVEY.md in the repo root.
"""

__version__ = "0.1.0"

from visionaray_tpu.core.types import Ray, HitRecord, ResultRecord, AABB
from visionaray_tpu.core.camera import Pinhole, MatrixCamera
from visionaray_tpu.core.scene import Scene, TriangleMesh, Spheres, Planes
from visionaray_tpu.shading.materials import Materials, MaterialType
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.sched.render import render, RenderTarget, SchedParams

__all__ = [
    "Ray", "HitRecord", "ResultRecord", "AABB",
    "Pinhole", "MatrixCamera",
    "Scene", "TriangleMesh", "Spheres", "Planes",
    "Materials", "MaterialType", "PointLights",
    "render", "RenderTarget", "SchedParams",
]
