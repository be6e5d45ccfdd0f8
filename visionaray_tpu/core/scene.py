"""Scene container: SoA pytrees of geometry, materials, lights, textures.

The reference's model (src/common/model.h:20-48) holds triangles (v1/e1/e2
form), per-face geometric normals, per-vertex shading normals, tex coords,
plastic materials and textures.  Here the scene is a pytree of jnp arrays so
that every field is a potential differentiable leaf (vertex positions,
normals, material parameters, light parameters).

Primitive id convention: global ids are assigned in order
triangles [0, F) -> spheres [F, F+S) -> planes [F+S, F+S+P).
``geom_id`` is the per-primitive material index (reference bvh primitives carry
prim_id/geom_id; get_surface gathers the material by geom_id, get_surface.h).
"""

from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from visionaray_tpu.core.types import AABB, pytree_dataclass
from visionaray_tpu.core.vecmath import cross, normalize
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials


@pytree_dataclass(static=("face_normals_binding",))
class TriangleMesh:
    """Indexed triangle mesh.

    ``vertices`` (V,3) is the differentiable leaf; v1/e1/e2 (the reference's
    triangle storage, math/triangle.h:33-36) are derived inside traced
    functions so gradients flow back to the vertex buffer.
    """

    vertices: Any        # (V, 3) f32
    faces: Any           # (F, 3) i32
    geom_ids: Any        # (F,)  i32 material index per face
    normals: Any         # (F, 3) f32 per-face geometric normals
    corner_normals: Any  # (F, 3, 3) f32 per-corner shading normals
    tex_coords: Any      # (F, 3, 2) f32 per-corner texture coords
    face_normals_binding: bool = True  # True: normals_per_face_binding

    @staticmethod
    def create(vertices, faces, geom_ids=None, corner_normals=None,
               tex_coords=None):
        """Build an indexed mesh.

        ``corner_normals``: optional (F, 3, 3) per-corner shading normals —
        the layout the reference uses for normals_per_vertex_binding
        (get_shading_normal.h gathers normals[prim_id*3 + k]).  When absent,
        shading normals fall back to face normals (normals_per_face_binding).
        ``tex_coords``: optional (F, 3, 2) per-corner UVs.
        """
        vertices = jnp.asarray(vertices, jnp.float32)
        faces = jnp.asarray(faces, jnp.int32)
        F = faces.shape[0]
        if geom_ids is None:
            geom_ids = jnp.zeros((F,), jnp.int32)
        else:
            geom_ids = jnp.asarray(geom_ids, jnp.int32)
        v1 = vertices[faces[:, 0]]
        v2 = vertices[faces[:, 1]]
        v3 = vertices[faces[:, 2]]
        face_n = normalize(cross(v2 - v1, v3 - v1))
        if corner_normals is None:
            binding = True
            corner_normals = jnp.broadcast_to(face_n[:, None, :], (F, 3, 3))
        else:
            binding = False
            corner_normals = jnp.asarray(corner_normals, jnp.float32)
        if tex_coords is None:
            tex_coords = jnp.zeros((F, 3, 2), jnp.float32)
        else:
            tex_coords = jnp.asarray(tex_coords, jnp.float32)
        return TriangleMesh(
            vertices=vertices, faces=faces, geom_ids=geom_ids,
            normals=face_n, corner_normals=corner_normals,
            tex_coords=tex_coords, face_normals_binding=binding,
        )

    @property
    def num_prims(self):
        return self.faces.shape[0]

    def corners(self):
        """Gather (v1, e1, e2) from the vertex buffer (differentiable)."""
        v1 = self.vertices[self.faces[:, 0]]
        v2 = self.vertices[self.faces[:, 1]]
        v3 = self.vertices[self.faces[:, 2]]
        return v1, v2 - v1, v3 - v1


@pytree_dataclass
class Spheres:
    """Sphere set (reference math/sphere.h)."""

    center: Any   # (S, 3)
    radius: Any   # (S,)
    geom_ids: Any # (S,) i32

    @staticmethod
    def create(center, radius, geom_ids=None):
        center = jnp.asarray(center, jnp.float32).reshape(-1, 3)
        radius = jnp.asarray(radius, jnp.float32).reshape(-1)
        if geom_ids is None:
            geom_ids = jnp.zeros(radius.shape, jnp.int32)
        return Spheres(center, radius, jnp.asarray(geom_ids, jnp.int32))

    @property
    def num_prims(self):
        return self.radius.shape[0]


@pytree_dataclass
class Planes:
    """Infinite planes dot(n, x) = offset (reference math/plane.h)."""

    normal: Any   # (P, 3)
    offset: Any   # (P,)
    geom_ids: Any # (P,) i32

    @staticmethod
    def create(normal, offset, geom_ids=None):
        normal = jnp.asarray(normal, jnp.float32).reshape(-1, 3)
        offset = jnp.asarray(offset, jnp.float32).reshape(-1)
        if geom_ids is None:
            geom_ids = jnp.zeros(offset.shape, jnp.int32)
        return Planes(normal, offset, jnp.asarray(geom_ids, jnp.int32))

    @property
    def num_prims(self):
        return self.offset.shape[0]


@pytree_dataclass
class Scene:
    """Full scene: geometry groups + materials + lights (+ optional textures).

    Any group may be None.  The BVH (when built) accelerates the triangle
    mesh; spheres/planes are intersected linearly (they are few in practice).
    """

    mesh: Optional[TriangleMesh]
    spheres: Optional[Spheres]
    planes: Optional[Planes]
    materials: Materials
    lights: PointLights
    bvh: Any = None          # ops.lbvh.BVH or None
    textures: Any = None     # shading.texture.TextureAtlas or None
    volumes: Any = None      # kernels.volume.Volumes or None
    sphere_bvh: Any = None   # ops.lbvh.BVH over spheres or None (the
                             # reference's generic build(), bvh.h:438-448)

    @staticmethod
    def create(mesh=None, spheres=None, planes=None, materials=None,
               lights=None, bvh=None, textures=None, volumes=None,
               sphere_bvh=None):
        if materials is None:
            materials = Materials.default()
        if lights is None:
            lights = PointLights.none()
        return Scene(mesh=mesh, spheres=spheres, planes=planes,
                     materials=materials, lights=lights, bvh=bvh,
                     textures=textures, volumes=volumes,
                     sphere_bvh=sphere_bvh)

    @property
    def num_triangles(self):
        return 0 if self.mesh is None else self.mesh.num_prims

    @property
    def num_spheres(self):
        return 0 if self.spheres is None else self.spheres.num_prims

    @property
    def num_planes(self):
        return 0 if self.planes is None else self.planes.num_prims

    def bbox(self) -> AABB:
        """Scene bounds over finite geometry (planes excluded)."""
        lo = jnp.full((3,), np.float32(3.4e38))
        hi = jnp.full((3,), np.float32(-3.4e38))
        if self.mesh is not None:
            lo = jnp.minimum(lo, jnp.min(self.mesh.vertices, axis=0))
            hi = jnp.maximum(hi, jnp.max(self.mesh.vertices, axis=0))
        if self.spheres is not None:
            r = self.spheres.radius[:, None]
            lo = jnp.minimum(lo, jnp.min(self.spheres.center - r, axis=0))
            hi = jnp.maximum(hi, jnp.max(self.spheres.center + r, axis=0))
        if self.volumes is not None:
            lo = jnp.minimum(lo, jnp.min(self.volumes.lo, axis=0))
            hi = jnp.maximum(hi, jnp.max(self.volumes.hi, axis=0))
        return AABB(lo, hi)
