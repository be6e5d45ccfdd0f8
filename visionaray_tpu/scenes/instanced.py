"""Instanced scene builders — BASELINE config #5 (Sponza x16).

The reference has no instancing; its viewer loads one model.  Config #5's
"instanced Sponza x16" asks for a scene 16x too large to replicate per
chip, rendered geometry-sharded.  Instancing here is applied at
construction time (transforms baked into the vertex buffer): the sharded
renderer needs no runtime instance indirection, because each shard owns a
morton-compact slice of the flattened soup anyway (parallel/ring.py) —
run-time instancing would save host RAM but not per-device HBM, which is
the resource config #5 actually constrains.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Scene, TriangleMesh
from visionaray_tpu.scenes.sponza_like import sponza_like_scene


def instance_mesh(mesh: TriangleMesh, transforms) -> TriangleMesh:
    """Concatenate copies of ``mesh`` under 4x4 affine transforms.

    ``transforms``: (I, 4, 4) row-major affine matrices (applied as
    p' = M[:3,:3] @ p + M[:3,3]).  Normals are transformed with the
    inverse-transpose and re-normalized; geom_ids are preserved (instances
    share the material table).
    """
    M = np.asarray(transforms, np.float32)
    I = M.shape[0]
    verts = np.asarray(mesh.vertices)
    faces = np.asarray(mesh.faces)
    V = verts.shape[0]
    out_v, out_f, out_cn, out_tc, out_gid = [], [], [], [], []
    cn = np.asarray(mesh.corner_normals)
    tc = np.asarray(mesh.tex_coords)
    gid = np.asarray(mesh.geom_ids)
    for i in range(I):
        A = M[i, :3, :3]
        t = M[i, :3, 3]
        out_v.append(verts @ A.T + t)
        out_f.append(faces + i * V)
        N = np.linalg.inv(A).T
        cni = cn @ N.T
        cni /= np.maximum(np.linalg.norm(cni, axis=-1, keepdims=True),
                          1e-20)
        out_cn.append(cni)
        out_tc.append(tc)
        out_gid.append(gid)
    return TriangleMesh.create(
        np.concatenate(out_v, axis=0),
        np.concatenate(out_f, axis=0),
        geom_ids=np.concatenate(out_gid, axis=0),
        corner_normals=(None if mesh.face_normals_binding
                        else np.concatenate(out_cn, axis=0)),
        tex_coords=np.concatenate(out_tc, axis=0),
    )


def grid_transforms(n: int, pitch, rows: int = 0) -> np.ndarray:
    """(n, 4, 4) translations laying instances on an XZ grid."""
    rows = rows or int(np.ceil(np.sqrt(n)))
    cols = -(-n // rows)
    px, pz = (pitch if isinstance(pitch, (tuple, list)) else (pitch, pitch))
    out = np.tile(np.eye(4, dtype=np.float32), (n, 1, 1))
    for i in range(n):
        out[i, 0, 3] = (i % cols) * px
        out[i, 2, 3] = (i // cols) * pz
    return out


def sponza_x16_scene(target_tris_per_instance: int = 260_000,
                     instances: int = 16, seed: int = 7):
    """Config #5 scene: instanced sponza-like courtyard, 16 copies on a
    4x4 grid (~4.2M triangles at full scale).  Returns (scene, camera);
    BVH is NOT built (the sharded path builds per-shard accels)."""
    base, cam = sponza_like_scene(target_tris=target_tris_per_instance,
                                  build_bvh=False, seed=seed)
    verts = np.asarray(base.mesh.vertices)
    lo, hi = verts.min(axis=0), verts.max(axis=0)
    pitch = (float(hi[0] - lo[0]) * 1.05, float(hi[2] - lo[2]) * 1.05)
    mesh16 = instance_mesh(base.mesh,
                           grid_transforms(instances, pitch, rows=4))
    scene = dataclasses.replace(base, mesh=mesh16)
    # camera at first-courtyard eye height, looking across the grid so
    # several instances' colonnades are in frame
    cam = Pinhole.create(
        eye=(0.15 * pitch[0], 0.45 * float(hi[1] - lo[1]),
             0.2 * pitch[1]),
        center=(2.2 * pitch[0], 0.25 * float(hi[1] - lo[1]),
                1.8 * pitch[1]),
        up=(0.0, 1.0, 0.0), fovy=np.deg2rad(62.0), aspect=16.0 / 9.0)
    return scene, cam
