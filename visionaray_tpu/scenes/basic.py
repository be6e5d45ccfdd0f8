"""Basic procedural scenes: config #1 (tri+sphere+plane) and the Cornell box."""

from __future__ import annotations

import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.scene import Planes, Scene, Spheres, TriangleMesh
from visionaray_tpu.shading.lights import PointLights
from visionaray_tpu.shading.materials import Materials


def tri_sphere_plane():
    """BASELINE config #1: single triangle + sphere on a ground plane.

    Returns (scene, camera).  Matches the reference's generic_primitive
    example style (src/examples/generic_primitive/main.cpp): mixed primitive
    types in one scene.
    """
    vertices = np.array([
        [-1.5, 0.0, -1.0],
        [-0.2, 0.0, -1.2],
        [-0.85, 1.6, -1.1],
    ], np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    mesh = TriangleMesh.create(vertices, faces, geom_ids=[0])
    spheres = Spheres.create(center=[[0.8, 0.6, 0.0]], radius=[0.6],
                             geom_ids=[1])
    planes = Planes.create(normal=[[0.0, 1.0, 0.0]], offset=[0.0],
                           geom_ids=[2])
    materials = Materials.concatenate([
        Materials.plastic(cd=(0.8, 0.2, 0.1), kd=1.0, cs=(0.2, 0.2, 0.2),
                          ks=1.0, specular_exp=32.0, ca=(0.2, 0.2, 0.2), ka=1.0),
        Materials.plastic(cd=(0.1, 0.7, 0.2), kd=1.0, cs=(0.5, 0.5, 0.5),
                          ks=1.0, specular_exp=64.0, ca=(0.2, 0.2, 0.2), ka=1.0),
        Materials.matte(cd=(0.6, 0.6, 0.6), kd=1.0, ca=(0.2, 0.2, 0.2), ka=1.0),
    ])
    lights = PointLights.create(position=[[2.0, 5.0, 3.0]],
                                cl=(1.0, 1.0, 1.0), kl=1.0)
    scene = Scene.create(mesh=mesh, spheres=spheres, planes=planes,
                         materials=materials, lights=lights)
    cam = Pinhole.create(eye=(0.0, 1.5, 4.0), center=(0.0, 0.8, 0.0),
                         up=(0.0, 1.0, 0.0), fovy=np.deg2rad(45.0), aspect=1.0)
    return scene, cam


def cornell_box(light_scale: float = 1.0):
    """BASELINE config #3: the Cornell box with an emissive area patch.

    Returns (scene, camera).  Classic proportions in [0,1]^3 units scaled by
    ~5.5 (so the usual 555-unit box maps to [0, 5.55]).
    """
    s = 5.55
    quads = []   # (4 corners, material)
    white, red, green, light = 0, 1, 2, 3
    # floor, ceiling, back wall (white)
    quads.append((([0, 0, 0], [s, 0, 0], [s, 0, s], [0, 0, s]), white))
    quads.append((([0, s, 0], [0, s, s], [s, s, s], [s, s, 0]), white))
    quads.append((([0, 0, s], [s, 0, s], [s, s, s], [0, s, s]), white))
    # left wall (red), right wall (green)
    quads.append((([0, 0, 0], [0, 0, s], [0, s, s], [0, s, 0]), red))
    quads.append((([s, 0, 0], [s, s, 0], [s, s, s], [s, 0, s]), green))
    # light patch near ceiling
    l0, l1, ly = 0.35 * s, 0.65 * s, s - 0.005 * s
    quads.append((([l0, ly, l0], [l1, ly, l0], [l1, ly, l1], [l0, ly, l1]),
                  light))

    # short and tall blocks (axis-aligned boxes, white)
    def box(lo, hi):
        x0, y0, z0 = lo
        x1, y1, z1 = hi
        c = lambda x, y, z: [x, y, z]
        faces6 = [
            (c(x0, y0, z0), c(x1, y0, z0), c(x1, y1, z0), c(x0, y1, z0)),  # -z
            (c(x0, y0, z1), c(x0, y1, z1), c(x1, y1, z1), c(x1, y0, z1)),  # +z
            (c(x0, y0, z0), c(x0, y1, z0), c(x0, y1, z1), c(x0, y0, z1)),  # -x
            (c(x1, y0, z0), c(x1, y0, z1), c(x1, y1, z1), c(x1, y1, z0)),  # +x
            (c(x0, y1, z0), c(x1, y1, z0), c(x1, y1, z1), c(x0, y1, z1)),  # +y
            (c(x0, y0, z0), c(x0, y0, z1), c(x1, y0, z1), c(x1, y0, z0)),  # -y
        ]
        return faces6

    for f in box((0.12 * s, 0.0, 0.10 * s), (0.42 * s, 0.30 * s, 0.40 * s)):
        quads.append((f, white))
    for f in box((0.55 * s, 0.0, 0.45 * s), (0.85 * s, 0.60 * s, 0.75 * s)):
        quads.append((f, white))

    verts, faces, gids = [], [], []
    for corners, mat in quads:
        base = len(verts)
        verts.extend(corners)
        faces.append([base, base + 1, base + 2])
        faces.append([base, base + 2, base + 3])
        gids.extend([mat, mat])

    mesh = TriangleMesh.create(np.asarray(verts, np.float32),
                               np.asarray(faces, np.int32),
                               geom_ids=np.asarray(gids, np.int32))
    materials = Materials.concatenate([
        Materials.matte(cd=(0.73, 0.73, 0.73), kd=1.0, ca=(0, 0, 0), ka=0.0),
        Materials.matte(cd=(0.65, 0.05, 0.05), kd=1.0, ca=(0, 0, 0), ka=0.0),
        Materials.matte(cd=(0.12, 0.45, 0.15), kd=1.0, ca=(0, 0, 0), ka=0.0),
        Materials.emissive(ce=(1.0, 0.85, 0.6), ls=8.0 * light_scale),
    ])
    lights = PointLights.none()
    scene = Scene.create(mesh=mesh, materials=materials, lights=lights)
    cam = Pinhole.create(eye=(0.5 * s, 0.5 * s, -1.45 * s),
                         center=(0.5 * s, 0.5 * s, 0.0),
                         up=(0.0, 1.0, 0.0),
                         fovy=np.deg2rad(40.0), aspect=1.0)
    return scene, cam


def cornell_box_spectral(n_samples: int = 60, light_scale: float = 1.0):
    """The Cornell box with the MEASURED wall/light SPDs (config #3's
    spectral variant; reference detail/spd/*).

    Lifts the RGB scene to n_samples wavelengths, then swaps in the true
    Cornell white/red/green reflectance curves and the measured light SPD —
    the case spectral rendering exists for (an RGB lift cannot express
    them).  Render with algo="pathtracing"; the kernel folds back through
    the CIE observer.
    """
    import dataclasses
    import jax.numpy as jnp
    from visionaray_tpu.shading import spectrum as sp

    scene, cam = cornell_box(light_scale=light_scale)
    scene = sp.lift_scene(scene, n_samples)
    lam = sp.lambdas(n_samples)
    cd = jnp.stack([sp.cornell_white(lam), sp.cornell_red(lam),
                    sp.cornell_green(lam), jnp.zeros_like(lam)])
    light_spd = sp.cornell_light(lam)
    # normalize the lamp SPD to keep overall brightness near the RGB scene
    light_spd = light_spd / jnp.max(light_spd)
    ce = jnp.concatenate([jnp.zeros((3, n_samples)), light_spd[None]])
    mats = dataclasses.replace(scene.materials, cd=cd, ce=ce)
    return dataclasses.replace(scene, materials=mats), cam


def random_triangles(n: int, seed: int = 0, extent: float = 10.0,
                     tri_size: float = 0.35):
    """Deterministic random triangle soup (builder/traversal stress tests;
    analogue of the reference BVH unit-test primitive sets,
    test/unittests/bvh/build.cpp:26-60)."""
    rng = np.random.default_rng(seed)
    centers = (rng.random((n, 3), np.float32) - 0.5) * extent
    offs = (rng.random((n, 3, 3), np.float32) - 0.5) * tri_size
    verts = (centers[:, None, :] + offs).reshape(-1, 3).astype(np.float32)
    faces = np.arange(3 * n, dtype=np.int32).reshape(n, 3)
    return verts, faces
