"""OBJ loader + camera file round-trip tests."""

import numpy as np

from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.io.camera_io import load_camera, save_camera
from visionaray_tpu.io.obj import load_obj, parse_mtl
from visionaray_tpu.shading.materials import MaterialType

OBJ = """
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vn 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl glow
f -4 -3 -2
"""

MTL = """
newmtl red
Ka 0.1 0.0 0.0
Kd 0.9 0.1 0.1
Ks 0.5 0.5 0.5
Ns 64
newmtl glow
Ke 2.0 1.5 1.0
"""


def test_load_obj(tmp_path):
    (tmp_path / "test.mtl").write_text(MTL)
    p = tmp_path / "test.obj"
    p.write_text(OBJ)
    mesh, mats, tex = load_obj(str(p))
    # quad fans into 2 tris + 1 extra tri
    assert mesh.num_prims == 3
    faces = np.asarray(mesh.faces)
    np.testing.assert_array_equal(faces[0], [0, 1, 2])
    np.testing.assert_array_equal(faces[1], [0, 2, 3])
    np.testing.assert_array_equal(faces[2], [0, 1, 2])  # negative indices
    gids = np.asarray(mesh.geom_ids)
    np.testing.assert_array_equal(gids, [0, 0, 1])
    assert int(mats.mtype[0]) == MaterialType.PLASTIC
    assert int(mats.mtype[1]) == MaterialType.EMISSIVE
    np.testing.assert_allclose(np.asarray(mats.cd[0]), [0.9, 0.1, 0.1])
    np.testing.assert_allclose(np.asarray(mats.specular_exp[0]), 64.0)
    np.testing.assert_allclose(np.asarray(mats.ce[1]), [2.0, 1.5, 1.0])


def test_mtl_defaults(tmp_path):
    p = tmp_path / "d.mtl"
    p.write_text("newmtl x\nKd 0.5 0.5 0.5\n")
    m = parse_mtl(str(p))["x"]
    assert m["ns"] == 32.0 and m["ka"] == (0.2, 0.2, 0.2)


def test_camera_roundtrip(tmp_path):
    cam = Pinhole.create(eye=(1, 2, 3), center=(0, 0.5, 0), up=(0, 1, 0),
                         fovy=0.7853982, aspect=1.5)
    p = tmp_path / "cam.txt"
    save_camera(str(p), cam)
    cam2 = load_camera(str(p))
    np.testing.assert_allclose(np.asarray(cam2.eye), [1, 2, 3], rtol=1e-6)
    np.testing.assert_allclose(float(cam2.fovy), 0.7853982, rtol=1e-6)
    np.testing.assert_allclose(float(cam2.aspect), 1.5, rtol=1e-6)
