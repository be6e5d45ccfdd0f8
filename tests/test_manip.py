"""Quaternion math + camera manipulators (reference src/common/manip/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from visionaray_tpu.core import quat as q
from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.io.manip import (Arcball, ArcballManipulator,
                                     PanManipulator, ZoomManipulator)


def test_quat_identity_mul():
    p = q.rotation_axis_angle(jnp.array([0.0, 1.0, 0.0]), 0.7)
    np.testing.assert_allclose(q.mul(q.identity(), p), p, atol=1e-6)
    np.testing.assert_allclose(q.mul(p, q.identity()), p, atol=1e-6)
    # p * conj(p) == identity for unit quats
    np.testing.assert_allclose(q.mul(p, q.conjugate(p)), q.identity(),
                               atol=1e-6)


def test_quat_axis_angle_roundtrip():
    axis = jnp.array([1.0, 2.0, -0.5])
    angle = 1.1
    p = q.rotation_axis_angle(axis, angle)
    assert float(q.norm(p)) == pytest.approx(1.0, abs=1e-6)
    np.testing.assert_allclose(q.rotation_angle(p), angle, atol=1e-5)
    np.testing.assert_allclose(q.rotation_axis(p),
                               np.asarray(axis) / np.linalg.norm(axis),
                               atol=1e-5)


def test_quat_matrix_matches_rotate_vec():
    p = q.rotation_axis_angle(jnp.array([0.3, -1.0, 0.2]), 2.1)
    m = q.to_matrix4(p)
    v = jnp.array([0.5, -0.25, 2.0])
    np.testing.assert_allclose(m[:3, :3] @ v, q.rotate_vec(p, v), atol=1e-5)
    # proper rotation: orthonormal, det +1
    r = np.asarray(m[:3, :3])
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-5)


def test_quat_rotation_from_to_doubles_angle():
    # reference quaternion::rotation(from, to) encodes TWICE the angle
    # between the vectors (detail/quaternion.inl:44-51): w = cos(theta)
    # not cos(theta/2).  90-degree input -> 180-degree rotation.
    a = jnp.array([1.0, 0.0, 0.0])
    b = jnp.array([0.0, 1.0, 0.0])
    p = q.rotation_from_to(a, b)
    np.testing.assert_allclose(q.rotation_angle(p), np.pi, atol=1e-5)
    np.testing.assert_allclose(q.rotate_vec(p, a), -a, atol=1e-5)


def test_arcball_project_inside_and_rim():
    ball = Arcball()
    vp = (0, 0, 200, 100)
    center = ball.project(100, 50, vp)
    np.testing.assert_allclose(center, [0.0, 0.0, 1.0], atol=1e-6)
    # far outside: pinned to the unit circle, z = 0
    rim = ball.project(400, 50, vp)
    assert float(rim[2]) == 0.0
    assert float(jnp.linalg.norm(rim)) == pytest.approx(1.0, abs=1e-6)
    # window y grows DOWN -> ball y grows UP (arcball.cpp:67)
    above = ball.project(100, 10, vp)
    assert float(above[1]) > 0.0


def _cam():
    return Pinhole.create(eye=(0.0, 0.0, 5.0), center=(0.0, 0.0, 0.0),
                          up=(0.0, 1.0, 0.0), fovy=jnp.pi / 4, aspect=2.0)


def test_arcball_manipulator_preserves_distance_and_center():
    manip = ArcballManipulator(_cam(), viewport=(0, 0, 800, 400))
    manip.handle_mouse_down(400, 200)
    manip.handle_mouse_move(500, 250)
    manip.handle_mouse_up()
    cam = manip.camera
    np.testing.assert_allclose(cam.center, [0.0, 0.0, 0.0], atol=1e-6)
    assert float(cam.distance) == pytest.approx(5.0, rel=1e-5)
    # the eye actually moved
    assert float(jnp.linalg.norm(cam.eye - jnp.array([0.0, 0.0, 5.0]))) > 0.1


def test_arcball_manipulator_continues_across_drags():
    # second drag composes with the first (down_rotation carry,
    # arcball_manipulator.cpp:54)
    manip = ArcballManipulator(_cam(), viewport=(0, 0, 800, 400))
    manip.handle_mouse_down(400, 200)
    manip.handle_mouse_move(500, 200)
    manip.handle_mouse_up()
    eye1 = np.asarray(manip.camera.eye)
    manip.handle_mouse_down(400, 200)
    manip.handle_mouse_move(500, 200)
    manip.handle_mouse_up()
    eye2 = np.asarray(manip.camera.eye)
    assert not np.allclose(eye1, eye2)
    assert np.linalg.norm(eye2) == pytest.approx(5.0, rel=1e-4)


def test_no_drag_without_mouse_down():
    manip = ArcballManipulator(_cam(), viewport=(0, 0, 800, 400))
    manip.handle_mouse_move(500, 250)
    np.testing.assert_allclose(manip.camera.eye, [0.0, 0.0, 5.0])


def test_pan_manipulator_moves_eye_and_center_together():
    manip = PanManipulator(_cam(), viewport=(0, 0, 800, 400))
    manip.handle_mouse_down(400, 200)
    manip.handle_mouse_move(480, 200)  # drag right
    cam = manip.camera
    delta_eye = np.asarray(cam.eye) - [0.0, 0.0, 5.0]
    delta_ctr = np.asarray(cam.center)
    np.testing.assert_allclose(delta_eye, delta_ctr, atol=1e-6)
    # pan right drags the SCENE right = camera moves left
    # (pan_manipulator.cpp:75 uses last - curr)
    assert delta_eye[0] == pytest.approx(-80 / 800 * 2.0 * 5.0, rel=1e-4)
    assert delta_eye[1] == pytest.approx(0.0, abs=1e-6)


def test_zoom_manipulator_dollies_along_view_axis():
    manip = ZoomManipulator(_cam(), viewport=(0, 0, 800, 400))
    manip.handle_mouse_down(400, 200)
    manip.handle_mouse_move(400, 100)  # drag up
    cam = manip.camera
    # dy = -(200-100)/400 = -0.25 -> s = 2*5*(-0.25) = -2.5 ->
    # eye = eye - dir*s = (0,0,5) + (0,0,2.5)
    np.testing.assert_allclose(cam.eye, [0.0, 0.0, 7.5], atol=1e-5)
    np.testing.assert_allclose(cam.center, [0.0, 0.0, 0.0], atol=1e-6)
