"""Headless camera manipulators (arcball rotate / pan / zoom).

The TPU framework renders offscreen, but interactive applications driving
it (notebooks, remote viewers, turntable scripts) still need the
reference's camera-manipulation semantics.  This module reimplements the
manipulator stack from ``/root/reference/src/common/manip/`` as pure
functions of (camera, mouse events) -> camera, with no window system:

- ``Arcball``            — arcball.{h,cpp} (screen->ball projection and
                           the accumulated quaternion)
- ``ArcballManipulator``  — arcball_manipulator.cpp:39-126 (rotate the eye
                           about the center on a virtual sphere)
- ``PanManipulator``      — pan_manipulator.cpp:64-91 (translate eye and
                           center in the view plane)
- ``ZoomManipulator``     — zoom_manipulator.cpp:68-93 (dolly along the
                           view axis)

Pixel convention: the reference receives window coordinates with y DOWN
(mouse events); ``Arcball.project`` negates y exactly like
arcball.cpp:66-67, so feed raw window y here too.

Usage::

    manip = ArcballManipulator(cam, viewport=(0, 0, 800, 600))
    manip.handle_mouse_down(400, 300)
    manip.handle_mouse_move(420, 310)   # drag
    manip.handle_mouse_up()
    cam = manip.camera                  # updated Pinhole
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax.numpy as jnp

from visionaray_tpu.core import quat as q
from visionaray_tpu.core.camera import Pinhole
from visionaray_tpu.core.vecmath import cross, normalize


@dataclasses.dataclass
class Arcball:
    """Screen-to-ball projection + accumulated rotation (arcball.cpp)."""

    radius: float = 1.0
    down_pos: Any = None           # (3,) ball coords at mouse-down
    rotation: Any = None           # accumulated unit quaternion
    down_rotation: Any = None      # rotation at mouse-down

    def __post_init__(self):
        if self.down_pos is None:
            self.down_pos = jnp.zeros(3, jnp.float32)
        if self.rotation is None:
            self.rotation = q.identity()
        if self.down_rotation is None:
            self.down_rotation = q.identity()

    def project(self, x: float, y: float,
                viewport: Tuple[int, int, int, int]):
        """Project window (x, y) onto the arcball (arcball.cpp:32-89).

        Outside the ball the point is pinned to the silhouette circle
        (z = 0), inside it lifts onto the sphere.
        """
        vx, vy, w, h = viewport
        x = x - vx
        y = y - vy
        u = (x - 0.5 * w) / (self.radius * 0.5 * w)
        v = -(y - 0.5 * h) / (self.radius * 0.5 * h)
        d = u * u + v * v
        if d > 1.0:
            inv = 1.0 / float(jnp.sqrt(d))
            return jnp.array([u * inv, v * inv, 0.0], jnp.float32)
        return jnp.array([u, v, float(jnp.sqrt(1.0 - d))], jnp.float32)


@dataclasses.dataclass
class CameraManipulator:
    """Base drag state machine (camera_manipulator.cpp)."""

    camera: Pinhole
    viewport: Tuple[int, int, int, int] = (0, 0, 1, 1)
    dragging: bool = False

    def handle_mouse_down(self, x: float, y: float) -> None:
        self.dragging = True
        self._on_down(x, y)

    def handle_mouse_move(self, x: float, y: float) -> None:
        if self.dragging:
            self._on_drag(x, y)

    def handle_mouse_up(self) -> None:
        self.dragging = False

    def _on_down(self, x, y):  # pragma: no cover - overridden
        pass

    def _on_drag(self, x, y):  # pragma: no cover - overridden
        pass


@dataclasses.dataclass
class ArcballManipulator(CameraManipulator):
    """Rotate the eye about the center (arcball_manipulator.cpp:75-126)."""

    ball: Arcball = dataclasses.field(default_factory=Arcball)

    def _on_down(self, x, y):
        # arcball_manipulator.cpp:49-54
        self.ball.down_pos = self.ball.project(x, y, self.viewport)
        self.ball.down_rotation = self.ball.rotation

    def _on_drag(self, x, y):
        cam = self.camera
        curr = self.ball.project(x, y, self.viewport)
        self.ball.rotation = q.mul(
            q.rotation_from_to(self.ball.down_pos, curr),
            self.ball.down_rotation)
        # view transform: rotate the canonical eye (0, 0, distance) by the
        # conjugate and re-look_at (arcball_manipulator.cpp:97-109)
        rm = q.to_matrix4(q.conjugate(self.ball.rotation))
        eye = rm[:3, :3] @ jnp.array([0.0, 0.0, float(cam.distance)],
                                     jnp.float32)
        eye = eye + cam.center
        up = rm[:3, 1]  # column 1, the rotated +Y (rotation_matrix(1))
        self.camera = cam.look_at(eye, cam.center, up)


@dataclasses.dataclass
class PanManipulator(CameraManipulator):
    """Translate eye+center in the view plane (pan_manipulator.cpp:64-91)."""

    last_pos: Tuple[float, float] = (0.0, 0.0)

    def _on_down(self, x, y):
        self.last_pos = (x, y)

    def _on_drag(self, x, y):
        cam = self.camera
        _, _, w, h = self.viewport
        dx = (self.last_pos[0] - x) / w
        dy = -(self.last_pos[1] - y) / h
        s = 2.0 * float(cam.distance)
        zaxis = normalize(cam.eye - cam.center)
        yaxis = cam.up
        xaxis = cross(yaxis, zaxis)
        d = (dx * s) * xaxis + (dy * s) * yaxis
        self.camera = cam.look_at(cam.eye + d, cam.center + d, cam.up)
        self.last_pos = (x, y)


@dataclasses.dataclass
class ZoomManipulator(CameraManipulator):
    """Dolly along the view axis (zoom_manipulator.cpp:68-93)."""

    last_pos: Tuple[float, float] = (0.0, 0.0)

    def _on_down(self, x, y):
        self.last_pos = (x, y)

    def _on_drag(self, x, y):
        cam = self.camera
        _, _, _, h = self.viewport
        dy = -(self.last_pos[1] - y) / h
        s = 2.0 * float(cam.distance) * dy
        direction = normalize(cam.eye - cam.center)
        self.camera = cam.look_at(cam.eye - direction * s, cam.center,
                                  cam.up)
        self.last_pos = (x, y)
