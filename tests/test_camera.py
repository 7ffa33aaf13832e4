"""Camera math unit tests (SURVEY §4: validate against cgmath semantics,
reference src/camera.rs:14-30 and the uniform packing src/lib.rs:86-112)."""

import numpy as np
import pytest

from rust_wgpu_raytracing_tpu.core import math3d
from rust_wgpu_raytracing_tpu.core.camera import Camera, CameraUniforms
from rust_wgpu_raytracing_tpu.core.controls import CircleCameraController
from rust_wgpu_raytracing_tpu.config import CameraConfig


def default_camera(aspect=1.0):
    return Camera.from_config(CameraConfig(), aspect=aspect)


class TestLookAt:
    def test_identity_frame(self):
        # eye at origin looking down -z with +y up => view == identity
        v = math3d.look_at_rh((0, 0, 0), (0, 0, -1), (0, 1, 0))
        np.testing.assert_allclose(v, np.eye(4), atol=1e-12)

    def test_view_maps_target_to_minus_z(self):
        eye = np.array([1.0, 2.0, 3.0])
        target = np.array([-2.0, 0.5, 1.0])
        v = math3d.look_at_rh(eye, target, (0, 1, 0))
        p = v @ np.append(target, 1.0)
        dist = np.linalg.norm(target - eye)
        np.testing.assert_allclose(p[:3], [0, 0, -dist], atol=1e-12)

    def test_orthonormal(self):
        v = math3d.look_at_rh((3, -1, 2), (0, 0, 0), (0, 1, 0))
        r = v[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)


class TestPerspective:
    def test_gl_corner_mapping(self):
        # near plane center maps to z=-1, far plane center to z=+1 (NDC)
        near, far = 0.1, 100.0
        p = math3d.perspective_gl(60.0, 1.0, near, far)

        def project(z):
            v = p @ np.array([0, 0, z, 1.0])
            return v[2] / v[3]

        np.testing.assert_allclose(project(-near), -1.0, atol=1e-9)
        np.testing.assert_allclose(project(-far), 1.0, atol=1e-9)

    def test_fov_edge(self):
        near = 0.1
        p = math3d.perspective_gl(60.0, 2.0, near, 100.0)
        # at distance near, the view-space frustum's top edge y = near*tan(30deg)
        top = near * np.tan(np.deg2rad(30.0))
        v = p @ np.array([0.0, top, -near, 1.0])
        np.testing.assert_allclose(v[1] / v[3], 1.0, atol=1e-9)
        # x half-extent scales by aspect
        v = p @ np.array([top * 2.0, 0.0, -near, 1.0])
        np.testing.assert_allclose(v[0] / v[3], 1.0, atol=1e-9)


class TestUniforms:
    def test_view_inv_is_inverse(self):
        cam = default_camera()
        cam.eye = np.array([0.5, -0.25, 1.5])
        np.testing.assert_allclose(
            cam.view_matrix() @ cam.view_inv_matrix(), np.eye(4), atol=1e-9)

    def test_proj_inv_premultiplied_quirk(self):
        """The uniform proj_inv is GL2WGPU @ P^-1 (src/lib.rs:109) — NOT the
        inverse of the composed matrix. Pin the resulting ray-gen z: for
        (x,y,1,1), view z must be -0.5 + 0.5/zfar (see core/camera.py)."""
        cam = default_camera()
        uni = cam.uniforms()
        zfar = 100.0
        view_vec = uni.proj_inv_wgpu @ np.array([0.3, -0.2, 1.0, 1.0], np.float32)
        np.testing.assert_allclose(view_vec[2], -0.5 + 0.5 / zfar, rtol=1e-5)
        np.testing.assert_allclose(view_vec[3], 1.0 / zfar, rtol=1e-4)

    def test_flat_roundtrip(self):
        cam = default_camera(aspect=1.5)
        uni = cam.uniforms()
        rt = CameraUniforms.unflat(uni.flat())
        np.testing.assert_array_equal(rt.view_inv, uni.view_inv)
        np.testing.assert_array_equal(rt.proj_inv_wgpu, uni.proj_inv_wgpu)
        np.testing.assert_array_equal(rt.origin, uni.origin)


class TestCircleController:
    """Orbit math of circle_camera_control.rs:76-105."""

    def test_right_preserves_radius(self):
        cam = default_camera()
        cam.eye = np.array([0.0, 0.0, 2.0])
        cam.target = np.array([0.0, 0.0, -1.0])
        ctl = CircleCameraController(speed=0.2)
        ctl.keys.right = True
        r0 = np.linalg.norm(cam.target - cam.eye)
        for _ in range(25):
            ctl.update_camera(cam)
        np.testing.assert_allclose(
            np.linalg.norm(cam.target - cam.eye), r0, rtol=1e-9)

    def test_left_right_are_inverse_directions(self):
        cam1 = default_camera(); cam1.eye = np.array([0.0, 0.0, 2.0])
        cam2 = default_camera(); cam2.eye = np.array([0.0, 0.0, 2.0])
        ctl_r = CircleCameraController(speed=0.2); ctl_r.keys.right = True
        ctl_l = CircleCameraController(speed=0.2); ctl_l.keys.left = True
        ctl_r.update_camera(cam1)
        ctl_l.update_camera(cam2)
        # mirrored in x around the target axis
        np.testing.assert_allclose(cam1.eye[0], -cam2.eye[0], atol=1e-12)
        np.testing.assert_allclose(cam1.eye[2], cam2.eye[2], atol=1e-12)

    def test_forward_glitch_guard(self):
        cam = default_camera()
        cam.eye = np.array([0.0, 0.0, -0.9])  # distance 0.1 < speed 0.2
        ctl = CircleCameraController(speed=0.2)
        ctl.keys.forward = True
        eye0 = cam.eye.copy()
        ctl.update_camera(cam)
        np.testing.assert_array_equal(cam.eye, eye0)

    def test_backward_moves_away(self):
        cam = default_camera()
        cam.eye = np.array([0.0, 0.0, 0.0])
        ctl = CircleCameraController(speed=0.2)
        ctl.keys.backward = True
        ctl.update_camera(cam)
        np.testing.assert_allclose(cam.eye, [0, 0, 0.2], atol=1e-12)
