"""Camera convention tests: projection, look-at, pytorch3d interop round-trip."""

import jax.numpy as jnp
import numpy as np

from torch_renderer_tpu.cameras.look_at import (
    camera_position_from_spherical_angles,
    look_at_opencv,
    look_at_view_transform,
)
from torch_renderer_tpu.cameras.perspective import (
    PerspectiveCamera,
    pose_opencv_to_pytorch3d,
    pose_pytorch3d_to_opencv,
)


def test_projection_pinhole():
    K = np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(K, (96, 128))
    pts = jnp.asarray([[[0.0, 0.0, 2.0], [0.5, -0.25, 2.0]]])
    cam_pts = cam.world_to_camera(pts)
    uv, z = cam.project(cam_pts)
    np.testing.assert_allclose(np.asarray(uv[0, 0]), [64, 48], atol=1e-5)
    np.testing.assert_allclose(np.asarray(uv[0, 1]), [64 + 25, 48 - 12.5], atol=1e-4)
    np.testing.assert_allclose(np.asarray(z[0]), [2.0, 2.0])


def test_look_at_camera_sees_origin_at_center():
    eye = jnp.asarray([[1.5, 2.0, -3.0]])
    R, t = look_at_opencv(eye)
    # origin must project onto the optical axis at distance |eye|
    origin_cam = (R @ jnp.zeros((1, 3, 1)))[..., 0] + t
    np.testing.assert_allclose(np.asarray(origin_cam[0, :2]), 0.0, atol=1e-6)
    np.testing.assert_allclose(
        float(origin_cam[0, 2]), float(jnp.linalg.norm(eye)), rtol=1e-6
    )
    # rows of R are orthonormal, det +1
    RtR = np.asarray(R[0] @ R[0].T)
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-6)
    assert np.linalg.det(np.asarray(R[0])) > 0.99


def test_look_at_view_transform_matches_reference_t():
    # pytorch3d invariant carried over: origin sits at (0, 0, dist) in camera
    # frame for any (elev, azim) — see reference camera_pose_optimizer.py:169
    # ("reference (T,quaternion) = [0, -0, 5, ...]" for dist=5).
    R, t = look_at_view_transform(5.0, 30.0, 60.0)
    np.testing.assert_allclose(np.asarray(t[0]), [0, 0, 5.0], atol=1e-5)


def test_spherical_camera_position():
    eye = camera_position_from_spherical_angles(2.0, 0.0, 0.0)
    np.testing.assert_allclose(np.asarray(eye[0]), [0, 0, 2.0], atol=1e-6)
    eye = camera_position_from_spherical_angles(2.0, 90.0, 0.0)
    np.testing.assert_allclose(np.asarray(eye[0]), [0, 2.0, 0], atol=1e-6)


def test_opencv_pytorch3d_pose_roundtrip(rng):
    from scipy.spatial.transform import Rotation

    R = jnp.asarray(Rotation.random(5, rng).as_matrix(), jnp.float32)
    t = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    Rp, Tp = pose_opencv_to_pytorch3d(R, t)
    R2, t2 = pose_pytorch3d_to_opencv(Rp, Tp)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-6)


def test_pytorch3d_convention_semantics(rng):
    """The converted pose maps world points to the same pixels.

    pytorch3d: X_cam_p3d = X_world @ R_p3d + T_p3d with +x left / +y up;
    OpenCV:    X_cam_cv  = R_cv @ X_world + t_cv with +x right / +y down.
    Same physical camera => cam coords agree up to diag(-1, -1, 1).
    """
    R_cv, t_cv = look_at_opencv(jnp.asarray([[0.3, 1.0, -2.0]]))
    Rp, Tp = pose_opencv_to_pytorch3d(R_cv, t_cv)
    X = jnp.asarray(rng.normal(size=(1, 7, 3)), jnp.float32)
    cam_cv = jnp.einsum("bij,bpj->bpi", R_cv, X) + t_cv[:, None]
    cam_p3d = jnp.einsum("bpj,bji->bpi", X, Rp) + Tp[:, None]
    flip = np.array([-1.0, -1.0, 1.0])
    np.testing.assert_allclose(
        np.asarray(cam_p3d), np.asarray(cam_cv) * flip, atol=1e-5
    )
