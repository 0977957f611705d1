"""Look-at camera pose helpers (OpenCV convention) + pytorch3d-compatible API.

Replaces pytorch3d's look_at_view_transform / look_at_rotation (used at
reference camera_pose_optimizer.py:167, myrenderer.py:98,
pytorch3d_icp_registeration.py:111) and the reference's own numpy OpenCV
variant `look_at_view_transform_np` (batch_rendering_test.py:84-125).

All functions return OpenCV-convention extrinsics (X_cam = R @ X_world + t,
camera +x right / +y down / +z forward); use
cameras.perspective.pose_opencv_to_pytorch3d for pytorch3d-style output.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _normalize(v, eps=1e-9):
    return v / jnp.clip(jnp.linalg.norm(v, axis=-1, keepdims=True), eps, None)


def look_at_rotation_opencv(eye: jax.Array, at=None, up=None) -> jax.Array:
    """Rotation R (world->camera) for a camera at `eye` looking at `at`.

    Args: eye (..., 3); at (..., 3) default origin; up (..., 3) default +Y.
    Returns R (..., 3, 3) whose rows are the camera axes in world coordinates:
      z = normalize(at - eye) (forward), x = normalize(z × up) (right),
      y = z × x (down) — an upright image for up = world up.
    """
    eye = jnp.asarray(eye, jnp.float32)
    at = jnp.zeros_like(eye) if at is None else jnp.broadcast_to(jnp.asarray(at, jnp.float32), eye.shape)
    up = (
        jnp.broadcast_to(jnp.asarray([0.0, 1.0, 0.0], jnp.float32), eye.shape)
        if up is None
        else jnp.broadcast_to(jnp.asarray(up, jnp.float32), eye.shape)
    )
    z = _normalize(at - eye)
    x = jnp.cross(z, up)
    # Degenerate forward//up: fall back to an arbitrary orthogonal right vector.
    bad = jnp.linalg.norm(x, axis=-1, keepdims=True) < 1e-6
    alt = jnp.cross(z, jnp.asarray([1.0, 0.0, 0.0], jnp.float32))
    x = _normalize(jnp.where(bad, alt, x))
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-2)


def look_at_opencv(eye, at=None, up=None):
    """(R, t) OpenCV extrinsics for camera at `eye` looking at `at`."""
    R = look_at_rotation_opencv(eye, at, up)
    eye = jnp.asarray(eye, jnp.float32)
    t = -jnp.einsum("...ij,...j->...i", R, eye)
    return R, t


def camera_position_from_spherical_angles(
    dist, elev, azim, degrees: bool = True
) -> jax.Array:
    """Camera position on a sphere, pytorch3d parameterization:
    eye = dist * (cos(elev) sin(azim), sin(elev), cos(elev) cos(azim))."""
    dist = jnp.asarray(dist, jnp.float32)
    elev = jnp.asarray(elev, jnp.float32)
    azim = jnp.asarray(azim, jnp.float32)
    if degrees:
        elev = jnp.deg2rad(elev)
        azim = jnp.deg2rad(azim)
    dist, elev, azim = jnp.broadcast_arrays(
        jnp.atleast_1d(dist), jnp.atleast_1d(elev), jnp.atleast_1d(azim)
    )
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    return jnp.stack([x, y, z], axis=-1)


def look_at_view_transform(
    dist=1.0, elev=0.0, azim=0.0, *, degrees: bool = True, at=None, up=None,
    inplane_rotation=None,
):
    """OpenCV (R, t) for the pytorch3d-style (dist, elev, azim) viewpoint.

    Same camera placement as pytorch3d.renderer.look_at_view_transform
    (reference camera_pose_optimizer.py:161-167), expressed in OpenCV
    convention. `inplane_rotation` (radians, (...,)) optionally rolls the
    camera about its optical axis, mirroring the reference's numpy helper
    (batch_rendering_test.py:104-117).
    """
    eye = camera_position_from_spherical_angles(dist, elev, azim, degrees=degrees)
    if at is not None:
        at = jnp.broadcast_to(jnp.asarray(at, jnp.float32), eye.shape)
        eye = eye + at
    R, t = look_at_opencv(eye, at, up)
    if inplane_rotation is not None:
        theta = jnp.atleast_1d(jnp.asarray(inplane_rotation, jnp.float32))
        c, s = jnp.cos(theta), jnp.sin(theta)
        zero, one = jnp.zeros_like(c), jnp.ones_like(c)
        Rz = jnp.stack(
            [c, -s, zero, s, c, zero, zero, zero, one], axis=-1
        ).reshape(theta.shape + (3, 3))
        R = Rz @ R
        t = jnp.einsum("...ij,...j->...i", Rz, t)
    return R, t
