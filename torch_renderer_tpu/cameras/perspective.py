"""Perspective pinhole cameras — OpenCV convention, TPU-native.

The reference ingests OpenCV-style (K, R, t) everywhere and flips them into
pytorch3d's screen convention on every render call
(reference torch_renderer.py:61-80, batch_rendering_test.py:55-81,
renderer_comparison_with_pyrender.py:39-71). We instead make OpenCV the
*native* convention of the whole framework and provide explicit converters for
interop with pytorch3d-style (R, T) poses (e.g. look_at_view_transform output).

OpenCV convention used throughout:
  * camera frame: +x right, +y down, +z forward (into the scene);
  * extrinsics:  X_cam = R @ X_world + t;
  * projection:  u = fx * x/z + cx,  v = fy * y/z + cy  (pixels);
  * pixel centers at integer coordinates + 0.5; u indexes width, v height;
  * depth buffers hold camera-space z (+ in front), background = -1.0
    (same sentinel as pytorch3d's zbuf so reference post-processing like
    `relu(zbuf)` and `zbuf[zbuf == -1] = 0` carries over unchanged).

Everything is a plain pytree of arrays; cameras broadcast over a batch dim.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

import jax
import jax.numpy as jnp


def _as_batched(x, last_dims: int):
    x = jnp.asarray(x, dtype=jnp.float32)
    while x.ndim < last_dims + 1:
        x = x[None]
    return x


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PerspectiveCamera:
    """Batched pinhole camera: intrinsics in pixels + OpenCV extrinsics.

    Fields broadcast against each other on the batch (leading) dim:
      fx, fy, cx, cy: (B,) focal lengths / principal point in pixels.
      R: (B, 3, 3), t: (B, 3) with X_cam = R @ X_world + t.
    Image size is static metadata (needed for compile-time raster shapes).
    """

    fx: jax.Array
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    R: jax.Array
    t: jax.Array
    image_size: Tuple[int, int] = dataclasses.field(metadata=dict(static=True))

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_K(K, image_size: Tuple[int, int], R=None, t=None) -> "PerspectiveCamera":
        """Build from 3x3 (or (B,3,3)) pinhole matrix K, like the reference's
        DifferentiableRenderer._initialize_perspective_cameras
        (torch_renderer.py:61-71)."""
        K = _as_batched(K, 2)
        B = K.shape[0]
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)) if R is None else _as_batched(R, 2)
        t = jnp.zeros((B, 3), jnp.float32) if t is None else _as_batched(t, 1)
        return PerspectiveCamera(
            fx=K[:, 0, 0], fy=K[:, 1, 1], cx=K[:, 0, 2], cy=K[:, 1, 2],
            R=R, t=t, image_size=(int(image_size[0]), int(image_size[1])),
        )

    @staticmethod
    def from_fov(
        fov_degrees: float, image_size: Tuple[int, int], R=None, t=None
    ) -> "PerspectiveCamera":
        """FoV camera matching pytorch3d.FoVPerspectiveCameras defaults
        (fov=60, square NDC): focal = (min(H,W)/2) / tan(fov/2), principal
        point at the image center. Used by the camera-pose-optimizer workload
        (reference camera_pose_optimizer.py:105)."""
        H, W = int(image_size[0]), int(image_size[1])
        f = (min(H, W) / 2.0) / math.tan(math.radians(fov_degrees) / 2.0)
        B = 1
        if R is not None:
            R_ = _as_batched(R, 2)
            B = R_.shape[0]
        ones = jnp.ones((B,), jnp.float32)
        R = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)) if R is None else _as_batched(R, 2)
        t = jnp.zeros((B, 3), jnp.float32) if t is None else _as_batched(t, 1)
        return PerspectiveCamera(
            fx=f * ones, fy=f * ones, cx=(W / 2.0) * ones, cy=(H / 2.0) * ones,
            R=R, t=t, image_size=(H, W),
        )

    # -- derived -----------------------------------------------------------
    @property
    def batch_size(self) -> int:
        return max(self.fx.shape[0], self.R.shape[0])

    def K(self) -> jax.Array:
        """(B, 3, 3) pinhole matrices."""
        B = self.fx.shape[0]
        K = jnp.zeros((B, 3, 3), jnp.float32)
        K = K.at[:, 0, 0].set(self.fx).at[:, 1, 1].set(self.fy)
        K = K.at[:, 0, 2].set(self.cx).at[:, 1, 2].set(self.cy)
        return K.at[:, 2, 2].set(1.0)

    def replace_pose(self, R, t) -> "PerspectiveCamera":
        return dataclasses.replace(self, R=_as_batched(R, 2), t=_as_batched(t, 1))

    # -- transforms --------------------------------------------------------
    def world_to_camera(self, points: jax.Array) -> jax.Array:
        """(B?, P, 3) world -> (B, P, 3) camera frame."""
        return jnp.einsum("bij,...pj->bpi" if points.ndim == 2 else "bij,bpj->bpi",
                          self.R, points) + self.t[:, None, :]

    def project(self, points_cam: jax.Array, eps: float = 1e-8):
        """Camera-frame points (B, P, 3) -> pixel coords (B, P, 2) and z (B, P).

        z is clamped away from 0 with its sign preserved so gradients stay
        finite for points behind the camera (they are culled downstream).
        """
        z = points_cam[..., 2]
        z_safe = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
        u = self.fx[:, None] * points_cam[..., 0] / z_safe + self.cx[:, None]
        v = self.fy[:, None] * points_cam[..., 1] / z_safe + self.cy[:, None]
        return jnp.stack([u, v], axis=-1), z

    def camera_center_world(self) -> jax.Array:
        """(B, 3) camera origin in world coordinates: -R^T t."""
        return -jnp.einsum("bji,bj->bi", self.R, self.t)

    # NDC scale: pixels per NDC unit, pytorch3d "non-square NDC" convention
    # (shorter image side spans [-1, 1]). Soft-rasterization sigma/blur_radius
    # are expressed in these units so the reference's sigma=1e-4 settings
    # (torch_renderer.py:87, deform_mesh_with_color.py:153) transfer directly.
    @property
    def ndc_scale(self) -> float:
        return min(self.image_size) / 2.0


# ---------------------------------------------------------------------------
# pytorch3d-convention interop
# ---------------------------------------------------------------------------

def pose_opencv_to_pytorch3d(R: jax.Array, t: jax.Array):
    """OpenCV (R, t) -> pytorch3d (R, T), the inverse of the flip the reference
    applies at torch_renderer.py:73-80 (transpose + negate first two cols/comps).
    """
    Rp = jnp.swapaxes(R, -1, -2)
    Rp = Rp.at[..., :, :2].multiply(-1.0)
    Tp = t.at[..., :2].multiply(-1.0)
    return Rp, Tp


def pose_pytorch3d_to_opencv(R: jax.Array, T: jax.Array):
    """pytorch3d-convention (R, T) (row-vector, +x left/+y up) -> OpenCV (R, t).

    This is what lets workloads that carry pytorch3d-style poses (e.g. the
    look_at_view_transform output consumed at reference
    camera_pose_optimizer.py:167,241-242) drive the OpenCV-native renderer.
    """
    Rc = jnp.swapaxes(R, -1, -2)  # column-vector form
    flip = jnp.asarray([-1.0, -1.0, 1.0], dtype=R.dtype)
    Rcv = flip[..., :, None] * Rc
    tcv = flip * T
    return Rcv, tcv
