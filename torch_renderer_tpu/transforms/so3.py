"""SO(3) / SE(3) rotation representations, pure-JAX.

TPU-native equivalents of the pytorch3d.transforms functions consumed by the
reference (quaternion_to_matrix / matrix_to_quaternion / axis_angle_to_matrix /
euler_angles_to_matrix / quaternion_apply — see reference
camera_pose_optimizer.py:18-22, myrenderer.py:42, pytorch3d_icp_registeration.py:18).

Conventions (matching the reference's pytorch3d semantics so recorded poses and
the committed `gradient.log` convergence trace remain meaningful):
  * quaternions are (w, x, y, z), not normalized unless stated;
  * rotation matrices act on column vectors: x' = R @ x;
  * euler angles use intrinsic rotations in the axis order given by `convention`.

All functions broadcast over arbitrary leading batch dims and are jit/vmap/grad
safe (no data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quaternion_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Normalize quaternion(s) to unit norm. (..., 4) -> (..., 4)."""
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), eps, None)


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """Convert (w, x, y, z) quaternion(s) to rotation matrices.

    Args:
      q: (..., 4). Does not need to be pre-normalized (we normalize internally,
         matching pytorch3d's behavior of scaling by 2/|q|^2).
    Returns:
      (..., 3, 3) rotation matrices.
    """
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    s = 2.0 / jnp.clip(jnp.sum(q * q, axis=-1), 1e-12, None)
    rows = [
        jnp.stack([1 - s * (y * y + z * z), s * (x * y - z * w), s * (x * z + y * w)], -1),
        jnp.stack([s * (x * y + z * w), 1 - s * (x * x + z * z), s * (y * z - x * w)], -1),
        jnp.stack([s * (x * z - y * w), s * (y * z + x * w), 1 - s * (x * x + y * y)], -1),
    ]
    return jnp.stack(rows, axis=-2)


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """Rotation matrices (..., 3, 3) -> unit quaternions (..., 4), w >= 0.

    Branch-free (jit-safe) variant of the standard Shepperd method: compute all
    four candidate quaternions and select the one anchored on the largest
    diagonal combination (numerically stable for every rotation).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes of (w, x, y, z), each >= 0.
    q_abs2 = jnp.stack(
        [
            1.0 + m00 + m11 + m22,
            1.0 + m00 - m11 - m22,
            1.0 - m00 + m11 - m22,
            1.0 - m00 - m11 + m22,
        ],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.clip(q_abs2, 0.0, None))

    # Candidate quaternions, one per anchor component (rows: anchor w,x,y,z).
    cand = jnp.stack(
        [
            jnp.stack([q_abs2[..., 0], m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs2[..., 1], m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs2[..., 2], m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs2[..., 3]], -1),
        ],
        axis=-2,
    )  # (..., 4 anchors, 4)
    denom = 2.0 * jnp.clip(q_abs, 1e-8, None)
    cand = cand / denom[..., None]

    best = jnp.argmax(q_abs2, axis=-1)
    q = jnp.take_along_axis(cand, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    # Canonicalize sign (w >= 0) and normalize.
    q = q * jnp.where(q[..., :1] < 0, -1.0, 1.0)
    return quaternion_normalize(q)


def quaternion_apply(q: jax.Array, point: jax.Array) -> jax.Array:
    """Rotate point(s) (..., 3) by quaternion(s) (..., 4)."""
    w = q[..., :1]
    v = q[..., 1:]
    # x' = x + 2 w (v × x) + 2 v × (v × x)  (for unit q)
    qn = quaternion_normalize(q)
    w, v = qn[..., :1], qn[..., 1:]
    t = 2.0 * jnp.cross(v, point)
    return point + w * t + jnp.cross(v, t)


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions (..., 4) x (..., 4) -> (..., 4)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_invert(q: jax.Array) -> jax.Array:
    """Inverse (conjugate for unit) quaternion."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quaternion_distance(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """Angular distance (radians) between two unit quaternions.

    Mirrors the metric at reference pytorch3d_icp_registeration.py:187-189
    (2*acos(|<q1,q2>|)), made grad-safe by clipping.
    """
    q1 = quaternion_normalize(q1)
    q2 = quaternion_normalize(q2)
    dot = jnp.abs(jnp.sum(q1 * q2, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(dot, -1.0 + 1e-7, 1.0 - 1e-7))


def axis_angle_to_matrix(axis_angle: jax.Array) -> jax.Array:
    """Rodrigues: axis-angle vector(s) (..., 3) -> rotation matrices (..., 3, 3).

    Grad-safe at theta = 0 via Taylor-expanded sinc terms.
    """
    theta2 = jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True)[..., 0]
    small = theta2 < 1e-12
    # Sanitize BEFORE the non-series branch so its (unused) backward stays
    # finite at theta = 0 (the double-where pattern).
    theta2_safe = jnp.where(small, 1.0, theta2)
    theta = jnp.sqrt(theta2_safe)
    # sin(t)/t and (1-cos(t))/t^2 with series fallbacks near 0.
    sinc = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    cosc = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2_safe)
    x, y, z = jnp.moveaxis(axis_angle, -1, 0)
    zero = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    return eye + sinc[..., None, None] * K + cosc[..., None, None] * (K @ K)


def matrix_to_axis_angle(m: jax.Array) -> jax.Array:
    """Rotation matrices -> axis-angle vectors, via quaternion log map."""
    q = matrix_to_quaternion(m)
    w = jnp.clip(q[..., :1], -1.0, 1.0)
    v = q[..., 1:]
    vn = jnp.linalg.norm(v, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(vn[..., 0], w[..., 0])[..., None]
    axis = v / jnp.clip(vn, 1e-12, None)
    return axis * angle


def _axis_rotation(axis: str, angle: jax.Array) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, c, -s, zero, s, c)
    elif axis == "Y":
        flat = (c, zero, s, zero, one, zero, -s, zero, c)
    elif axis == "Z":
        flat = (c, -s, zero, s, c, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis!r}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Euler angles (..., 3) -> rotation matrices, intrinsic rotations.

    Matches pytorch3d.transforms.euler_angles_to_matrix semantics
    (used by reference pytorch3d_icp_evaluation.py:188 for rpy pose sampling):
    R = R(convention[0], a0) @ R(convention[1], a1) @ R(convention[2], a2).
    """
    if len(convention) != 3 or any(a not in "XYZ" for a in convention):
        raise ValueError(f"invalid convention {convention!r}")
    ms = [_axis_rotation(a, euler_angles[..., i]) for i, a in enumerate(convention)]
    return ms[0] @ ms[1] @ ms[2]


def matrix_to_euler_angles(m: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Rotation matrices -> euler angles for the XYZ convention (..., 3)."""
    if convention != "XYZ":
        raise NotImplementedError("only XYZ extraction is provided")
    sy = jnp.clip(m[..., 0, 2], -1.0, 1.0)
    y = jnp.arcsin(sy)
    x = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    z = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([x, y, z], axis=-1)


def random_rotations(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniform random rotation matrices (n, 3, 3) via uniform quaternions."""
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    return quaternion_to_matrix(quaternion_normalize(q))


def se3_compose(R1, t1, R2, t2):
    """Compose two SE(3) transforms: (R1,t1) after (R2,t2): x -> R1(R2 x + t2)+t1."""
    return R1 @ R2, (R1 @ t2[..., None])[..., 0] + t1


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -(Rt @ t[..., None])[..., 0]


def transform_points(R: jax.Array, t: jax.Array, points: jax.Array) -> jax.Array:
    """Apply x' = R @ x + t to points (..., P, 3) with R (..., 3, 3), t (..., 3).

    The batched-matmul equivalent of reference `transform_pcd_tensors`
    (pytorch3d_icp_evaluation.py:62-69): one einsum, MXU-friendly.
    """
    return jnp.einsum("...ij,...pj->...pi", R, points) + t[..., None, :]


def matrix4x4_from_rt(R: jax.Array, t: jax.Array) -> jax.Array:
    """Pack (..., 3, 3) + (..., 3) into homogeneous (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    m = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    m = m.at[..., :3, :3].set(R)
    m = m.at[..., :3, 3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def rt_from_matrix4x4(m: jax.Array):
    """Unpack homogeneous (..., 4, 4) into (R, t)."""
    return m[..., :3, :3], m[..., :3, 3]
