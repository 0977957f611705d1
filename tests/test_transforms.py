"""Unit tests for SO(3)/SE(3) transforms against scipy (the oracle the
reference itself trusts: scipy.spatial.transform.Rotation is imported at
reference torch_renderer.py:9, chamfer_loss_evaluation.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from torch_renderer_tpu.transforms import so3


def random_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def test_quaternion_to_matrix_matches_scipy(rng):
    q = random_quats(rng, 32).astype(np.float32)
    ours = np.asarray(so3.quaternion_to_matrix(jnp.asarray(q)))
    # scipy uses (x, y, z, w) ordering
    theirs = Rotation.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_matrix_quaternion_roundtrip(rng):
    q = random_quats(rng, 64).astype(np.float32)
    q[q[:, 0] < 0] *= -1  # canonical hemisphere
    m = so3.quaternion_to_matrix(jnp.asarray(q))
    q2 = np.asarray(so3.matrix_to_quaternion(m))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_matrix_to_quaternion_near_identity_and_pi():
    # Degenerate anchors of the Shepperd extraction.
    for R in [np.eye(3), Rotation.from_rotvec([np.pi, 0, 0]).as_matrix(),
              Rotation.from_rotvec([0, np.pi - 1e-4, 0]).as_matrix()]:
        q = np.asarray(so3.matrix_to_quaternion(jnp.asarray(R, jnp.float32)))
        R2 = np.asarray(so3.quaternion_to_matrix(jnp.asarray(q)))
        np.testing.assert_allclose(R2, R, atol=1e-5)


def test_axis_angle_matches_scipy(rng):
    aa = rng.normal(size=(16, 3)).astype(np.float32)
    ours = np.asarray(so3.axis_angle_to_matrix(jnp.asarray(aa)))
    theirs = Rotation.from_rotvec(aa).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)
    # Zero rotation is grad-safe and exact.
    z = np.asarray(so3.axis_angle_to_matrix(jnp.zeros(3)))
    np.testing.assert_allclose(z, np.eye(3), atol=1e-6)
    g = jax.grad(lambda a: so3.axis_angle_to_matrix(a).sum())(jnp.zeros(3))
    assert bool(jnp.all(jnp.isfinite(g)))


def test_euler_angles_matches_scipy(rng):
    ang = rng.uniform(-np.pi, np.pi, size=(16, 3)).astype(np.float32)
    ours = np.asarray(so3.euler_angles_to_matrix(jnp.asarray(ang), "XYZ"))
    theirs = Rotation.from_euler("XYZ", ang).as_matrix()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_quaternion_apply_consistent_with_matrix(rng):
    q = jnp.asarray(random_quats(rng, 8).astype(np.float32))
    p = jnp.asarray(rng.normal(size=(8, 3)).astype(np.float32))
    via_mat = jnp.einsum("bij,bj->bi", so3.quaternion_to_matrix(q), p)
    via_q = so3.quaternion_apply(q, p)
    np.testing.assert_allclose(np.asarray(via_q), np.asarray(via_mat), atol=1e-5)


def test_quaternion_distance():
    q1 = jnp.asarray([[1.0, 0, 0, 0]])
    aa = Rotation.from_rotvec([0.3, 0, 0])
    q2 = jnp.asarray(aa.as_quat()[[3, 0, 1, 2]], jnp.float32)[None]
    d = float(so3.quaternion_distance(q1, q2)[0])
    assert abs(d - 0.3) < 1e-3


def test_se3_helpers(rng):
    R = jnp.asarray(Rotation.random(4, rng).as_matrix(), jnp.float32)
    t = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    Ri, ti = so3.se3_inverse(R, t)
    Rc, tc = so3.se3_compose(R, t, Ri, ti)
    np.testing.assert_allclose(np.asarray(Rc), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.asarray(tc), 0, atol=1e-5)
    m = so3.matrix4x4_from_rt(R, t)
    R2, t2 = so3.rt_from_matrix4x4(m)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R))
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t))


def test_transform_points_matches_loop(rng):
    R = jnp.asarray(Rotation.random(3, rng).as_matrix(), jnp.float32)
    t = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
    p = jnp.asarray(rng.normal(size=(3, 10, 3)), jnp.float32)
    out = so3.transform_points(R, t, p)
    ref = np.stack([np.asarray(p[b]) @ np.asarray(R[b]).T + np.asarray(t[b]) for b in range(3)])
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)
