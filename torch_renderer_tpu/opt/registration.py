"""Batched point-cloud registration workload: synthetic data, batched ICP,
accuracy metrics.

TPU rebuild of pytorch3d_icp_registeration.py: build N source/target pairs
with known SE(3) perturbations, partial-view cropping and noise
(create_register_data, reference :77-152), register ALL of them in one
compiled batched ICP (reference :154-185 runs pytorch3d's CUDA ICP over 300
clouds), and score translation-L2 / quaternion-angle errors vs ground truth
(reference :299-330). The open3d-CPU comparison path (reference :191-238) is
an *oracle*, not a capability — apps/icp_benchmark provides a numpy stand-in.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.icp import ICPSolution, SimilarityTransform, iterative_closest_point
from ..transforms.so3 import (
    axis_angle_to_matrix,
    matrix_to_quaternion,
    quaternion_distance,
    transform_points,
)


@dataclasses.dataclass(frozen=True)
class RegisterDataConfig:
    """Perturbation scales mirroring the reference's synthetic benchmark
    (pytorch3d_icp_registeration.py:77-152): bounded random rotation angle,
    Gaussian translation, optional half-cloud crop and point noise."""

    n_objects: int = 300
    translation_std: float = 0.05
    max_angle: float = 0.3        # radians, uniform axis * uniform angle
    crop_fraction: float = 0.0    # 0.5 = keep the half-space through centroid
    noise_std: float = 0.0


def create_register_data(
    key: jax.Array, base_points: jax.Array, config: RegisterDataConfig
) -> Dict[str, jax.Array]:
    """Build a batch of (source, target) pairs with known ground truth.

    base_points: (P, 3) canonical cloud (e.g. sampled from a YCB mesh via
    ops.sample_points). target[b] = R_gt[b] @ source + t_gt[b] (+ noise),
    optionally cropped to a random half-space (partial-view, reference
    :124-137). Returns dict with source/target (B, P, 3), target_mask (B, P),
    gt_R (B, 3, 3), gt_t (B, 3).
    """
    B = config.n_objects
    base = jnp.asarray(base_points, jnp.float32)
    P = base.shape[0]
    k_ax, k_ang, k_t, k_n, k_c = jax.random.split(key, 5)

    axis = jax.random.normal(k_ax, (B, 3))
    axis = axis / jnp.clip(jnp.linalg.norm(axis, axis=-1, keepdims=True), 1e-12, None)
    angle = jax.random.uniform(k_ang, (B, 1), minval=-config.max_angle,
                               maxval=config.max_angle)
    gt_R = axis_angle_to_matrix(axis * angle)
    gt_t = config.translation_std * jax.random.normal(k_t, (B, 3))

    source = jnp.broadcast_to(base, (B, P, 3))
    target = transform_points(gt_R, gt_t, source)
    if config.noise_std > 0:
        target = target + config.noise_std * jax.random.normal(k_n, target.shape)

    if config.crop_fraction > 0:
        # keep points on one side of a random plane through the centroid
        normal = jax.random.normal(k_c, (B, 3))
        normal = normal / jnp.clip(
            jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-12, None
        )
        centroid = jnp.mean(target, axis=1, keepdims=True)
        side = jnp.einsum("bpc,bc->bp", target - centroid, normal)
        thresh = jnp.quantile(side, config.crop_fraction, axis=-1, keepdims=True)
        target_mask = (side >= thresh).astype(jnp.float32)
    else:
        target_mask = jnp.ones((B, P), jnp.float32)

    return {
        "source": source, "target": target, "target_mask": target_mask,
        "gt_R": gt_R, "gt_t": gt_t,
    }


def register_batch(
    data: Dict[str, jax.Array],
    max_iterations: int = 100,
    init_transform: Optional[SimilarityTransform] = None,
) -> ICPSolution:
    """One compiled batched ICP over every pair (reference ICP_on_GPU,
    :154-185 — but with zero per-object host work)."""
    return iterative_closest_point(
        data["source"], data["target"],
        y_mask=data["target_mask"],
        init_transform=init_transform,
        max_iterations=max_iterations,
    )


_SHARDED_ICP_JITS: Dict = {}


def register_batch_sharded(
    data: Dict[str, jax.Array],
    device_mesh,
    max_iterations: int = 100,
    init_transform: Optional[SimilarityTransform] = None,
) -> ICPSolution:
    """Multi-chip registration: the object axis sharded over the mesh's
    'data' axis. The reference sweeps up to 300 objects on one GPU
    (ICP_on_GPU + time_running_statistic, pytorch3d_icp_registeration.py
    :154-185,:240-257); here the batch spreads over ICI with ZERO
    collectives — every ICP step (NN + Umeyama SVD) is per-object.
    Uneven batches are zero-padded (init_transform included) and the
    padding sliced off. The jitted program is cached per
    (mesh, max_iterations) so repeated calls don't retrace."""
    from ..parallel.mesh import DATA_AXIS, pad_batch_to, shard_batch

    d = device_mesh.shape[DATA_AXIS]
    B = data["source"].shape[0]
    Bp = -(-B // d) * d
    padded, _ = pad_batch_to(
        {k: data[k] for k in ("source", "target", "target_mask")}, Bp
    )
    padded = shard_batch(padded, device_mesh)
    init = init_transform
    if init is not None:
        init, _ = pad_batch_to(init, Bp)  # padded rows solve zero clouds
        init = shard_batch(init, device_mesh)
    key = (id(device_mesh), int(max_iterations))
    fn = _SHARDED_ICP_JITS.get(key)
    if fn is None:
        fn = jax.jit(lambda dd, it: register_batch(dd, max_iterations, it))
        _SHARDED_ICP_JITS[key] = fn
    sol = fn(padded, init)
    return jax.tree_util.tree_map(lambda x: x[:B], sol)


def evaluate_registration(
    sol: ICPSolution, gt_R: jax.Array, gt_t: jax.Array
) -> Dict[str, jax.Array]:
    """Translation-L2 (m) and rotation-angle (rad) errors per object —
    the reference's accuracy scatter metrics (:299-330)."""
    trans_err = jnp.linalg.norm(sol.RTs.t - gt_t, axis=-1)
    q_est = matrix_to_quaternion(sol.RTs.R)
    q_gt = matrix_to_quaternion(gt_R)
    rot_err = quaternion_distance(q_est, q_gt)
    return {
        "trans_err": trans_err,
        "rot_err": rot_err,
        "rmse": sol.rmse,
        "converged": sol.converged,
        "mean_trans_err": jnp.mean(trans_err),
        "mean_rot_err": jnp.mean(rot_err),
    }


def icp_cpu_reference(source, target, max_iterations: int = 100):
    """Pure-numpy single-cloud ICP — the CPU oracle standing in for the
    reference's open3d registration_icp baseline (:191-238; open3d is not in
    this image). Returns (R (3,3), t (3,), rmse)."""
    import numpy as np

    X = np.asarray(source, np.float64)
    Y = np.asarray(target, np.float64)
    R = np.eye(3)
    t = np.zeros(3)
    prev = np.inf
    for _ in range(max_iterations):
        Xt = X @ R.T + t
        d2 = ((Xt[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
        idx = d2.argmin(axis=1)
        matched = Y[idx]
        rmse = float(np.sqrt(d2.min(axis=1).mean()))
        mx, my = X.mean(0), matched.mean(0)
        cov = (matched - my).T @ (X - mx)
        U, _, Vt = np.linalg.svd(cov)
        D = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
        R = U @ D @ Vt
        t = my - R @ mx
        if abs(prev - rmse) < 1e-9:
            break
        prev = rmse
    return R, t, prev
