"""Global pose search by chamfer-scored GMM cross-entropy — fully on-device.

TPU rebuild of the reference's ICPTensorEvalutor (pytorch3d_icp_evaluation.py
:117-341): sample pose hypotheses (Gaussian translation around the target
centroid + uniform rpy), score ALL of them with one batched chamfer call,
fit a diagonal GMM to the elite set and resample for N EM iterations.

The reference ping-pongs device<->host every iteration (kaolin chamfer on GPU,
sklearn GaussianMixture on CPU — SURVEY.md §3.5). Here scoring, elite
selection, GMM fit (ops/gmm.py) and resampling are ONE jitted lax.scan:
zero host round-trips for the whole search.

Also provides the chamfer loss-landscape evaluation of
chamfer_loss_evaluation.py:77-201 (is chamfer a good pose metric?).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.gmm import gmm_fit, gmm_sample
from ..ops.knn_chamfer import chamfer_distance
from ..transforms.so3 import (
    euler_angles_to_matrix,
    matrix_to_euler_angles,
    matrix_to_quaternion,
    quaternion_distance,
    transform_points,
)


def poses6d_to_Rt(poses: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(H, 6) [x y z roll pitch yaw] -> R (H, 3, 3), t (H, 3).

    rpy uses the XYZ intrinsic convention, matching the reference's
    euler_angles_to_matrix call at pytorch3d_icp_evaluation.py:188."""
    return euler_angles_to_matrix(poses[:, 3:], "XYZ"), poses[:, :3]


def chamfer_scores(
    ref_points: jax.Array,
    target_points: jax.Array,
    poses: jax.Array,
    target_mask: Optional[jax.Array] = None,
) -> jax.Array:
    """Chamfer of ref transformed by each pose vs the target: (H,).

    One batched call over all hypotheses — the kaolin-chamfer-over-400-poses
    pattern at pytorch3d_icp_evaluation.py:191-199, without the host argsort.
    """
    H = poses.shape[0]
    R, t = poses6d_to_Rt(poses)
    moved = transform_points(R, t, jnp.broadcast_to(ref_points, (H,) + ref_points.shape))
    tgt = jnp.broadcast_to(target_points, (H,) + target_points.shape)
    tm = (
        jnp.broadcast_to(target_mask, (H,) + target_mask.shape)
        if target_mask is not None else None
    )
    cham, _ = chamfer_distance(moved, tgt, y_mask=tm, batch_reduction=None)
    return cham


@dataclasses.dataclass(frozen=True)
class PoseSearchConfig:
    """Reference scale: 400 hypotheses, elite 100, 10 EM iterations
    (pytorch3d_icp_evaluation.py:171-239)."""

    n_hypotheses: int = 400
    n_elite: int = 100
    n_iters: int = 10
    n_components: int = 5
    translation_std: float = 0.1
    gmm_em_iters: int = 15
    reg_covar: float = 1e-6


class GMMPoseSearch:
    """Cross-entropy pose search over SE(3) parameterized as 6D xyz+rpy."""

    def __init__(self, ref_points: jax.Array, config: PoseSearchConfig = PoseSearchConfig()):
        self.ref_points = jnp.asarray(ref_points, jnp.float32)
        self.config = config
        self._search_jit = jax.jit(self._search)
        self._batch_jit = jax.jit(jax.vmap(self._search))
        self._sharded_jits = {}  # id(mesh) -> jitted sharded search

    # -- initial hypothesis sampling (reference :171-175) --------------------
    def _init_poses(self, key: jax.Array, target_points, target_mask) -> jax.Array:
        cfg = self.config
        kt, kr = jax.random.split(key)
        if target_mask is not None:
            m = target_mask[:, None]
            centroid = jnp.sum(target_points * m, axis=0) / jnp.clip(
                jnp.sum(target_mask), 1.0, None
            )
        else:
            centroid = jnp.mean(target_points, axis=0)
        trans = centroid + cfg.translation_std * jax.random.normal(
            kt, (cfg.n_hypotheses, 3)
        )
        rpy = jax.random.uniform(
            kr, (cfg.n_hypotheses, 3), minval=-jnp.pi, maxval=jnp.pi
        )
        return jnp.concatenate([trans, rpy], axis=-1)

    def _search(self, key, target_points, target_mask, chamfer=chamfer_scores):
        cfg = self.config
        k_init, k_scan = jax.random.split(key)
        poses = self._init_poses(k_init, target_points, target_mask)
        scores = chamfer(self.ref_points, target_points, poses, target_mask)

        def elite(poses, scores):
            neg, idx = jax.lax.top_k(-scores, cfg.n_elite)
            return poses[idx], -neg

        e_poses, e_scores = elite(poses, scores)
        best_pose = e_poses[0]
        best_score = e_scores[0]

        def body(carry, k):
            e_poses, best_pose, best_score = carry
            kf, ks = jax.random.split(k)
            gmm = gmm_fit(
                kf, e_poses, cfg.n_components,
                n_iter=cfg.gmm_em_iters, reg_covar=cfg.reg_covar,
            )
            poses = gmm_sample(ks, gmm, cfg.n_hypotheses)
            scores = chamfer(
                self.ref_points, target_points, poses, target_mask
            )
            e_poses, e_scores = elite(poses, scores)
            improved = e_scores[0] < best_score
            best_pose = jnp.where(improved, e_poses[0], best_pose)
            best_score = jnp.where(improved, e_scores[0], best_score)
            # per-iteration population + fitted GMM ride the scan outputs
            # (tiny: (H, 6) + (C, 6) leaves x n_iters) — the reference's
            # main diagnostic is a per-EM-iteration scatter+ellipse plot
            # of the hypothesis population saved to PUResults/
            # (pytorch3d_icp_evaluation.py:244-279); utils.plotting.
            # plot_gmm_ellipses + apps/pose_search.py --plot-dir render
            # the same artifact from these
            per_iter = (best_score, e_scores[0], poses, scores,
                        gmm.means, gmm.var, gmm.weights)
            return (e_poses, best_pose, best_score), per_iter

        keys = jax.random.split(k_scan, cfg.n_iters)
        (e_poses, best_pose, best_score), outs = jax.lax.scan(
            body, (e_poses, best_pose, best_score), keys
        )
        (best_hist, elite_hist, iter_poses, iter_scores,
         gmm_means, gmm_var, gmm_weights) = outs
        R, t = poses6d_to_Rt(best_pose[None])
        return {
            "pose6d": best_pose,
            "R": R[0],
            "t": t[0],
            "score": best_score,
            "best_history": best_hist,
            "elite_best_history": elite_hist,
            "final_elite": e_poses,
            "iter_poses": iter_poses,        # (n_iters, H, 6)
            "iter_scores": iter_scores,      # (n_iters, H)
            "gmm_means": gmm_means,          # (n_iters, C, 6)
            "gmm_var": gmm_var,              # (n_iters, C, 6)
            "gmm_weights": gmm_weights,      # (n_iters, C)
        }

    def _sharded_search_fn(self, device_mesh):
        """Jitted search with the HYPOTHESIS axis sharded over the mesh's
        'data' axis: each device scores n_hypotheses/d chamfer hypotheses
        locally (the reference's kaolin-chamfer-over-400 sweep spread over
        ICI); elite selection / GMM fit / resampling stay replicated (tiny,
        (H,) and (E, 6) arrays). The only collective is the implicit
        all-gather of the (H,) score vector before top_k."""
        from jax.sharding import PartitionSpec as P

        from ..parallel.mesh import DATA_AXIS

        from jax import shard_map

        d = device_mesh.shape[DATA_AXIS]
        cfg = self.config
        if cfg.n_hypotheses % d:
            raise ValueError(
                f"n_hypotheses={cfg.n_hypotheses} must divide by the mesh "
                f"'data' axis size {d} (round it up to a multiple)"
            )

        sharded_chamfer = shard_map(
            chamfer_scores,
            mesh=device_mesh,
            in_specs=(P(), P(), P(DATA_AXIS, None), P()),
            out_specs=P(DATA_AXIS),
        )
        return jax.jit(
            lambda k, tp, tm: self._search(k, tp, tm, chamfer=sharded_chamfer)
        )

    def search(
        self, key: jax.Array, target_points: jax.Array,
        target_mask: Optional[jax.Array] = None,
        device_mesh=None,
    ) -> Dict[str, jax.Array]:
        """Run the full search. target_points (M, 3); optional (M,) mask.

        device_mesh: optional jax.sharding.Mesh (parallel.mesh.make_mesh) —
        shards the chamfer hypothesis sweep over the mesh's 'data' axis.
        Identical results to the single-device path (per-hypothesis math is
        unchanged; sharding only splits the hypothesis batch)."""
        target_points = jnp.asarray(target_points, jnp.float32)
        if target_mask is None:
            # pass an all-ones mask so the jitted signature stays stable
            target_mask = jnp.ones(target_points.shape[0], jnp.float32)
        if device_mesh is not None:
            fn = self._sharded_jits.get(id(device_mesh))
            if fn is None:
                fn = self._sharded_search_fn(device_mesh)
                self._sharded_jits[id(device_mesh)] = fn
            return fn(key, target_points, target_mask)
        return self._search_jit(key, target_points, target_mask)

    def search_batch(
        self, key: jax.Array, target_points: jax.Array,
        target_mask: Optional[jax.Array] = None,
        device_mesh=None,
    ) -> Dict[str, jax.Array]:
        """Vmapped search over a batch of targets (B, M, 3) — B independent
        global pose searches in ONE compiled program (the serving-scale
        version of the reference's one-object loop). Returned leaves gain a
        leading batch dim.

        device_mesh: optional Mesh — shards the TARGET batch over 'data'
        (one independent search per device group, zero collectives in the
        hot path). B is zero-padded up to a multiple of the axis size and
        the padding is sliced off the results."""
        target_points = jnp.asarray(target_points, jnp.float32)
        B = target_points.shape[0]
        if target_mask is None:
            target_mask = jnp.ones(target_points.shape[:2], jnp.float32)
        keys = jax.random.split(key, B)
        if device_mesh is None:
            return self._batch_jit(keys, target_points, target_mask)

        from ..parallel.mesh import DATA_AXIS, pad_batch_to, shard_batch

        d = device_mesh.shape[DATA_AXIS]
        Bp = -(-B // d) * d
        (keys, target_points, target_mask), _ = pad_batch_to(
            (keys, target_points, target_mask), Bp
        )
        args = shard_batch((keys, target_points, target_mask), device_mesh)
        out = self._batch_jit(*args)
        return jax.tree_util.tree_map(lambda x: x[:B], out)


# ---------------------------------------------------------------------------
# Chamfer loss-landscape evaluation (chamfer_loss_evaluation.py parity)
# ---------------------------------------------------------------------------

def pose_errors(
    poses: jax.Array, gt_R: jax.Array, gt_t: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Translation L2 and rotation angle (rad) of each 6D pose vs ground truth
    (the reference's metrics at chamfer_loss_evaluation.py:140-157)."""
    R, t = poses6d_to_Rt(poses)
    trans_err = jnp.linalg.norm(t - gt_t[None], axis=-1)
    q = matrix_to_quaternion(R)
    q_gt = matrix_to_quaternion(gt_R)
    rot_err = quaternion_distance(q, jnp.broadcast_to(q_gt, q.shape))
    return trans_err, rot_err


def chamfer_loss_landscape(
    key: jax.Array,
    ref_points: jax.Array,
    gt_R: jax.Array,
    gt_t: jax.Array,
    n_poses: int = 1000,
    translation_std: float = 0.1,
    rotation_std: float = 0.5,
    target_points: Optional[jax.Array] = None,
) -> Dict[str, jax.Array]:
    """Sample n_poses perturbations around the GT pose, score each with
    chamfer, and return (chamfer, translation error, rotation error) arrays —
    the scatter data of chamfer_loss_evaluation.py:105-157."""
    ref_points = jnp.asarray(ref_points, jnp.float32)
    if target_points is None:
        target_points = transform_points(gt_R, gt_t, ref_points)
    kt, kr = jax.random.split(key)
    gt_rpy = matrix_to_euler_angles(gt_R, "XYZ")
    trans = gt_t[None] + translation_std * jax.random.normal(kt, (n_poses, 3))
    rpy = gt_rpy[None] + rotation_std * jax.random.normal(kr, (n_poses, 3))
    poses = jnp.concatenate([trans, rpy], axis=-1)

    cham = chamfer_scores(ref_points, target_points, poses)
    trans_err, rot_err = pose_errors(poses, gt_R, gt_t)
    return {
        "poses6d": poses, "chamfer": cham,
        "trans_err": trans_err, "rot_err": rot_err,
    }
