"""GMM pose search, chamfer landscape, and ICP registration workload tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.opt.pose_search import (
    GMMPoseSearch,
    PoseSearchConfig,
    chamfer_loss_landscape,
    chamfer_scores,
    pose_errors,
    poses6d_to_Rt,
)
from torch_renderer_tpu.opt.registration import (
    RegisterDataConfig,
    create_register_data,
    evaluate_registration,
    icp_cpu_reference,
    register_batch,
)
from torch_renderer_tpu.transforms.so3 import (
    euler_angles_to_matrix,
    transform_points,
)


@pytest.fixture(scope="module")
def cloud():
    """Asymmetric cloud (a sphere is rotation-degenerate for pose search)."""
    verts, _ = icosphere(2)
    pts = verts * np.array([1.0, 0.6, 0.3], np.float32)
    pts[:40] += np.array([0.8, 0.0, 0.0], np.float32)  # break symmetry
    return jnp.asarray(pts)


def test_chamfer_scores_zero_at_gt(cloud):
    gt_rpy = jnp.asarray([0.3, -0.2, 0.5])
    gt_t = jnp.asarray([0.1, 0.2, -0.1])
    R = euler_angles_to_matrix(gt_rpy, "XYZ")
    target = transform_points(R, gt_t, cloud)
    poses = jnp.concatenate([gt_t, gt_rpy])[None]
    s = chamfer_scores(cloud, target, poses)
    assert float(s[0]) < 1e-6  # f32 matmul-expansion residual


def test_pose_errors_zero_at_gt():
    gt_rpy = jnp.asarray([0.3, -0.2, 0.5])
    gt_t = jnp.asarray([0.1, 0.2, -0.1])
    gt_R = euler_angles_to_matrix(gt_rpy, "XYZ")
    poses = jnp.concatenate([gt_t, gt_rpy])[None]
    te, re = pose_errors(poses, gt_R, gt_t)
    assert float(te[0]) < 1e-6
    assert float(re[0]) < 1e-3


def test_gmm_pose_search_improves_over_iterations(cloud):
    gt_rpy = np.array([0.4, -0.3, 0.8], np.float32)
    gt_t = np.array([0.15, -0.1, 0.2], np.float32)
    R = euler_angles_to_matrix(jnp.asarray(gt_rpy), "XYZ")
    target = transform_points(R, jnp.asarray(gt_t), cloud)

    cfg = PoseSearchConfig(n_hypotheses=256, n_elite=64, n_iters=8,
                           translation_std=0.3)
    searcher = GMMPoseSearch(cloud, cfg)
    out = searcher.search(jax.random.PRNGKey(0), target)

    hist = np.asarray(out["best_history"])
    assert np.all(np.isfinite(hist))
    assert hist[-1] <= hist[0]
    # the found pose must place the cloud close to the target
    assert float(out["score"]) < 0.05
    moved = transform_points(out["R"][None], out["t"][None], cloud[None])
    err = float(jnp.mean(jnp.linalg.norm(moved[0] - target, axis=-1)))
    assert err < 0.5  # coarse global alignment (ICP refines from here)


def test_chamfer_landscape_correlates_with_pose_error(cloud):
    gt_R = jnp.eye(3)
    gt_t = jnp.asarray([0.0, 0.0, 0.0])
    out = chamfer_loss_landscape(
        jax.random.PRNGKey(1), cloud, gt_R, gt_t, n_poses=400,
        translation_std=0.2, rotation_std=0.4,
    )
    cham = np.asarray(out["chamfer"])
    terr = np.asarray(out["trans_err"])
    assert np.all(np.isfinite(cham))
    # chamfer must correlate positively with translation error
    corr = np.corrcoef(cham, terr)[0, 1]
    assert corr > 0.3


class TestRegistration:
    def test_exact_recovery_no_noise(self, cloud):
        cfg = RegisterDataConfig(n_objects=16, translation_std=0.05,
                                 max_angle=0.3)
        data = create_register_data(jax.random.PRNGKey(2), cloud, cfg)
        sol = register_batch(data, max_iterations=60)
        m = evaluate_registration(sol, data["gt_R"], data["gt_t"])
        assert float(m["mean_trans_err"]) < 1e-3
        assert float(m["mean_rot_err"]) < 1e-2

    def test_noisy_cropped_still_reasonable(self, cloud):
        cfg = RegisterDataConfig(n_objects=8, translation_std=0.03,
                                 max_angle=0.2, crop_fraction=0.3,
                                 noise_std=0.005)
        data = create_register_data(jax.random.PRNGKey(3), cloud, cfg)
        sol = register_batch(data, max_iterations=80)
        m = evaluate_registration(sol, data["gt_R"], data["gt_t"])
        # partial-view matching biases ICP toward the visible half (the
        # reference's partial-view study shows the same degradation)
        assert float(m["mean_trans_err"]) < 0.2
        assert float(m["mean_rot_err"]) < 0.5

    def test_matches_cpu_reference(self, cloud):
        cfg = RegisterDataConfig(n_objects=2, translation_std=0.03, max_angle=0.2)
        data = create_register_data(jax.random.PRNGKey(4), cloud, cfg)
        sol = register_batch(data, max_iterations=50)
        R_cpu, t_cpu, _ = icp_cpu_reference(
            np.asarray(data["source"][0]), np.asarray(data["target"][0]),
            max_iterations=50,
        )
        np.testing.assert_allclose(np.asarray(sol.RTs.R[0]), R_cpu, atol=1e-3)
        np.testing.assert_allclose(np.asarray(sol.RTs.t[0]), t_cpu, atol=1e-3)


def test_batched_pose_search(cloud):
    """vmapped multi-target search: one compiled program, per-target poses."""
    B = 3
    rpys = jnp.asarray([[0.3, -0.2, 0.5], [0.0, 0.4, -0.6], [-0.5, 0.1, 0.2]])
    ts = jnp.asarray([[0.1, 0.0, 0.1], [0.0, 0.15, -0.05], [-0.1, 0.05, 0.0]])
    Rs = euler_angles_to_matrix(rpys, "XYZ")
    targets = transform_points(Rs, ts, jnp.broadcast_to(cloud, (B,) + cloud.shape))

    cfg = PoseSearchConfig(n_hypotheses=192, n_elite=48, n_iters=5,
                           translation_std=0.25)
    searcher = GMMPoseSearch(cloud, cfg)
    out = searcher.search_batch(jax.random.PRNGKey(0), targets)
    assert out["pose6d"].shape == (B, 6)
    assert out["R"].shape == (B, 3, 3)
    scores = np.asarray(out["score"])
    assert np.all(np.isfinite(scores))
    assert (scores < 0.12).all()  # every target coarsely aligned
