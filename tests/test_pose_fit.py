"""Pose-fit workload tests: loss shape/finiteness, convergence, occlusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.opt.pose_fit import (
    CameraPoseFitter,
    DepthPoseFitter,
    PoseFitConfig,
    huber_loss,
    iou,
    patch_occlusion,
    pose_params_from_Rt,
    pose_params_to_Rt,
)
from torch_renderer_tpu.structures.meshes import Meshes


IMAGE = (64, 64)


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces)
    f = 0.8 * IMAGE[0]
    K = np.array(
        [[f, 0, IMAGE[1] / 2], [0, f, IMAGE[0] / 2], [0, 0, 1]], np.float32
    )
    R_gt = np.eye(3, dtype=np.float32)
    t_gt = np.array([0.0, 0.0, 3.0], np.float32)
    return meshes, K, R_gt, t_gt


def test_huber_matches_definition():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 3.0])
    got = huber_loss(x, jnp.zeros_like(x), delta=1.0)
    expect = jnp.where(jnp.abs(x) <= 1.0, 0.5 * x * x, jnp.abs(x) - 0.5)
    np.testing.assert_allclose(got, expect, rtol=1e-6)


def test_patch_occlusion_zeroes_patch():
    img = jnp.ones((2, 32, 32))
    out = patch_occlusion(jax.random.PRNGKey(0), img, patch_size=8)
    out = np.asarray(out)
    assert out.shape == (2, 32, 32)
    # exactly one 8x8 patch per image zeroed
    assert np.allclose(np.sum(out == 0, axis=(1, 2)), 64)


def test_pose_params_roundtrip(scene):
    _, _, R_gt, t_gt = scene
    params = pose_params_from_Rt(R_gt, t_gt)
    R, t = pose_params_to_Rt(params)
    np.testing.assert_allclose(np.asarray(R)[0], R_gt, atol=1e-5)
    np.testing.assert_allclose(np.asarray(t)[0], t_gt, atol=1e-6)


def test_loss_zero_at_ground_truth(scene):
    meshes, K, R_gt, t_gt = scene
    fitter = DepthPoseFitter(K, IMAGE)
    refs = fitter.make_references(meshes, R_gt, t_gt)
    loss, metrics = fitter.loss(pose_params_from_Rt(R_gt, t_gt), meshes, refs)
    assert float(loss) < 1e-5
    # soft silhouette (>0.5) vs hard depth mask disagree on the blur band;
    # at 64^2 the boundary ring costs a few % IoU.
    assert float(metrics["iou"]) > 0.85


def test_depth_fit_converges(scene):
    meshes, K, R_gt, t_gt = scene
    fitter = DepthPoseFitter(K, IMAGE, PoseFitConfig(lr=5e-3, use_rgb=False))
    refs = fitter.make_references(meshes, R_gt, t_gt)
    t0 = t_gt + np.array([0.15, -0.1, 0.2], np.float32)
    params0 = pose_params_from_Rt(R_gt, t0)

    params, hist = fitter.fit(meshes, refs, params0, n_steps=60)
    losses = np.asarray(hist["loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.5 * losses[0]

    _, t_fit = pose_params_to_Rt(params)
    err0 = np.linalg.norm(t0 - t_gt)
    err1 = np.linalg.norm(np.asarray(t_fit)[0] - t_gt)
    assert err1 < 0.6 * err0


def test_rgb_fitter_loss_finite_with_gradients(scene):
    meshes, K, R_gt, t_gt = scene
    fitter = CameraPoseFitter(K, IMAGE, PoseFitConfig(use_rgb=True))
    refs = fitter.make_references(
        meshes, R_gt, t_gt, occlusion_key=jax.random.PRNGKey(1), patch_size=10
    )
    params = pose_params_from_Rt(R_gt, t_gt + np.array([0.05, 0, 0.1], np.float32))
    (loss, metrics), grads = jax.value_and_grad(fitter.loss, has_aux=True)(
        params, meshes, refs
    )
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert np.all(np.isfinite(np.asarray(leaf)))
    assert float(jnp.abs(grads["t"]).sum()) > 0


def test_recorded_depth_references():
    depth = jnp.zeros((24, 32)).at[8:16, 10:20].set(2.0)
    refs = DepthPoseFitter.references_from_recorded(depth)
    assert refs["depth"].shape == (1, 24, 32)
    np.testing.assert_allclose(refs["mask"], refs["sil"])
    assert float(refs["mask"].sum()) == 80


def test_iou_metric():
    a = jnp.zeros((1, 8, 8)).at[:, :4].set(1.0)
    assert float(iou(a, a)[0]) == pytest.approx(1.0, abs=1e-6)
    b = jnp.zeros((1, 8, 8)).at[:, 2:6].set(1.0)
    assert float(iou(a, b)[0]) == pytest.approx(1.0 / 3.0, abs=1e-5)


def test_pallas_silhouette_fitter_converges(scene):
    """silhouette_impl='pallas': exact all-faces silhouette + K=1 fragments."""
    meshes, K, R_gt, t_gt = scene
    fitter = DepthPoseFitter(
        K, IMAGE, PoseFitConfig(lr=5e-3, use_rgb=False),
        silhouette_impl="pallas", faces_per_tile=80,
    )
    refs = fitter.make_references(meshes, R_gt, t_gt)
    t0 = t_gt + np.array([0.12, -0.08, 0.15], np.float32)
    params, hist = fitter.fit(meshes, refs, pose_params_from_Rt(R_gt, t0),
                              n_steps=40)
    losses = np.asarray(hist["loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.6 * losses[0]
    _, t_fit = pose_params_to_Rt(params)
    assert np.linalg.norm(np.asarray(t_fit)[0] - t_gt) < np.linalg.norm(t0 - t_gt)
