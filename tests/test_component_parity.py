"""Tests for the long-tail parity components: finite-difference pose fit,
vertex-color transfer, gated baselines, metrics logger."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.color_transfer import query_vertex_colors
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.opt.pose_fit_fd import (
    FDPoseFitConfig,
    FiniteDifferencePoseFitter,
    finite_difference_grad,
)
from torch_renderer_tpu.structures.meshes import Meshes
from torch_renderer_tpu.utils.metrics import MetricLogger


def test_finite_difference_grad_matches_analytic():
    A = jnp.asarray(np.random.default_rng(0).standard_normal((4, 4)).astype(np.float32))
    A = A @ A.T + jnp.eye(4)

    def f(x):
        return 0.5 * x @ A @ x

    x = jnp.asarray([0.3, -0.5, 0.8, 0.1])
    g_fd = finite_difference_grad(f, x, eps=1e-3)
    g_true = A @ x
    np.testing.assert_allclose(np.asarray(g_fd), np.asarray(g_true), atol=1e-2)


def test_fd_pose_fit_improves():
    IMAGE = (48, 48)
    f = 0.9 * IMAGE[0]
    K = np.array([[f, 0, 24], [0, f, 24], [0, 0, 1]], np.float32)
    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces)

    fitter = FiniteDifferencePoseFitter(
        K, IMAGE, FDPoseFitConfig(step_size=0.02, eps=2e-3)
    )
    gt = fitter.pack([0.0, 0.0, 0.0], [0.0, 0.0, 3.0])
    ref_depth = fitter.render_depth(meshes, gt)

    start = fitter.pack([0.05, -0.04, 0.0], [0.08, -0.06, 3.15])
    params, hist = fitter.fit(meshes, ref_depth, start, n_steps=40)
    losses = np.asarray(hist["loss"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < float(fitter.loss(start, meshes, ref_depth))
    # translation moved toward GT
    err0 = np.linalg.norm(np.asarray(start[3:]) - np.asarray(gt[3:]))
    err1 = np.linalg.norm(np.asarray(params[3:]) - np.asarray(gt[3:]))
    assert err1 < err0


def test_query_vertex_colors_exact_and_knn():
    ref_v = jnp.asarray([[0.0, 0, 0], [1, 0, 0], [0, 1, 0]])[None]
    ref_c = jnp.asarray([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]])[None]
    q = jnp.asarray([[0.01, 0, 0], [0.9, 0.05, 0]])[None]
    c1 = np.asarray(query_vertex_colors(q, ref_v, ref_c))
    np.testing.assert_allclose(c1[0, 0], [1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(c1[0, 1], [0, 1, 0], atol=1e-6)
    ck = np.asarray(query_vertex_colors(q, ref_v, ref_c, k=2))
    assert ck.shape == (1, 2, 3)
    assert 0.5 < ck[0, 0, 0] <= 1.0  # nearest dominates the idw blend


def test_visraytrace_matches_depth_render():
    """The always-available cross-renderer oracle (baselines.VisRaytrace,
    the executable stand-in for the reference's pyrender gate at
    renderer_comparison_with_pyrender.py:254-259) agrees with DepthRender
    through the VisPyrender-shaped extrinsic surface."""
    import numpy as np

    from torch_renderer_tpu.baselines import VisRaytrace
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.renderer import DepthRender
    from torch_renderer_tpu.structures.meshes import Meshes

    H, W = 48, 64
    K = np.array([[70.0, 0, 25.0], [0, 65.0, 27.0], [0, 0, 1.0]], np.float32)
    c, s = np.cos(0.3), np.sin(0.3)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    t = np.array([0.02, -0.01, 2.7], np.float32)
    verts, faces = icosphere(2)

    ours = np.asarray(
        DepthRender(K, (H, W)).render(
            Meshes.from_single(verts, faces), R[None], t[None]
        )
    )[0]
    ext = np.eye(4)
    ext[:3, :3], ext[:3, 3] = R, t
    oracle = VisRaytrace((H, W)).quick_depth_render(verts, faces, K, ext)

    both = (ours > 0) & (oracle > 0)
    union = (ours > 0) | (oracle > 0)
    assert both.sum() / union.sum() > 0.99
    interior = both.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            interior &= np.roll(both, (dy, dx), axis=(0, 1))
    assert np.abs(ours - oracle)[interior].max() < 2e-3


def test_baselines_gated_cleanly():
    from torch_renderer_tpu import baselines

    if not baselines.pyrender_available():
        with pytest.raises(ImportError):
            baselines.VisPyrender((64, 64))
    if not baselines.open3d_available():
        with pytest.raises(ImportError):
            baselines.open3d_registration_icp(
                np.zeros((4, 3)), np.zeros((4, 3))
            )


def test_metric_logger_jsonl(tmp_path):
    path = str(tmp_path / "metrics.jsonl")
    logger = MetricLogger(jsonl_path=path)
    hist = {"loss": jnp.asarray([3.0, 2.0, 1.0]), "iou": jnp.asarray([0.1, 0.5, 0.9])}
    logger.log_history(hist)
    logger.close()
    rows = [json.loads(l) for l in open(path)]
    assert len(rows) == 3
    assert rows[2]["loss"] == 1.0 and rows[2]["step"] == 2
