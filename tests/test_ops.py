"""Ops-layer tests: chamfer vs O(N^2) numpy, sampling statistics, mesh-loss
analytics, ICP vs closed-form Umeyama, GMM recovery (SURVEY.md §4 plan)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from torch_renderer_tpu.ops import gmm as gmm_ops
from torch_renderer_tpu.ops import icp as icp_ops
from torch_renderer_tpu.ops import knn_chamfer as kc
from torch_renderer_tpu.ops import mesh_losses as ml
from torch_renderer_tpu.ops.icosphere import cube, icosphere
from torch_renderer_tpu.ops.sample_points import sample_points_from_meshes
from torch_renderer_tpu.structures.meshes import Meshes
from torch_renderer_tpu.structures.pointclouds import Pointclouds


# ---------------------------------------------------------------- chamfer/knn
def _np_chamfer(x, y):
    d = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    return d.min(1).mean() + d.min(0).mean()


def test_chamfer_matches_numpy(rng):
    x = rng.normal(size=(2, 40, 3)).astype(np.float32)
    y = rng.normal(size=(2, 55, 3)).astype(np.float32)
    ours, _ = kc.chamfer_distance(jnp.asarray(x), jnp.asarray(y), batch_reduction=None)
    ref = np.array([_np_chamfer(x[b], y[b]) for b in range(2)])
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4)


def test_chamfer_masked_equals_ragged(rng):
    """Padding must not change the result."""
    xa = rng.normal(size=(30, 3)).astype(np.float32)
    yb = rng.normal(size=(47, 3)).astype(np.float32)
    pc_x = Pointclouds.from_lists([xa], pad_to=64)
    pc_y = Pointclouds.from_lists([yb], pad_to=64)
    ours, _ = kc.chamfer_pointclouds(pc_x, pc_y, batch_reduction=None)
    np.testing.assert_allclose(float(ours[0]), _np_chamfer(xa, yb), rtol=1e-4)


def test_knn_points(rng):
    x = rng.normal(size=(1, 10, 3)).astype(np.float32)
    y = rng.normal(size=(1, 20, 3)).astype(np.float32)
    d, idx = kc.knn_points(jnp.asarray(x), jnp.asarray(y), k=3)
    dref = ((x[0][:, None] - y[0][None]) ** 2).sum(-1)
    iref = np.argsort(dref, axis=1)[:, :3]
    np.testing.assert_array_equal(np.asarray(idx)[0], iref)
    np.testing.assert_allclose(np.asarray(d)[0], np.sort(dref, 1)[:, :3], rtol=1e-4)


def test_chamfer_gradient_pulls_together(rng):
    x = jnp.asarray(rng.normal(size=(1, 16, 3)), jnp.float32)
    y = x + 0.5  # uniformly offset copy

    def loss(x_):
        c, _ = kc.chamfer_distance(x_, y)
        return c

    g = jax.grad(loss)(x)
    # gradient should point opposite the offset direction (negative pulls x up)
    assert float(jnp.mean(g)) < 0


# ------------------------------------------------------------------- sampling
def test_sample_points_on_unit_sphere():
    v, f = icosphere(3)
    mesh = Meshes.from_single(v, f)
    pts, normals = sample_points_from_meshes(
        mesh, 2000, jax.random.PRNGKey(0), return_normals=True
    )
    r = np.linalg.norm(np.asarray(pts)[0], axis=-1)
    assert abs(r.mean() - 1.0) < 0.01  # on the (faceted) unit sphere
    # normals roughly radial
    n = np.asarray(normals)[0]
    p = np.asarray(pts)[0]
    cos = (n * p / np.linalg.norm(p, axis=-1, keepdims=True)).sum(-1)
    assert cos.mean() > 0.95
    # uniformity: centroid of uniform sphere samples ~ 0
    assert np.abs(np.asarray(pts)[0].mean(0)).max() < 0.08


def test_sample_points_grad_flows_to_verts():
    v, f = icosphere(1)
    mesh = Meshes.from_single(v, f)

    def loss(verts):
        m = mesh.update_padded(verts)
        pts = sample_points_from_meshes(m, 256, jax.random.PRNGKey(1))
        return jnp.sum(pts**2)

    g = jax.grad(loss)(mesh.verts)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


# ----------------------------------------------------------------- mesh losses
def test_mesh_losses_on_cube():
    v, f = cube(2.0)
    mesh = Meshes.from_single(v, f)
    topo = ml.build_topology(mesh)
    assert int(topo.num_edges[0]) == 18  # 12 outer + 6 face diagonals
    assert int(topo.num_adj[0]) == 18    # closed manifold: every edge shared
    # edge loss: 12 edges of len 2, 6 diagonals of len 2*sqrt(2)
    el = float(ml.mesh_edge_loss(mesh, topo))
    expect = (12 * 4.0 + 6 * 8.0) / 18.0
    assert abs(el - expect) < 1e-4
    # normal consistency > 0 for a cube (non-coplanar neighbors exist)
    assert float(ml.mesh_normal_consistency(mesh, topo)) > 0.1


def test_normal_consistency_zero_on_plane():
    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
    mesh = Meshes.from_single(verts, faces)
    topo = ml.build_topology(mesh)
    assert float(ml.mesh_normal_consistency(mesh, topo)) < 1e-6


def test_mesh_losses_onehot_matches_gather():
    """The TPU one-hot gather/scatter formulation of the mesh losses is
    exact vs the plain gather path — values AND gradients (each one-hot
    output row has a single nonzero dot term, so precision cannot differ;
    the laplacian scatter sums identical terms)."""
    v, f = icosphere(2)
    mesh = Meshes.from_single(v, f).extend(2)
    key = jax.random.PRNGKey(3)
    mesh = mesh.update_padded(
        mesh.verts + 0.05 * jax.random.normal(key, mesh.verts.shape)
    )
    topo = ml.build_topology(mesh)
    for fn in (ml.mesh_edge_loss, ml.mesh_laplacian_smoothing,
               ml.mesh_normal_consistency):
        vals, grads = {}, {}
        for method in ("gather", "onehot"):
            vals[method], grads[method] = jax.value_and_grad(
                lambda verts: fn(
                    mesh.update_padded(verts), topo, method=method
                )
            )(mesh.verts)
        assert abs(float(vals["gather"] - vals["onehot"])) < 1e-6, fn
        assert float(
            jnp.abs(grads["gather"] - grads["onehot"]).max()
        ) < 1e-5, fn


def test_laplacian_zero_on_symmetric_flat_grid():
    # a vertex at the centroid of its neighbors has zero uniform laplacian
    v, f = icosphere(2)
    mesh = Meshes.from_single(v, f)
    topo = ml.build_topology(mesh)
    # sphere laplacian points inward: nonzero but finite and small
    val = float(ml.mesh_laplacian_smoothing(mesh, topo))
    assert 0 < val < 0.1
    g = jax.grad(
        lambda verts: ml.mesh_laplacian_smoothing(mesh.update_padded(verts), topo)
    )(mesh.verts)
    assert bool(jnp.all(jnp.isfinite(g)))


# ------------------------------------------------------------------------ ICP
def test_umeyama_exact_recovery(rng):
    R_gt = Rotation.random(4, rng).as_matrix().astype(np.float32)
    t_gt = rng.normal(size=(4, 3)).astype(np.float32)
    X = rng.normal(size=(4, 50, 3)).astype(np.float32)
    Y = np.einsum("bij,bnj->bni", R_gt, X) + t_gt[:, None]
    out = icp_ops.umeyama(jnp.asarray(X), jnp.asarray(Y))
    np.testing.assert_allclose(np.asarray(out.R), R_gt, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out.t), t_gt, atol=1e-4)


def test_umeyama_with_scale(rng):
    R_gt = Rotation.random(2, rng).as_matrix().astype(np.float32)
    s_gt = np.array([0.5, 2.0], np.float32)
    X = rng.normal(size=(2, 40, 3)).astype(np.float32)
    Y = s_gt[:, None, None] * np.einsum("bij,bnj->bni", R_gt, X)
    out = icp_ops.umeyama(jnp.asarray(X), jnp.asarray(Y), estimate_scale=True)
    np.testing.assert_allclose(np.asarray(out.s), s_gt, rtol=1e-3)


def test_icp_converges_small_perturbation(rng):
    v, _ = icosphere(2)
    # anisotropic ellipsoid: a plain sphere leaves rotation unconstrained
    X = (v[:320] * np.array([1.0, 0.6, 0.3], np.float32)).astype(np.float32)[None]
    rot = Rotation.from_rotvec([0.1, -0.08, 0.12]).as_matrix().astype(np.float32)
    t_gt = np.array([0.05, -0.03, 0.08], np.float32)
    Y = (X[0] @ rot.T + t_gt)[None]
    sol = icp_ops.iterative_closest_point(
        jnp.asarray(X), jnp.asarray(Y), max_iterations=30
    )
    np.testing.assert_allclose(np.asarray(sol.RTs.R)[0], rot, atol=5e-3)
    np.testing.assert_allclose(np.asarray(sol.RTs.t)[0], t_gt, atol=5e-3)
    assert float(sol.rmse[0]) < 1e-2
    assert bool(sol.converged[0])


def test_icp_partial_overlap_masked(rng):
    """Cropped target (the reference's half-cloud robustness case,
    pytorch3d_icp_registeration.py:134-137)."""
    v, _ = icosphere(3)
    X = (v * np.array([1.0, 0.6, 0.3], np.float32)).astype(np.float32)
    rot = Rotation.from_rotvec([0.05, 0.05, 0.0]).as_matrix().astype(np.float32)
    Yfull = X @ rot.T
    Y = Yfull[Yfull[:, 2] > -0.4]  # crop
    P = X.shape[0]
    pc_y = Pointclouds.from_lists([Y], pad_to=P)
    sol = icp_ops.iterative_closest_point(
        jnp.asarray(X)[None], pc_y.points, y_mask=pc_y.mask(), max_iterations=40
    )
    # should still roughly recover the rotation
    err = np.abs(np.asarray(sol.RTs.R)[0] - rot).max()
    assert err < 0.05


# ------------------------------------------------------------------------ GMM
def test_gmm_recovers_two_blobs(rng):
    mu = np.array([[-3.0, 0.0], [3.0, 1.0]], np.float32)
    X = np.concatenate(
        [rng.normal(size=(200, 2)) * 0.3 + mu[0], rng.normal(size=(200, 2)) * 0.3 + mu[1]]
    ).astype(np.float32)
    fit = gmm_ops.gmm_fit(jax.random.PRNGKey(0), jnp.asarray(X), 2, n_iter=30)
    means = np.sort(np.asarray(fit.means), axis=0)
    np.testing.assert_allclose(means, np.sort(mu, axis=0), atol=0.15)
    np.testing.assert_allclose(np.asarray(fit.weights), [0.5, 0.5], atol=0.05)
    samples = np.asarray(gmm_ops.gmm_sample(jax.random.PRNGKey(1), fit, 500))
    assert samples.shape == (500, 2)
    # samples concentrate near the blobs
    d = np.minimum(
        np.linalg.norm(samples - mu[0], axis=-1), np.linalg.norm(samples - mu[1], axis=-1)
    )
    assert np.quantile(d, 0.9) < 1.2


def test_chunked_chamfer_matches_dense():
    from torch_renderer_tpu.ops.knn_chamfer import (
        chamfer_distance,
        chamfer_distance_chunked,
        nn_points,
        nn_points_chunked,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 333, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 257, 3)).astype(np.float32))
    xm = jnp.asarray((rng.uniform(size=(2, 333)) > 0.2).astype(np.float32))
    ym = jnp.asarray((rng.uniform(size=(2, 257)) > 0.2).astype(np.float32))

    d1, i1 = nn_points(x, y, xm, ym)
    d2, i2 = nn_points_chunked(x, y, xm, ym, chunk=100)
    # padding changes matmul accumulation order -> f32 noise; near-ties may
    # flip argmin, so compare the distances implied by each index choice
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    same = np.asarray(i1) == np.asarray(i2)
    assert same.mean() > 0.99

    c1, _ = chamfer_distance(x, y, xm, ym, batch_reduction=None)
    c2, _ = chamfer_distance_chunked(x, y, xm, ym, batch_reduction=None, chunk=128)
    np.testing.assert_allclose(np.asarray(c1), np.asarray(c2), rtol=1e-4)


def test_soft_silhouette_check_grads():
    """Formal first-order gradient check on the soft rasterization path
    (SURVEY.md §4: jax.test_util.check_grads on the soft rasterizer)."""
    from jax.test_util import check_grads

    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.rasterize.soft import soft_silhouette_streaming
    from torch_renderer_tpu.structures.meshes import Meshes

    verts, faces = icosphere(0)
    meshes = Meshes.from_single(verts, faces)
    K = np.array([[16.0, 0, 8.0], [0, 16.0, 8.0], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(K, (16, 16), t=np.array([0, 0, 3.0], np.float32))

    def f(v):
        # sigma large enough that eps-perturbations stay smooth
        return jnp.sum(soft_silhouette_streaming(meshes.update_padded(v), cam,
                                                 sigma=5e-3))

    check_grads(f, (meshes.verts,), order=1, modes=["rev"], atol=2e-2, rtol=2e-2)
