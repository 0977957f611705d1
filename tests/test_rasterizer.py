"""Rasterizer unit tests: analytic coverage/depth, occlusion, barycentrics,
soft-silhouette gradients (the kernel-level test strategy SURVEY.md §4 calls
for: 'rasterizer vs reference rasterization of tiny meshes')."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_renderer_tpu as trt
from torch_renderer_tpu.ops.icosphere import icosphere, quad
from torch_renderer_tpu.rasterize.geometry import setup_faces

H = W = 64
K = np.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]], np.float32)


def _cam():
    return trt.PerspectiveCamera.from_K(K, (H, W))


def _settings(**kw):
    base = dict(image_size=(H, W), pixel_chunk=1024)
    base.update(kw)
    return trt.RasterizationSettings(**base)


def test_quad_coverage_and_depth_exact():
    v, f = quad(size=1.0, z=2.0)
    frags = trt.rasterize_meshes(trt.Meshes.from_single(v, f), _cam(), _settings())
    depth = np.asarray(frags.depth())[0]
    # quad x,y in [-.5, .5] at z=2 -> u = 64*x/2 + 32 in [16, 48): 32x32 px.
    assert (depth > 0).sum() == 32 * 32
    np.testing.assert_allclose(depth[depth > 0], 2.0, atol=1e-5)
    assert (depth[:16, :] == 0).all() and (depth[:, :16] == 0).all()
    # background zbuf sentinel is -1 (pytorch3d parity)
    zb = np.asarray(frags.zbuf)[0, ..., 0]
    assert (zb[depth == 0] == -1.0).all()


def test_occlusion_nearest_wins():
    # two quads, the nearer one should fill the z-buffer
    v1, f1 = quad(size=1.0, z=2.0)
    v2, f2 = quad(size=1.0, z=3.0)
    v = np.concatenate([v1, v2])
    f = np.concatenate([f1, f2 + 4])
    frags = trt.rasterize_meshes(
        trt.Meshes.from_single(v, f), _cam(), _settings(faces_per_pixel=2)
    )
    depth = np.asarray(frags.depth())[0]
    np.testing.assert_allclose(depth[depth > 0], 2.0, atol=1e-5)
    # slot 1 holds the occluded quad where both overlap — except on the near
    # quad's shared triangle edge (the image diagonal), where a pixel center
    # lies exactly on both near triangles and they fill slots 0 and 1.
    z1 = np.asarray(frags.zbuf)[0, ..., 1]
    inner = z1[28:36, 28:36]
    off_diag = ~np.eye(8, dtype=bool)
    np.testing.assert_allclose(inner[off_diag], 3.0, atol=1e-4)
    np.testing.assert_allclose(inner[~off_diag], 2.0, atol=1e-4)


def test_barycentric_interpolation_linear_ramp():
    # attribute = x coordinate; interpolated value at a pixel must equal the
    # world x that projects there (perspective-correct on a fronto-parallel
    # quad reduces to linear).
    v, f = quad(size=1.0, z=2.0)
    mesh = trt.Meshes.from_single(v, f)
    frags = trt.rasterize_meshes(mesh, _cam(), _settings())
    attrs = jnp.asarray(v[:, 0])[None, :, None]  # (1, V, 1)
    face_attrs = jax.vmap(lambda a, fc: a[fc])(attrs[..., 0], mesh.faces)[..., None]
    vals = trt.interpolate_face_attributes(frags.pix_to_face, frags.bary, face_attrs)
    vals = np.asarray(vals)[0, ..., 0, 0]
    cov = np.asarray(frags.hard_mask())[0]
    js = np.where(cov.any(axis=0))[0]
    for j in [js[0], js[len(js) // 2], js[-1]]:
        i = np.where(cov[:, j])[0][0]
        world_x = (j + 0.5 - 32) * 2.0 / 64.0  # invert pinhole at z=2
        assert abs(vals[i, j] - world_x) < 1e-3


def test_backface_still_rasterized():
    # pytorch3d default cull_backfaces=False: reversed winding must render.
    v, f = quad(size=1.0, z=2.0)
    f_rev = f[:, ::-1].copy()
    frags = trt.rasterize_meshes(trt.Meshes.from_single(v, f_rev), _cam(), _settings())
    assert (np.asarray(frags.depth())[0] > 0).sum() == 32 * 32


def test_behind_camera_culled():
    v, f = quad(size=1.0, z=-2.0)
    frags = trt.rasterize_meshes(trt.Meshes.from_single(v, f), _cam(), _settings())
    assert (np.asarray(frags.depth()) == 0).all()


def test_padded_faces_never_rasterized():
    v, f = quad(size=1.0, z=2.0)
    mesh = trt.Meshes.from_lists([v], [f], pad_faces_to=64, pad_verts_to=32)
    frags = trt.rasterize_meshes(mesh, _cam(), _settings())
    assert (np.asarray(frags.depth())[0] > 0).sum() == 32 * 32
    assert np.asarray(frags.pix_to_face).max() < 2


def test_blur_radius_expands_coverage_and_signed_dists():
    v, f = quad(size=1.0, z=2.0)
    blur = 0.02  # squared NDC units
    frags = trt.rasterize_meshes(
        trt.Meshes.from_single(v, f), _cam(), _settings(blur_radius=blur)
    )
    d = np.asarray(frags.dists)[0, ..., 0]
    ptf = np.asarray(frags.pix_to_face)[0, ..., 0]
    live = ptf >= 0
    assert live.sum() > 32 * 32  # blur band adds pixels
    assert (d[live] < blur + 1e-6).all()
    # interior pixel (off the quad's diagonal edge) strictly negative
    assert d[32, 24] < 0
    band = live & (d > 0)
    assert band.sum() > 0


def test_soft_silhouette_gradient_moves_verts():
    v, f = icosphere(1)
    mesh = trt.Meshes.from_single(v, f)
    R, t = trt.look_at_view_transform(3.0, 10.0, 20.0)
    cam = trt.PerspectiveCamera.from_K(K, (H, W), R=R, t=t)
    sigma = 1e-4
    blur = math.log(1 / 1e-4 - 1) * sigma
    settings = _settings(blur_radius=blur, faces_per_pixel=8)

    def coverage(verts):
        m = mesh.update_padded(verts)
        fr = trt.rasterize_meshes(m, cam, settings)
        return jnp.sum(trt.sigmoid_alpha(fr, sigma))

    val, g = jax.value_and_grad(coverage)(mesh.verts)
    g = np.asarray(g)
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    # growing the sphere must increase coverage: directional derivative along
    # outward normals is positive.
    vn = np.asarray(mesh.verts)[0]
    vn = vn / np.linalg.norm(vn, axis=-1, keepdims=True)
    assert float((g[0] * vn).sum()) > 0


def test_setup_faces_valid_mask():
    v, f = quad(size=1.0, z=2.0)
    # add a degenerate face (all three corners identical)
    f2 = np.concatenate([f, np.array([[0, 0, 0]], np.int32)])
    mesh = trt.Meshes.from_single(v, f2)
    fd = setup_faces(mesh, _cam())
    valid = np.asarray(fd.valid)[0]
    assert valid[:2].all() and not valid[2]


def test_batch_independence():
    v, f = quad(size=1.0, z=2.0)
    v2 = v.copy()
    v2[:, 2] = 4.0
    mesh = trt.Meshes.from_lists([v, v2], [f, f])
    cam = trt.PerspectiveCamera.from_K(np.stack([K, K]), (H, W))
    frags = trt.rasterize_meshes(mesh, cam, _settings())
    depth = np.asarray(frags.depth())
    np.testing.assert_allclose(depth[0][depth[0] > 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(depth[1][depth[1] > 0], 4.0, atol=1e-5)
    assert (depth[1] > 0).sum() == 16 * 16  # twice as far -> half the size


def test_interpolate_onehot_matches_gather():
    """The TPU one-hot interpolation path (scatter-free backward) computes
    identical values and gradients to the gather path."""
    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.rasterize.fragments import (
        interpolate_face_attributes,
    )

    rng = np.random.RandomState(0)
    B, H, W, K, F, C = 2, 9, 13, 4, 57, 3
    p2f = jnp.asarray(rng.randint(-1, F, size=(B, H, W, K)).astype(np.int32))
    bary = jnp.asarray(rng.rand(B, H, W, K, 3).astype(np.float32))
    attrs = jnp.asarray(rng.randn(B, F, 3, C).astype(np.float32))

    a = interpolate_face_attributes(p2f, bary, attrs, method="gather")
    b = interpolate_face_attributes(
        p2f, bary, attrs, method="onehot", pixel_chunk=64
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    w = jnp.asarray(rng.rand(*a.shape).astype(np.float32))
    g_g = jax.grad(lambda at: jnp.sum(
        interpolate_face_attributes(p2f, bary, at, "gather") * w))(attrs)
    g_o = jax.grad(lambda at: jnp.sum(
        interpolate_face_attributes(p2f, bary, at, "onehot", 64) * w))(attrs)
    np.testing.assert_allclose(np.asarray(g_g), np.asarray(g_o), atol=1e-5)

    gb_g = jax.grad(lambda b2: jnp.sum(
        interpolate_face_attributes(p2f, b2, attrs, "gather") * w))(bary)
    gb_o = jax.grad(lambda b2: jnp.sum(
        interpolate_face_attributes(p2f, b2, attrs, "onehot", 64) * w))(bary)
    np.testing.assert_allclose(np.asarray(gb_g), np.asarray(gb_o), atol=1e-5)
    assert float(jnp.linalg.norm(g_o)) > 0
