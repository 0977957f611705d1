"""Soft-silhouette paths: binned vs streaming parity, top-K equivalence,
gradient health, overflow diagnostics."""

import math

import jax
import jax.numpy as jnp
import numpy as np

import torch_renderer_tpu as trt
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.rasterize.binning import count_overflow
from torch_renderer_tpu.rasterize.geometry import setup_faces
from torch_renderer_tpu.rasterize.soft import (
    SOFT_CUTOFF,
    soft_silhouette,
    soft_silhouette_streaming,
)

SIGMA = 1e-4
H = W = 96


def _scene(level=2, dist=2.7, elev=25.0, azim=40.0):
    v, f = icosphere(level)
    mesh = trt.Meshes.from_single(v, f)
    R, t = trt.look_at_view_transform(dist, elev, azim)
    cam = trt.PerspectiveCamera.from_fov(60.0, (H, W), R=R, t=t)
    return mesh, cam


def test_binned_matches_streaming():
    mesh, cam = _scene()
    a_bin = np.asarray(soft_silhouette(mesh, cam, sigma=SIGMA))
    a_str = np.asarray(
        soft_silhouette_streaming(mesh, cam, sigma=SIGMA, pixel_chunk=2048, face_chunk=256)
    )
    assert np.abs(a_bin - a_str).max() < 5e-5  # f32 op-order tolerance


def test_matches_topk_sigmoid_alpha():
    mesh, cam = _scene()
    blur = math.log(1 / 1e-4 - 1) * SIGMA
    settings = trt.RasterizationSettings(
        image_size=(H, W), blur_radius=blur, faces_per_pixel=32, pixel_chunk=2048
    )
    frags = trt.rasterize_meshes(mesh, cam, settings)
    a_topk = np.asarray(trt.sigmoid_alpha(frags, SIGMA))
    a_bin = np.asarray(soft_silhouette(mesh, cam, sigma=SIGMA))
    assert np.abs(a_topk - a_bin).max() < 5e-3  # K=32 truncation tolerance


def test_soft_silhouette_values_sane():
    mesh, cam = _scene()
    a = np.asarray(soft_silhouette(mesh, cam, sigma=SIGMA))[0]
    assert a.min() >= 0 and a.max() <= 1
    assert a.max() > 0.99  # interior saturated
    assert a[0, 0] < 1e-3  # corner empty
    cov = (a > 0.5).mean()
    assert 0.05 < cov < 0.9


def test_gradients_finite_and_expand_sphere():
    mesh, cam = _scene(level=1)

    def total(verts):
        return jnp.sum(soft_silhouette(mesh.update_padded(verts), cam, sigma=SIGMA))

    g = np.asarray(jax.grad(total)(mesh.verts))
    assert np.isfinite(g).all()
    vn = np.asarray(mesh.verts)[0]
    vn = vn / np.linalg.norm(vn, axis=-1, keepdims=True)
    assert (g[0] * vn).sum() > 0  # outward growth increases coverage


def test_count_overflow_reports():
    mesh, cam = _scene()
    fd = setup_faces(mesh, cam)
    pad = math.sqrt(SOFT_CUTOFF * SIGMA)
    mx, n_over = count_overflow(fd, (H, W), 16, 256, pad)
    assert int(mx) <= 256 and int(n_over) == 0

    mx2, n_over2 = count_overflow(fd, (H, W), 16, 4, pad)
    assert int(n_over2) > 0  # tiny cap must overflow


def test_batched_views_independent():
    v, f = icosphere(2)
    mesh = trt.Meshes.from_single(v, f).extend(2)
    R, t = trt.look_at_view_transform(
        jnp.asarray([2.0, 6.0]), jnp.asarray([0.0, 0.0]), jnp.asarray([0.0, 0.0])
    )
    cam = trt.PerspectiveCamera.from_fov(60.0, (H, W), R=R, t=t)
    a = np.asarray(soft_silhouette(mesh, cam, sigma=SIGMA))
    assert (a[0] > 0.5).sum() > 4 * (a[1] > 0.5).sum()  # nearer view is bigger
