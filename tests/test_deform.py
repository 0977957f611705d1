"""Mesh deformation workload tests (sphere -> target, vertex-color fit)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.opt.deform import (
    ColorFitConfig,
    DeformConfig,
    MeshDeformer,
    VertexColorFitter,
)
from torch_renderer_tpu.structures.meshes import Meshes
from torch_renderer_tpu.structures.textures import TexturesVertex

import dataclasses


@pytest.fixture(scope="module")
def sphere():
    verts, faces = icosphere(2)  # 162 verts, 320 faces
    return Meshes.from_single(verts, faces)


def test_deform_to_scaled_target_converges(sphere):
    """Deform a unit sphere toward a 0.6-scaled point target; the chamfer
    should drop substantially and the result should shrink."""
    rng = np.random.default_rng(0)
    target = 0.6 * rng.standard_normal((1, 800, 3)).astype(np.float32)
    target /= np.linalg.norm(target, axis=-1, keepdims=True) / 0.6

    cfg = DeformConfig(n_samples=400, lr=0.5, momentum=0.9)
    deformer = MeshDeformer(sphere, target_points=jnp.asarray(target), config=cfg)
    mesh, deform, hist, snaps = deformer.fit(
        jax.random.PRNGKey(0), n_steps=120, snapshot_every=60
    )

    cham = np.asarray(hist["chamfer"])
    assert np.all(np.isfinite(np.asarray(hist["loss"])))
    assert cham[-1] < 0.25 * cham[0]
    assert len(snaps) == 1  # one intermediate snapshot

    radii = np.linalg.norm(np.asarray(mesh.verts)[0], axis=-1)
    assert abs(np.mean(radii) - 0.6) < 0.1


def test_deform_against_target_mesh(sphere):
    """Target given as a mesh: per-step resampling path."""
    verts, faces = icosphere(2)
    target = Meshes.from_single(0.7 * verts, faces)
    cfg = DeformConfig(n_samples=300, lr=0.5)
    deformer = MeshDeformer(sphere, target_meshes=target, config=cfg)
    _, _, hist, _ = deformer.fit(jax.random.PRNGKey(1), n_steps=60)
    cham = np.asarray(hist["chamfer"])
    assert cham[-1] < 0.5 * cham[0]


def test_deform_regularizers_zero_on_sphere(sphere):
    """On the raw sphere with zero deform the regularizers are small/finite."""
    deformer = MeshDeformer(
        sphere, target_points=jnp.asarray(np.zeros((1, 10, 3), np.float32))
    )
    _, metrics = deformer.loss(deformer.init_params(), jax.random.PRNGKey(0))
    assert float(metrics["normal"]) < 0.1  # near-coplanar adjacent faces
    assert np.isfinite(float(metrics["laplacian"]))


IMAGE = (48, 48)


def test_vertex_color_fit_recovers_colors(sphere):
    """Fit vertex RGB from 4 rendered views of a known-colored sphere."""
    verts = np.asarray(sphere.verts)[0]
    gt_rgb = (0.5 + 0.5 * verts).clip(0, 1).astype(np.float32)
    gt_mesh = dataclasses.replace(
        sphere, textures=TexturesVertex(jnp.asarray(gt_rgb)[None])
    )

    f = 0.8 * IMAGE[0]
    K = np.array(
        [[f, 0, IMAGE[1] / 2], [0, f, IMAGE[0] / 2], [0, 0, 1]], np.float32
    )
    # 4 views around the z axis
    from torch_renderer_tpu.transforms.so3 import euler_angles_to_matrix

    angles = jnp.asarray(
        [[0.0, a, 0.0] for a in np.linspace(0, 2 * np.pi, 4, endpoint=False)],
        jnp.float32,
    )
    Rs = euler_angles_to_matrix(angles)
    ts = jnp.tile(jnp.asarray([0.0, 0.0, 3.0]), (4, 1))

    fitter = VertexColorFitter(K, IMAGE, ColorFitConfig(lr=5.0))
    refs = fitter.make_reference_views(gt_mesh, Rs, ts)
    assert refs.shape == (4, IMAGE[0], IMAGE[1], 3)

    rgb, hist = fitter.fit(sphere, Rs, ts, refs, n_steps=80)
    losses = np.asarray(hist["rgb_mse"])
    assert np.all(np.isfinite(losses))
    assert losses[-1] < 0.45 * losses[0]
    assert np.all(np.asarray(rgb) > -0.2) and np.all(np.asarray(rgb) < 1.2)
