"""Joint shape + UV-texture optimization tests (deform_mesh_with_color parity)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.opt.deform_color import JointFitConfig, JointShapeTextureFitter
from torch_renderer_tpu.structures.meshes import Meshes
from torch_renderer_tpu.structures.textures import TexturesUV, sphere_uv_mapping

IMAGE = (48, 48)
F = 0.9 * IMAGE[0]
K = np.array([[F, 0, IMAGE[1] / 2], [0, F, IMAGE[0] / 2], [0, 0, 1]], np.float32)


def test_sphere_uv_mapping_in_unit_square():
    verts, _ = icosphere(2)
    uv = np.asarray(sphere_uv_mapping(verts))
    assert uv.shape == (verts.shape[0], 2)
    assert uv.min() >= 0.0 and uv.max() <= 1.0


@pytest.fixture(scope="module")
def setup():
    verts, faces = icosphere(2)
    src = Meshes.from_single(verts, faces)
    verts_uvs = sphere_uv_mapping(verts)

    # target: squashed sphere with a striped UV texture
    tgt_verts = verts * np.array([1.0, 0.75, 1.0], np.float32)
    tex_map = np.zeros((64, 64, 3), np.float32)
    tex_map[:, :, 0] = 0.8
    tex_map[::8, :, 1] = 0.9
    tgt = Meshes.from_single(tgt_verts, faces)
    tgt = dataclasses.replace(
        tgt,
        textures=TexturesUV(
            maps=jnp.asarray(tex_map)[None],
            faces_uvs=tgt.faces[:1],
            verts_uvs=verts_uvs[None],
        ),
    )
    return src, verts_uvs, tgt


def test_dataset_shapes(setup):
    src, verts_uvs, tgt = setup
    cfg = JointFitConfig(n_views=6, texture_size=64)
    fitter = JointShapeTextureFitter(K, IMAGE, cfg)
    ds = fitter.make_dataset(tgt)
    assert ds["rgb"].shape == (6, IMAGE[0], IMAGE[1], 3)
    assert ds["sil"].shape == (6, IMAGE[0], IMAGE[1])
    assert ds["R"].shape == (6, 3, 3)
    assert float(ds["sil"].max()) > 0.9


def test_joint_fit_improves_both_losses(setup):
    src, verts_uvs, tgt = setup
    cfg = JointFitConfig(
        n_views=6, views_per_step=2, texture_size=64,
        lr_verts=0.3, lr_texture=0.5, lr_decay_steps=100,
    )
    fitter = JointShapeTextureFitter(K, IMAGE, cfg)
    ds = fitter.make_dataset(tgt)
    params, hist = fitter.fit(src, verts_uvs, ds, jax.random.PRNGKey(0), n_steps=200)

    sil = np.asarray(hist["sil_mse"])
    rgb = np.asarray(hist["rgb_mse"])
    assert np.all(np.isfinite(np.asarray(hist["loss"])))
    # average the noisy per-step (2-view) losses over windows
    assert sil[-20:].mean() < 0.7 * sil[:20].mean()
    assert rgb[-20:].mean() < 0.7 * rgb[:20].mean()

    final = fitter.textured_mesh(src, verts_uvs, params)
    assert isinstance(final.textures, TexturesUV)
    v = np.asarray(final.verts)[0]
    # shape moved toward the squashed target: y extent shrank
    assert v[:, 1].max() < 0.95


def test_default_config_geometry_converges(setup):
    """Round-5 regression: lr_verts=1.0 (Adam) made the fit geometrically
    DIVERGE — |deform| ~9 units, surface chamfer ~70 vs a 1.2e-3 sampling
    floor — while the silhouette MSE still looked plausible, so the
    silhouette-only quality gates never caught it. The DEFAULT config must
    keep vertices bounded and move the surface toward the target."""
    from torch_renderer_tpu.ops.knn_chamfer import chamfer_distance
    from torch_renderer_tpu.ops.sample_points import sample_points_from_meshes

    src, verts_uvs, tgt = setup
    cfg = JointFitConfig(n_views=6, views_per_step=2, texture_size=64)
    fitter = JointShapeTextureFitter(K, IMAGE, cfg)
    ds = fitter.make_dataset(tgt)
    params, _ = fitter.fit(src, verts_uvs, ds, jax.random.PRNGKey(0),
                           n_steps=200)

    d = np.asarray(params["deform"])
    assert np.abs(d).max() < 0.5, f"vertex offsets exploded: {np.abs(d).max()}"

    def cham(mesh):
        k1, k2 = jax.random.split(jax.random.PRNGKey(7))
        a = sample_points_from_meshes(mesh, 2000, k1)
        b = sample_points_from_meshes(tgt, 2000, k2)
        return float(chamfer_distance(a, b)[0])

    c0 = cham(src)
    c1 = cham(src.offset_verts(params["deform"]))
    assert c1 < 0.5 * c0, f"chamfer {c0} -> {c1}: geometry did not converge"


def test_auto_bin_size_fit_stays_binned(setup):
    """JointFitConfig(bin_size=None): the jitted fit renders
    views_per_step views — a different shape key than make_dataset's
    n_views batch — so fit setup must seed the autotune cache for that
    key or every step silently warn-falls-back to dense (round-5 review
    finding)."""
    import warnings

    src, verts_uvs, tgt = setup
    cfg = JointFitConfig(n_views=6, views_per_step=2, texture_size=64,
                         bin_size=None)
    fitter = JointShapeTextureFitter(K, IMAGE, cfg)
    ds = fitter.make_dataset(tgt)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        params, hist = fitter.fit(src, verts_uvs, ds, jax.random.PRNGKey(0),
                                  n_steps=4)
    dense_falls = [w for w in rec if "falling back to DENSE" in str(w.message)]
    assert not dense_falls, [str(w.message) for w in dense_falls]
    assert np.all(np.isfinite(np.asarray(hist["loss"])))
