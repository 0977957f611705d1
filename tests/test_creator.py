"""Two-phase creator pipeline + API-alias tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.opt.creator import CreatorConfig, TwoPhaseCreator
from torch_renderer_tpu.opt.deform import ColorFitConfig, DeformConfig
from torch_renderer_tpu.structures.meshes import Meshes
from torch_renderer_tpu.structures.pointclouds import Pointclouds
from torch_renderer_tpu.structures.textures import TexturesVertex


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    verts, faces = icosphere(2)
    src = Meshes.from_single(verts, faces)
    tgt_verts = (verts * np.array([1.0, 0.7, 0.9], np.float32)).astype(np.float32)
    rgb = np.clip(0.5 + 0.5 * tgt_verts, 0, 1).astype(np.float32)
    target = dataclasses.replace(
        Meshes.from_single(tgt_verts, faces),
        textures=TexturesVertex(jnp.asarray(rgb)[None]),
    )
    cfg = CreatorConfig(
        geometry=DeformConfig(n_samples=300, lr=0.5, n_steps=60),
        color=ColorFitConfig(lr=5.0, n_steps=40),
        n_color_views=4, image_size=(48, 48),
    )
    return TwoPhaseCreator(src, target, cfg)


def test_color_train_requires_geometry(pipeline):
    fresh = TwoPhaseCreator(pipeline.src, pipeline.target, pipeline.config)
    with pytest.raises(RuntimeError):
        fresh.color_train(jax.random.PRNGKey(0))


def test_two_phase_pipeline_end_to_end(pipeline, tmp_path):
    out1 = pipeline.geometry_train(jax.random.PRNGKey(0))
    cham = np.asarray(out1["history"]["chamfer"])
    assert cham[-1] < 0.5 * cham[0]

    out2 = pipeline.color_train(jax.random.PRNGKey(1))
    rgb_mse = np.asarray(out2["history"]["rgb_mse"])
    assert np.all(np.isfinite(rgb_mse))
    assert rgb_mse[-1] < rgb_mse[0]

    # exports both formats, with colors
    pipeline.export(str(tmp_path / "result.obj"))
    pipeline.export(str(tmp_path / "result.ply"))
    from torch_renderer_tpu.io.ply import load_ply

    back = load_ply(str(tmp_path / "result.ply"))
    assert back["colors"] is not None and back["faces"] is not None


def test_transfer_colors_direct(pipeline):
    # geometry already trained by the previous test (module-scoped fixture)
    if pipeline.deformed is None:
        pipeline.geometry_train(jax.random.PRNGKey(0), n_steps=30)
    rgb = np.asarray(pipeline.transfer_colors())
    assert rgb.shape == (pipeline.src.max_verts, 3)
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0


def test_pytorch3d_style_aliases():
    verts, faces = icosphere(0)
    m = Meshes.from_lists([verts, verts * 0.5], [faces, faces])
    assert m.verts_padded().shape == (2, 12, 3)
    assert m.num_verts_per_mesh().tolist() == [12, 12]
    v0, f0 = m.get_mesh_verts_faces(1)
    np.testing.assert_allclose(v0, verts * 0.5, atol=1e-6)
    assert len(m.verts_list()) == 2
    assert m.verts_packed().shape == (24, 3)

    p = Pointclouds.from_lists([verts[:5], verts[:9]])
    assert p.points_padded().shape == (2, 9, 3)
    assert [x.shape[0] for x in p.points_list()] == [5, 9]
    assert p.num_points_per_cloud().tolist() == [5, 9]


def test_K_validation():
    import torch_renderer_tpu as trt

    with pytest.raises(ValueError):
        trt.DepthRender(np.eye(4, dtype=np.float32), (32, 32))
    with pytest.raises(ValueError):
        trt.DepthRender(np.eye(3, dtype=np.float32), [32, 32])  # not a tuple
