"""End-to-end textured OBJ pipeline: MTL/PNG ingestion -> UV render.

The reference's canonical asset is data/cow_mesh/cow.obj (+MTL, +UV texture
PNG; SURVEY.md §2b). This test writes an equivalent textured OBJ from scratch
and drives load_objs_as_meshes -> TexturesUV -> ColorRender.
"""

import numpy as np
import pytest

import torch_renderer_tpu as trt
from torch_renderer_tpu.io.obj import load_obj, load_objs_as_meshes, save_obj
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.structures.textures import TexturesUV, sphere_uv_mapping

H = W = 64
F = 0.9 * H
K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


@pytest.fixture(scope="module")
def textured_obj(tmp_path_factory):
    d = tmp_path_factory.mktemp("asset")
    verts, faces = icosphere(2)
    uvs = np.asarray(sphere_uv_mapping(verts))
    # checkerboard texture map
    tex = np.zeros((32, 32, 3), np.float32)
    tex[::2, ::2] = [1.0, 0.2, 0.2]
    tex[1::2, 1::2] = [0.2, 0.2, 1.0]
    path = str(d / "ball.obj")
    save_obj(path, verts, faces, verts_uvs=uvs, faces_uvs=faces,
             texture_image=tex)
    return path, verts, faces, tex


def test_obj_roundtrip_with_texture(textured_obj):
    path, verts, faces, tex = textured_obj
    data = load_obj(path)
    np.testing.assert_allclose(data.verts, verts, atol=1e-5)
    np.testing.assert_array_equal(data.faces, faces)
    assert data.verts_uvs is not None and data.faces_uvs is not None
    assert data.texture_image is not None
    assert data.texture_image.shape == (32, 32, 3)


def test_load_as_meshes_attaches_uv_textures(textured_obj):
    path, *_ = textured_obj
    meshes = load_objs_as_meshes([path])
    assert isinstance(meshes.textures, TexturesUV)
    assert meshes.textures.maps.shape[0] == 1


def test_textured_render_shows_both_checker_colors(textured_obj):
    path, *_ = textured_obj
    meshes = load_objs_as_meshes([path])
    renderer = trt.ColorRender(K, (H, W))
    R, t = trt.look_at_view_transform(2.8, 10.0, 30.0)
    rgb = np.asarray(renderer.render(meshes, R, t))[0]
    assert np.isfinite(rgb).all()
    covered = rgb.sum(-1) > 0.05
    assert covered.mean() > 0.1
    # both checker colors visible: some pixels redder, some bluer
    red = (rgb[..., 0] > rgb[..., 2] + 0.1) & covered
    blue = (rgb[..., 2] > rgb[..., 0] + 0.1) & covered
    assert red.sum() > 20 and blue.sum() > 20


def test_uv_sample_matmul_matches_gather():
    """The TPU matmul sampling formulation (scatter-free backward) computes
    identical values and gradients to the gather path."""
    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.structures.textures import TexturesUV

    rng = np.random.RandomState(0)
    B, Hm, Wm, C = 2, 19, 23, 3
    maps = jnp.asarray(rng.rand(B, Hm, Wm, C).astype(np.float32))
    fuv = jnp.zeros((B, 1, 3), jnp.int32)
    vuv = jnp.zeros((B, 1, 2), jnp.float32)
    tex = TexturesUV(maps=maps, faces_uvs=fuv, verts_uvs=vuv)
    uv = jnp.asarray(rng.rand(B, 7, 11, 4, 2).astype(np.float32))

    a = tex.sample(uv, method="gather")
    b = tex.sample(uv, method="matmul")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    w = jnp.asarray(rng.rand(*a.shape).astype(np.float32))
    gm_g = jax.grad(
        lambda m: jnp.sum(TexturesUV(m, fuv, vuv).sample(uv, "gather") * w)
    )(maps)
    gm_m = jax.grad(
        lambda m: jnp.sum(TexturesUV(m, fuv, vuv).sample(uv, "matmul") * w)
    )(maps)
    np.testing.assert_allclose(np.asarray(gm_g), np.asarray(gm_m), atol=1e-5)

    gu_g = jax.grad(lambda u: jnp.sum(tex.sample(u, "gather") * w))(uv)
    gu_m = jax.grad(lambda u: jnp.sum(tex.sample(u, "matmul") * w))(uv)
    np.testing.assert_allclose(np.asarray(gu_g), np.asarray(gu_m), atol=1e-4)
    assert float(jnp.linalg.norm(gm_m)) > 0
