"""Camera-ray world-position reconstruction for Phong shading.

recon_points=True replaces interpolating the 9 world-corner channels with
X_world = R^T (zbuf * K^{-1} [u, v, 1] - t) per fragment (shading.phong.
_reconstruct_points_flat): same shading for pixels inside their face (zbuf
IS the perspective-correct ray-intersection depth), eps-level deviation in
the blur band where clipped barycentrics pick a surface point off the ray.
Covers the joint shape+texture workload's hot path (reference
deform_mesh_with_color.py:372-396 renders Phong per step).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.renderer import MeshRenderer
from torch_renderer_tpu.structures.meshes import Meshes

IMG = 96
B = 2


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(2)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * IMG
    Km = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 3.5], np.float32),
        np.array([0.4, -0.3, 3.0], np.float32),
    ])
    return meshes, Km, R, t


def _renderer(Km, recon, blur_radius, K_, act=None, shade_k=2):
    return MeshRenderer(
        Km, (IMG, IMG), blur_radius=blur_radius, faces_per_pixel=K_,
        bin_size=16, max_faces_per_bin=128, impl="pallas",
        shade_k=shade_k, recon_points=recon, active_tiles=act,
    )


def test_recon_matches_interpolation_interior(scene):
    """Pixels whose nearest hit lies INSIDE its face shade identically
    (up to f32, amplified by the specular power); silhouette and depth
    ignore shading attributes entirely and must be bit-identical."""
    meshes, Km, R, t = scene
    blur = 1e-4 * math.log(1 / 1e-4 - 1)
    a = _renderer(Km, False, blur, 4).render(meshes, R, t, with_rgb=True)
    b = _renderer(Km, True, blur, 4).render(meshes, R, t, with_rgb=True)

    np.testing.assert_array_equal(np.asarray(a.silhouette), np.asarray(b.silhouette))
    np.testing.assert_array_equal(np.asarray(a.depth), np.asarray(b.depth))

    interior = np.asarray(a.fragments.dists[..., 0]) < -1e-6
    assert interior.any()
    d = np.abs(np.asarray(a.rgb) - np.asarray(b.rgb))
    assert d[interior].max() < 2e-3, d[interior].max()
    # blur band: bounded, small on average
    assert d.max() < 0.05, d.max()
    assert d.mean() < 1e-3, d.mean()


def test_recon_hard_path(scene):
    """blur=0, K=1: every covered pixel is interior, so the reconstruction
    matches interpolation everywhere."""
    meshes, Km, R, t = scene
    a = _renderer(Km, False, 0.0, 1, shade_k=1).render(
        meshes, R, t, with_rgb=True, soft_rgb=False
    )
    b = _renderer(Km, True, 0.0, 1, shade_k=1).render(
        meshes, R, t, with_rgb=True, soft_rgb=False
    )
    d = np.abs(np.asarray(a.rgb) - np.asarray(b.rgb))
    assert d.max() < 2e-3, d.max()


def test_recon_composes_with_active_tiles(scene):
    """Tile compaction must not change the reconstructed positions: the
    pixel-coordinate/zbuf tiling rides the same compact_rows as the
    attribute channels (bit-exact vs the full tile grid)."""
    from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    meshes, Km, R, t = scene
    blur = 1e-4 * math.log(1 / 1e-4 - 1)
    full = _renderer(Km, True, blur, 4)
    cam = full.camera_with_pose(R, t)
    act = suggest_active_tiles_fd(
        setup_faces(meshes, cam), (IMG, IMG), 16, math.sqrt(blur)
    )
    assert act < (IMG // 16) ** 2
    a = full.render(meshes, R, t, with_rgb=True)
    b = _renderer(Km, True, blur, 4, act=act).render(meshes, R, t, with_rgb=True)
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))


def test_recon_active_headroom_gradients(scene):
    """The production joint-fit config: active budget sized with 1.5x
    headroom, so compaction-UNUSED rows exist (compact_rows zero-fills
    them). Those rows must reconstruct away from the camera center
    (flat_pixel_zbuf returns z=-1 there, |pcam| >= 1) or the view-norm
    vjp NaN-poisons the zbuf cotangent. Values must stay bit-exact vs
    the full grid, and gradients finite."""
    from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    meshes, Km, R, t = scene
    blur = 1e-4 * math.log(1 / 1e-4 - 1)
    full = _renderer(Km, True, blur, 4)
    cam = full.camera_with_pose(R, t)
    act = suggest_active_tiles_fd(
        setup_faces(meshes, cam), (IMG, IMG), 16, math.sqrt(blur)
    )
    act = min((IMG // 16) ** 2, math.ceil(1.5 * act))  # headroom -> unused rows

    a = full.render(meshes, R, t, with_rgb=True)
    b = _renderer(Km, True, blur, 4, act=act).render(meshes, R, t, with_rgb=True)
    np.testing.assert_array_equal(np.asarray(a.rgb), np.asarray(b.rgb))

    def loss(v):
        out = _renderer(Km, True, blur, 4, act=act).render(
            meshes.update_padded(v), R, t, with_rgb=True
        )
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.silhouette ** 2)

    g = jax.grad(loss)(meshes.verts)
    assert bool(jnp.all(jnp.isfinite(g)))
    g_full = jax.grad(
        lambda v: jnp.sum(
            full.render(meshes.update_padded(v), R, t, with_rgb=True).rgb ** 2
        )
        + jnp.sum(
            full.render(meshes.update_padded(v), R, t, with_rgb=True).silhouette ** 2
        )
    )(meshes.verts)
    scale = float(jnp.abs(g_full).max())
    assert float(jnp.abs(g - g_full).max()) < 1e-4 * scale


def test_recon_gradients(scene):
    """Gradients flow to the geometry through zbuf (not the corner
    channels): finite, and close to the interpolation formulation on an
    interior-weighted loss."""
    meshes, Km, R, t = scene
    blur = 1e-4 * math.log(1 / 1e-4 - 1)

    def loss(v, recon):
        out = _renderer(Km, recon, blur, 4).render(
            meshes.update_padded(v), R, t, with_rgb=True
        )
        return jnp.sum(out.rgb ** 2) + jnp.sum(out.silhouette ** 2)

    g_i = jax.grad(loss)(meshes.verts, False)
    g_r = jax.grad(loss)(meshes.verts, True)
    assert bool(jnp.all(jnp.isfinite(g_r)))
    scale = float(jnp.abs(g_i).max())
    # different-but-equivalent formulations: same signal, small deviation
    assert float(jnp.abs(g_i - g_r).max()) < 0.1 * scale
