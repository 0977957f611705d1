"""Fused scatter+untile kernel (rasterize/pallas_untile) vs the XLA
epilogue (binning.scatter_active_bg + untile_image): bit-exact values,
matching gradients, and end-to-end renderer parity with untile_impl.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.cameras.look_at import look_at_view_transform
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.rasterize.binning import untile_image
from torch_renderer_tpu.rasterize.pallas_untile import (
    tile_slot_table,
    untile_scatter_pallas,
)
from torch_renderer_tpu.renderer import DepthRender, MeshRenderer
from torch_renderer_tpu.structures.meshes import Meshes


@pytest.fixture(scope="module")
def compacted():
    rng = np.random.default_rng(0)
    B, TH, TW, tile, A = 2, 3, 5, 16, 9
    T = TH * TW
    tp = tile * tile
    rank = np.full((B, T), 10 ** 6, np.int32)
    for b in range(B):
        act = rng.choice(T, A, replace=False)
        rank[b, act] = np.arange(A)
    rows = rng.standard_normal((B, A, tp, 1)).astype(np.float32)
    return rows, rank, A, tile, (TH, TW)


def _scatter_ref(rows, rank, A, bg):
    B, T = rank.shape
    _, _, tp, C = rows.shape
    full = np.full((B, T, tp, C), bg, np.float32)
    for b in range(B):
        for t in range(T):
            if rank[b, t] < A:
                full[b, t] = rows[b, rank[b, t]]
    return full


def test_fwd_bit_exact_compacted_cropped(compacted):
    rows, rank, A, tile, nthw = compacted
    TH, TW = nthw
    H, W = TH * tile - 5, TW * tile - 3  # exercise the crop
    table = tile_slot_table(jnp.asarray(rank), A, nthw)
    img = untile_scatter_pallas(
        jnp.asarray(rows), table, -1.0, (H, W), tile, nthw)
    ref = np.asarray(untile_image(
        jnp.asarray(_scatter_ref(rows, rank, A, -1.0)), (H, W), tile, nthw))
    np.testing.assert_array_equal(np.asarray(img), ref)


def test_fwd_identity_multichannel(compacted):
    _, _, _, tile, nthw = compacted
    TH, TW = nthw
    T = TH * TW
    tp = tile * tile
    rng = np.random.default_rng(1)
    rows = rng.standard_normal((2, T, tp, 3)).astype(np.float32)
    H, W = TH * tile, TW * tile
    table = tile_slot_table(None, T, nthw, batch=2)
    img = untile_scatter_pallas(
        jnp.asarray(rows), table, 0.0, (H, W), tile, nthw)
    ref = np.asarray(untile_image(jnp.asarray(rows), (H, W), tile, nthw))
    np.testing.assert_array_equal(np.asarray(img), ref)


def test_gradients_match_xla_formulation(compacted):
    rows, rank, A, tile, nthw = compacted
    TH, TW = nthw
    H, W = TH * tile - 5, TW * tile - 3
    table = tile_slot_table(jnp.asarray(rank), A, nthw)
    T = TH * TW

    def loss_pallas(r):
        return jnp.sum(
            untile_scatter_pallas(r, table, -1.0, (H, W), tile, nthw) ** 3)

    def loss_ref(r):
        oh = (jnp.asarray(rank)[:, :, None]
              == jnp.arange(A)[None, None, :]).astype(jnp.float32)
        s = jnp.einsum("bta,bapc->btpc", oh, r)
        live = (jnp.asarray(rank) < A)[:, :, None, None]
        full = jnp.where(live, s, -1.0)
        return jnp.sum(untile_image(full, (H, W), tile, nthw) ** 3)

    r0 = jnp.asarray(rows)
    g_p = jax.grad(loss_pallas)(r0)
    g_r = jax.grad(loss_ref)(r0)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=1e-5)


@pytest.mark.parametrize("act", [None, 40])
def test_renderer_parity_depth_sil(act):
    """End-to-end: untile_impl='pallas' is bit-exact vs the XLA epilogue
    through DepthRender (depth + silhouette, with and without
    compaction)."""
    H, W = 144, 176
    f = 0.9 * H
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    verts, faces = icosphere(3)
    m = Meshes.from_single(verts, faces).extend(3)
    R, t = look_at_view_transform(2.7, [15.0, 40.0, 65.0], [0.0, 120.0, 240.0])
    kw = dict(bin_size=16, max_faces_per_bin=128, active_tiles=act,
              impl="xla")
    a = DepthRender(K, (H, W), **kw)
    b = DepthRender(K, (H, W), untile_impl="pallas", **kw)
    da, sa = a.render(m, R, t, return_silhouette=True)
    db, sb = b.render(m, R, t, return_silhouette=True)
    np.testing.assert_array_equal(np.asarray(da), np.asarray(db))
    np.testing.assert_array_equal(np.asarray(sa), np.asarray(sb))


def test_renderer_parity_k4_fragments_and_grad():
    """K>1 fragments (bary stacks ride the kernel as C=K*3 channels) and
    a soft-silhouette gradient through the pallas epilogue."""
    import math

    H = W = 96
    f = 0.8 * H
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    verts, faces = icosphere(2)
    m = Meshes.from_single(verts, faces)
    R, t = look_at_view_transform(3.0, 25.0, 40.0)
    blur = 1e-4 * math.log(1 / 1e-4 - 1)
    kw = dict(blur_radius=blur, faces_per_pixel=4, bin_size=16,
              max_faces_per_bin=128, impl="xla")
    a = MeshRenderer(K, (H, W), **kw)
    b = MeshRenderer(K, (H, W), untile_impl="pallas", **kw)
    fa, _ = a.rasterize(m, R, t)
    fb, _ = b.rasterize(m, R, t)
    np.testing.assert_array_equal(np.asarray(fa.zbuf), np.asarray(fb.zbuf))
    np.testing.assert_array_equal(np.asarray(fa.bary), np.asarray(fb.bary))
    np.testing.assert_array_equal(
        np.asarray(fa.pix_to_face), np.asarray(fb.pix_to_face))
    np.testing.assert_array_equal(np.asarray(fa.dists), np.asarray(fb.dists))

    def loss(v, r):
        out = r.render(m.update_padded(v), R, t)
        return jnp.sum(out.silhouette ** 2)

    g_a = jax.grad(loss)(m.verts, a)
    g_b = jax.grad(loss)(m.verts, b)
    assert bool(jnp.all(jnp.isfinite(g_b)))
    np.testing.assert_allclose(np.asarray(g_a), np.asarray(g_b), atol=1e-5)
