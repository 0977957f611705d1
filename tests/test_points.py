"""Point-cloud rasterization and compositing tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_renderer_tpu as trt
from torch_renderer_tpu.rasterize.points import (
    PointsRasterizationSettings,
    rasterize_points,
)
from torch_renderer_tpu.shading.compositing import (
    alpha_composite,
    norm_weighted_composite,
)
from torch_renderer_tpu.structures.pointclouds import Pointclouds

H, W = 64, 64
F = 64.0
K_MAT = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def cam():
    return trt.PerspectiveCamera.from_K(K_MAT, (H, W))


def test_single_point_lands_on_principal_point():
    pcl = Pointclouds.from_padded(jnp.asarray([[[0.0, 0.0, 2.0]]]))
    frags = rasterize_points(
        pcl, cam(), PointsRasterizationSettings((H, W), radius=0.05)
    )
    idx = np.asarray(frags.idx[0, :, :, 0])
    hit = idx >= 0
    ys, xs = np.nonzero(hit)
    # center pixel must be covered, z == 2
    assert hit[H // 2, W // 2]
    assert abs(ys.mean() - (H - 1) / 2) < 1.0 and abs(xs.mean() - (W - 1) / 2) < 1.0
    z = np.asarray(frags.zbuf[0, :, :, 0])[hit]
    np.testing.assert_allclose(z, 2.0, atol=1e-5)
    # coverage area ~ pi * (r * s)^2 pixels, r=0.05 NDC, s=32 px/NDC
    assert 3 <= hit.sum() <= 15


def test_nearer_point_wins_slot_zero():
    pts = jnp.asarray([[[0.0, 0.0, 3.0], [0.0, 0.0, 2.0]]])
    pcl = Pointclouds.from_padded(pts)
    frags = rasterize_points(
        pcl, cam(), PointsRasterizationSettings((H, W), radius=0.05, points_per_pixel=2)
    )
    center = np.asarray(frags.idx[0, H // 2, W // 2])
    assert center[0] == 1 and center[1] == 0  # z=2 point first


def test_padded_points_never_rasterize():
    pcl = Pointclouds.from_lists(
        [np.array([[0.0, 0.0, 2.0]], np.float32)], pad_to=16
    )
    frags = rasterize_points(
        pcl, cam(), PointsRasterizationSettings((H, W), radius=0.05)
    )
    idx = np.asarray(frags.idx)
    assert idx.max() <= 0  # only point 0 (or empty -1)


def test_alpha_composite_full_opacity_front():
    w = jnp.asarray([1.0, 0.5]).reshape(1, 1, 1, 2)
    feats = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).reshape(1, 1, 1, 2, 3)
    out = np.asarray(alpha_composite(w, feats))[0, 0, 0]
    np.testing.assert_allclose(out[:3], [1.0, 0.0, 0.0], atol=1e-6)  # front wins
    np.testing.assert_allclose(out[3], 1.0, atol=1e-6)


def test_norm_composite_averages():
    w = jnp.asarray([0.5, 0.5]).reshape(1, 1, 1, 2)
    feats = jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]).reshape(1, 1, 1, 2, 3)
    out = np.asarray(norm_weighted_composite(w, feats))[0, 0, 0]
    np.testing.assert_allclose(out[:3], [0.5, 0.5, 0.0], atol=1e-6)


@pytest.mark.parametrize("cls", ["alpha", "norm", "pulsar", "depth"])
def test_point_renderers_end_to_end(cls):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((200, 3)).astype(np.float32) * 0.3
    pts[:, 2] += 2.5
    feats = rng.uniform(0.2, 1.0, (200, 3)).astype(np.float32)
    pcl = Pointclouds.from_padded(jnp.asarray(pts)[None], features=jnp.asarray(feats)[None])
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)

    renderers = {
        "alpha": trt.AlphaPointRender(K_MAT, (H, W), radius=0.03),
        "norm": trt.NormPointRender(K_MAT, (H, W), radius=0.03),
        "pulsar": trt.PulsarPointRender(K_MAT, (H, W), radius=0.03),
        "depth": trt.DepthPointRender(K_MAT, (H, W), radius=0.03),
    }
    out = renderers[cls].render(pcl, R, t)
    out_np = np.asarray(out)
    assert np.all(np.isfinite(out_np))
    if cls == "depth":
        assert out_np.shape == (1, H, W)
        covered = out_np > 0
        assert covered.sum() > 20
        np.testing.assert_array_less(out_np[covered], 3.5)
    else:
        assert out_np.shape == (1, H, W, 4)
        assert out_np[..., 3].max() <= 1.0 + 1e-5
        assert out_np[..., 3].max() > 0.5


def test_point_render_gradients_flow_to_positions():
    pts = jnp.asarray([[[0.05, 0.0, 2.0], [-0.05, 0.02, 2.2]]])
    pcl = Pointclouds.from_padded(pts)
    renderer = trt.NormPointRender(K_MAT, (H, W), radius=0.08)
    R = jnp.eye(3)[None]
    t = jnp.zeros((1, 3))

    def loss(p):
        import dataclasses

        out = renderer.render(dataclasses.replace(pcl, points=p), R, t)
        return jnp.sum(out[..., 3])

    g = jax.grad(loss)(pcl.points)
    g_np = np.asarray(g)
    assert np.all(np.isfinite(g_np))
    assert np.abs(g_np).sum() > 0


def _random_cloud(n=400, seed=0, batch=2):
    rng = np.random.default_rng(seed)
    pts = rng.normal(0, 0.4, size=(batch, n, 3)).astype(np.float32)
    pts[..., 2] += 2.5
    return Pointclouds.from_padded(jnp.asarray(pts))


def test_binned_matches_dense_fragments():
    pcl = _random_cloud()
    dense = rasterize_points(
        pcl, cam(),
        PointsRasterizationSettings((H, W), radius=0.04, points_per_pixel=4),
    )
    binned = rasterize_points(
        pcl, cam(),
        PointsRasterizationSettings(
            (H, W), radius=0.04, points_per_pixel=4,
            bin_size=16, max_points_per_bin=128,
        ),
    )
    np.testing.assert_array_equal(np.asarray(dense.idx), np.asarray(binned.idx))
    np.testing.assert_allclose(
        np.asarray(dense.zbuf), np.asarray(binned.zbuf), atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dense.dists2), np.asarray(binned.dists2), atol=1e-6
    )


def test_binned_matches_dense_gradients():
    pcl = _random_cloud(n=200, batch=1)
    camera = cam()
    w = jnp.cos(jnp.arange(H * W, dtype=jnp.float32)).reshape(1, H, W)

    def loss(points, bin_size):
        frags = rasterize_points(
            Pointclouds.from_padded(points), camera,
            PointsRasterizationSettings(
                (H, W), radius=0.05, points_per_pixel=4,
                bin_size=bin_size, max_points_per_bin=128,
            ),
        )
        m = frags.mask
        contrib = jnp.where(m, frags.zbuf, 0.0) + jnp.where(m, frags.dists2, 0.0)
        return jnp.sum(jnp.sum(contrib, axis=-1) * w)

    g_dense = jax.grad(lambda p: loss(p, None))(pcl.points)
    g_binned = jax.grad(lambda p: loss(p, 16))(pcl.points)
    np.testing.assert_allclose(
        np.asarray(g_dense), np.asarray(g_binned), atol=1e-4, rtol=1e-4
    )


def test_binned_active_tiles_exact_fragments():
    """Active-tile compaction (PointsRasterizationSettings.active_tiles) is
    bit-exact vs the uncompacted binned path — fragments AND gradients —
    with headroom or at the exact non-empty count."""
    from torch_renderer_tpu.rasterize.points import (
        suggest_active_tiles_points,
    )

    rng = np.random.default_rng(3)
    pts = rng.normal(0, 0.15, size=(2, 400, 3)).astype(np.float32)
    pts[..., 2] += 2.5  # tight cloud: leaves some of the 16 tiles empty
    pcl = Pointclouds.from_padded(jnp.asarray(pts))
    camera = cam()
    base = PointsRasterizationSettings(
        (H, W), radius=0.04, points_per_pixel=4,
        bin_size=16, max_points_per_bin=128,
    )
    act = suggest_active_tiles_points(pcl, camera, base)
    assert act < 16  # the compaction is a real reduction on this cloud
    plain = rasterize_points(pcl, camera, base)
    import dataclasses

    for a in (act, 16):  # suggested budget and the full grid
        comp = rasterize_points(
            pcl, camera, dataclasses.replace(base, active_tiles=a)
        )
        np.testing.assert_array_equal(
            np.asarray(plain.idx), np.asarray(comp.idx))
        np.testing.assert_array_equal(
            np.asarray(plain.zbuf), np.asarray(comp.zbuf))
        np.testing.assert_array_equal(
            np.asarray(plain.dists2), np.asarray(comp.dists2))

    # gradients (through zbuf+dists2 like the dense-parity test), and
    # feature channels riding the gather
    w = jnp.cos(jnp.arange(H * W, dtype=jnp.float32)).reshape(1, H, W)

    def loss(points, active):
        frags = rasterize_points(
            Pointclouds.from_padded(points), camera,
            dataclasses.replace(base, active_tiles=active),
            extra=jnp.ones((2, points.shape[1], 2)) * points[..., 2:3],
        )
        m = frags.mask
        contrib = (jnp.where(m, frags.zbuf, 0.0)
                   + jnp.where(m, frags.dists2, 0.0)
                   + jnp.sum(frags.features, axis=-1))
        return jnp.sum(jnp.sum(contrib, axis=-1) * w)

    g_plain = jax.grad(lambda p: loss(p, None))(pcl.points)
    g_comp = jax.grad(lambda p: loss(p, act))(pcl.points)
    assert np.isfinite(np.asarray(g_comp)).all()
    np.testing.assert_allclose(
        np.asarray(g_plain), np.asarray(g_comp), atol=1e-5, rtol=1e-5
    )


def test_binned_pallas_select_exact_fragments():
    """The fused Pallas selection kernel (points.impl='pallas'; interpret
    mode off-TPU) is bit-exact vs the XLA K-extraction loop — fragments,
    features, and gradients (both impls share the differentiable winner
    one-hot einsum epilogue; the kernel only replaces the selection)."""
    import dataclasses

    pcl = _random_cloud()
    camera = cam()
    base = PointsRasterizationSettings(
        (H, W), radius=0.04, points_per_pixel=4,
        bin_size=16, max_points_per_bin=128, impl="xla",
    )
    extra = jnp.ones((2, 400, 2)) * pcl.points[..., 2:3]
    a = rasterize_points(pcl, camera, base, extra=extra)
    for act in (None, 16):  # composes with active-tile compaction
        s = dataclasses.replace(base, impl="pallas", active_tiles=act)
        b = rasterize_points(pcl, camera, s, extra=extra)
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
        np.testing.assert_array_equal(np.asarray(a.zbuf), np.asarray(b.zbuf))
        np.testing.assert_array_equal(
            np.asarray(a.dists2), np.asarray(b.dists2))
        np.testing.assert_array_equal(
            np.asarray(a.features), np.asarray(b.features))

    def loss(p, impl):
        s = dataclasses.replace(base, impl=impl)
        fr = rasterize_points(
            Pointclouds.from_padded(p), camera, s,
            extra=jnp.ones((2, 400, 2)) * p[..., 2:3])
        m = fr.mask
        return (jnp.sum(jnp.where(m, fr.zbuf, 0.0)
                        + jnp.where(m, fr.dists2, 0.0))
                + jnp.sum(fr.features))

    g1 = jax.grad(lambda p: loss(p, "xla"))(pcl.points)
    g2 = jax.grad(lambda p: loss(p, "pallas"))(pcl.points)
    assert np.isfinite(np.asarray(g2)).all()
    np.testing.assert_allclose(
        np.asarray(g1), np.asarray(g2), atol=1e-5, rtol=1e-5)


def test_lane_multiple_budget_nudge_grows_budget():
    """max_points_per_bin that lands on a 128 multiple is stepped up by 32
    internally (a measured TPU gather cliff: 128-multiple slot counts run
    1.6-3x slower). The nudge only ever GROWS the budget, so a scene whose
    max bin count lies in (128, 160] must render identically at budget 128
    (nudged to 160) and an explicit 160 — if the nudge were deleted (or
    stepped DOWN), budget 128 would drop the cluster's deepest points and
    the deep K slots would differ."""
    import dataclasses

    from torch_renderer_tpu.rasterize.binning import count_bbox_overflow
    from torch_renderer_tpu.rasterize.points import project_points_screen

    rng = np.random.default_rng(7)
    # ~100 points clustered inside ONE 16px tile (offset off the central
    # tile corner) + background spread: max bin count lands at 154
    cluster = np.concatenate([
        rng.normal(0, 0.02, (100, 2)) + 0.35, np.full((100, 1), 2.5)
    ], axis=1)
    spread = rng.normal(0, 0.4, (260, 3))
    spread[:, 2] += 2.5
    pts = np.concatenate([cluster, spread]).astype(np.float32)[None]
    pcl = Pointclouds.from_padded(jnp.asarray(pts))
    camera = cam()
    base = PointsRasterizationSettings(
        (H, W), radius=0.04, points_per_pixel=4,
        bin_size=16, max_points_per_bin=128,
    )
    q, z, valid = project_points_screen(pcl, camera, base.znear)
    r = jnp.full(z.shape, base.radius)
    mx = count_bbox_overflow(q - r[..., None], q + r[..., None], valid,
                             (H, W), 16)
    assert 128 < mx <= 160, mx  # the scene actually exercises the nudge
    a = rasterize_points(pcl, camera, base)
    b = rasterize_points(
        pcl, camera, dataclasses.replace(base, max_points_per_bin=160))
    np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
    np.testing.assert_array_equal(np.asarray(a.zbuf), np.asarray(b.zbuf))


def test_binned_small_cloud_fewer_points_than_k():
    pcl = Pointclouds.from_padded(jnp.asarray([[[0.0, 0.0, 2.0]]]))
    frags = rasterize_points(
        pcl, cam(),
        PointsRasterizationSettings(
            (H, W), radius=0.05, points_per_pixel=8,
            bin_size=16, max_points_per_bin=32,
        ),
    )
    assert frags.idx.shape == (1, H, W, 8)
    hit = np.asarray(frags.idx[0, :, :, 0]) >= 0
    assert hit[H // 2, W // 2]
    assert np.asarray(frags.idx[..., 1:]).max() == -1  # slots beyond the point


def test_renderer_binned_kwargs_and_suggest():
    """PointsRenderer's bin_size/max_points_per_bin kwargs engage the
    binned path with suggest_points_per_bin's auto budget: composite
    parity with the dense renderer (different-but-exact d2 formulations:
    matmul expansion vs direct differences — eps-level) and finite
    nonzero position gradients."""
    import dataclasses

    from torch_renderer_tpu.rasterize.points import (
        PointsRasterizationSettings,
        suggest_points_per_bin,
    )
    from torch_renderer_tpu.renderer import AlphaPointRender

    B, P, S = 2, 800, 96
    rng = np.random.default_rng(0)
    pcd = Pointclouds(
        points=jnp.asarray(
            rng.standard_normal((B, P, 3)).astype(np.float32) * 0.4),
        num_points=jnp.full((B,), P, jnp.int32),
        features=jnp.asarray(
            rng.uniform(0, 1, (B, P, 3)).astype(np.float32)),
    )
    f = 0.8 * S
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.tile(np.array([0.0, 0.0, 2.5], np.float32), (B, 1))

    dense = AlphaPointRender(K, (S, S), radius=0.02)
    cam = dense.camera_with_pose(R, t)
    mpb = suggest_points_per_bin(
        pcd, cam,
        PointsRasterizationSettings(image_size=(S, S), radius=0.02,
                                    bin_size=16),
    )
    binned = AlphaPointRender(K, (S, S), radius=0.02, bin_size=16,
                              max_points_per_bin=mpb)
    d = np.abs(np.asarray(dense.render(pcd, R, t))
               - np.asarray(binned.render(pcd, R, t))).max()
    assert d < 2e-5, d

    def loss(p):
        pc = dataclasses.replace(pcd, points=p)
        return jnp.sum(binned.render(pc, R, t) ** 2)

    g = jax.grad(loss)(pcd.points)
    assert bool(jnp.all(jnp.isfinite(g))) and float(jnp.abs(g).max()) > 0


def test_splat_weights_follow_radius_override():
    """A per-point radius override must drive the splat WEIGHTS, not just
    the selection: with the settings radius tiny and the override large,
    splats selected at the override radius would be zero-weighted (w =
    1 - d2/r_settings^2 < 0 clipped) if the weights ignored it."""
    import dataclasses

    from torch_renderer_tpu.renderer import PulsarPointRender

    B, P, S = 1, 200, 64
    rng = np.random.default_rng(2)
    pcd = Pointclouds(
        points=jnp.asarray(
            rng.standard_normal((B, P, 3)).astype(np.float32) * 0.3),
        num_points=jnp.full((B,), P, jnp.int32),
        features=jnp.asarray(
            rng.uniform(0.2, 1, (B, P, 3)).astype(np.float32)),
    )
    f = 0.8 * S
    K = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.array([0.0, 0.0, 2.5], np.float32)

    for kw in ({}, {"bin_size": 16, "max_points_per_bin": 128}):
        r = PulsarPointRender(K, (S, S), radius=1e-4, **kw)
        img = np.asarray(r.render(pcd, R, t, radius=np.full((B, P), 0.05,
                                                            np.float32)))
        # alpha channel must show substantial coverage (weights alive)
        assert img[..., -1].max() > 0.5, img[..., -1].max()
        big = r.render(pcd, R, t,
                       radius=np.full((B, P), 0.05, np.float32))
        small_sel = PulsarPointRender(K, (S, S), radius=0.05, **kw)
        ref = small_sel.render(pcd, R, t)
        np.testing.assert_allclose(
            np.asarray(big), np.asarray(ref), atol=2e-5
        )  # override==settings must agree
