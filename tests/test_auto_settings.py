"""Auto bin-size resolution (pytorch3d default parity — rasterize.autotune).

pytorch3d's contract: bin_size=None means AUTO coarse-to-fine, bin_size=0
forces the naive dense path (reference torch_renderer.py:90-95 passes
RasterizationSettings through to pytorch3d untouched, so its defaults are
the parity target). These tests pin:

  * default-config fragments are BIT-EXACT vs the explicitly-configured
    binned path the resolver picks (VERDICT r4 task 1's done-criterion);
  * bin_size=0 forces dense; small scenes/images auto-pick dense;
  * traced auto calls with no cached resolution fall back to dense with a
    warning, and prepare() fixes that;
  * auto-resolved settings default the runtime overflow guard on.
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.rasterize import autotune
from torch_renderer_tpu.renderer import (
    AlphaPointRender,
    MeshRenderer,
    PulsarRenderer,
)
from torch_renderer_tpu.structures.meshes import Meshes
from torch_renderer_tpu.structures.pointclouds import Pointclouds


@pytest.fixture(autouse=True)
def _fresh_cache():
    autotune.clear_cache()
    yield
    autotune.clear_cache()


def _scene(level=3, batch=2, H=128, W=128):
    from torch_renderer_tpu.ops.icosphere import icosphere

    verts, faces = icosphere(level)
    m = Meshes.from_single(np.asarray(verts), np.asarray(faces)).extend(batch)
    f = 0.8 * min(H, W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (batch, 3, 3))
    t = np.tile(np.array([0, 0, 3.0], np.float32), (batch, 1))
    return m, K, R, t


def _cloud(batch=2, N=5000, seed=0):
    pts = np.random.RandomState(seed).randn(batch, N, 3).astype(np.float32)
    return Pointclouds.from_padded(
        jnp.asarray(pts * 0.5),
        features=jnp.ones((batch, N, 3), jnp.float32),
    )


def test_mesh_auto_resolves_binned_and_matches_explicit():
    m, K, R, t = _scene()
    r_auto = MeshRenderer(K, (128, 128), faces_per_pixel=4)
    st = r_auto.resolved_settings(m, R, t)
    assert st.bin_size == autotune.AUTO_TILE
    assert st.max_faces_per_bin < m.faces.shape[1]  # measured, not default
    assert st.check_budgets == "warn"
    out_auto = r_auto.render(m, R, t)

    r_exp = MeshRenderer(
        K, (128, 128), faces_per_pixel=4, bin_size=st.bin_size,
        max_faces_per_bin=st.max_faces_per_bin, active_tiles=st.active_tiles,
    )
    out_exp = r_exp.render(m, R, t)
    assert bool(jnp.all(out_auto.zbuf == out_exp.zbuf))
    assert bool(jnp.all(
        out_auto.fragments.pix_to_face == out_exp.fragments.pix_to_face))
    assert bool(jnp.all(out_auto.fragments.bary == out_exp.fragments.bary))


def test_mesh_bin0_forces_dense_and_agrees():
    m, K, R, t = _scene()
    out_auto = MeshRenderer(K, (128, 128), faces_per_pixel=4).render(m, R, t)
    out_dense = MeshRenderer(
        K, (128, 128), faces_per_pixel=4, bin_size=0
    ).render(m, R, t)
    # independent selection implementations; agree to float tolerance
    np.testing.assert_allclose(
        np.asarray(out_auto.zbuf), np.asarray(out_dense.zbuf), atol=1e-5
    )


def test_small_mesh_auto_stays_dense():
    m, K, R, t = _scene(level=1)  # 80 faces <= MIN_BINNED_FACES
    st = MeshRenderer(K, (128, 128)).resolved_settings(m, R, t)
    assert st.bin_size == 0
    m2, K2, R2, t2 = _scene(level=3, H=16, W=16)  # tiny image
    st2 = MeshRenderer(K2, (16, 16)).resolved_settings(m2, R2, t2)
    assert st2.bin_size == 0


def test_mesh_traced_fallback_warns_then_prepare_fixes_it():
    m, K, R, t = _scene()
    r = MeshRenderer(K, (128, 128), faces_per_pixel=4)

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out_traced = jax.jit(
            lambda m_, R_, t_: r.render(m_, R_, t_).zbuf
        )(m, R, t)
    assert any("falling back to DENSE" in str(x.message) for x in w)

    autotune.clear_cache()
    r.prepare(m, R, t)  # concrete resolution populates the cache
    with warnings.catch_warnings(record=True) as w2:
        warnings.simplefilter("always")
        out_prepared = jax.jit(
            lambda m_, R_, t_: r.render(m_, R_, t_).zbuf
        )(m, R, t)
    assert not any("falling back to DENSE" in str(x.message) for x in w2)
    # the prepared jit ran the binned path (jit-vs-eager only differs at
    # fusion eps, never the dense-vs-binned selection scale)
    np.testing.assert_allclose(
        np.asarray(out_prepared), np.asarray(r.render(m, R, t).zbuf),
        atol=1e-5,
    )
    # ... and agrees with the traced dense fallback to float tolerance
    np.testing.assert_allclose(
        np.asarray(out_traced), np.asarray(out_prepared), atol=1e-5
    )


def test_points_auto_matches_explicit_and_dense():
    pcl = _cloud()
    _, K, R, t = _scene()
    r_auto = AlphaPointRender(K, (128, 128), radius=0.02)
    st = r_auto.resolved_settings(pcl, R, t)
    assert st.bin_size == autotune.AUTO_TILE
    assert st.check_budgets == "warn"
    img_auto = r_auto.render(pcl, R, t)

    r_exp = AlphaPointRender(
        K, (128, 128), radius=0.02, bin_size=st.bin_size,
        max_points_per_bin=st.max_points_per_bin,
        active_tiles=st.active_tiles,
    )
    assert bool(jnp.all(img_auto == r_exp.render(pcl, R, t)))

    img_dense = AlphaPointRender(
        K, (128, 128), radius=0.02, bin_size=0
    ).render(pcl, R, t)
    np.testing.assert_allclose(
        np.asarray(img_auto), np.asarray(img_dense), atol=1e-5
    )


def test_small_cloud_auto_stays_dense():
    pcl = _cloud(N=512)
    _, K, R, t = _scene()
    st = AlphaPointRender(K, (128, 128)).resolved_settings(pcl, R, t)
    assert st.bin_size == 0


def test_pulsar_auto_sizes_with_ndc_radii():
    pcl = _cloud()
    _, K, R, t = _scene()
    pu = PulsarRenderer(K, (128, 128), radius=0.05)
    st = pu.resolved_settings(pcl, R, t)
    assert st.bin_size == autotune.AUTO_TILE
    # prepare() must agree with what render() resolves (same cache entry)
    autotune.clear_cache()
    st2 = pu.prepare(pcl, R, t)
    assert st2 == st
    img = pu.render(pcl, R, t)
    assert img.shape == (2, 128, 128, 4)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_auto_budget_guard_warns_on_shape_key_reuse():
    """The resolved budget is cached per SHAPE key; a denser same-shape
    scene later must trip the default 'warn' guard instead of silently
    dropping candidates."""
    _, K, R, t = _scene()
    sparse = _cloud(seed=0)
    r = AlphaPointRender(K, (128, 128), radius=0.02)
    r.prepare(sparse, R, t)  # budgets sized on the sparse cloud

    dense_pts = np.random.RandomState(1).randn(2, 5000, 3).astype(np.float32)
    crowded = Pointclouds.from_padded(
        jnp.asarray(dense_pts * 0.02),  # all splats in a few tiles
        features=jnp.ones((2, 5000, 3), jnp.float32),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        jax.block_until_ready(r.render(crowded, R, t))
    assert any("overflow" in str(x.message) for x in w)


def test_points_auto_impl_tile_fallback():
    """impl='auto' with an unsupported kernel tile falls back to the XLA
    selection path with a warning; impl='pallas' raises."""
    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.rasterize.points import (
        PointsRasterizationSettings,
        rasterize_points,
    )

    pcl = _cloud(N=2000)
    _, K, R, t = _scene()
    cam = PerspectiveCamera.from_K(K, (128, 128), R=R, t=t)
    st = PointsRasterizationSettings(
        (128, 128), radius=0.02, bin_size=8, max_points_per_bin=256,
        impl="auto",
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        frags = rasterize_points(pcl, cam, st)
    if jax.default_backend() == "tpu":
        assert any("supported tiles" in str(x.message) for x in w)
    assert frags.idx.shape[-1] == st.points_per_pixel

    st_force = PointsRasterizationSettings(
        (128, 128), radius=0.02, bin_size=8, max_points_per_bin=256,
        impl="pallas",
    )
    with pytest.raises(ValueError, match="supports bin_size"):
        rasterize_points(pcl, cam, st_force)


def test_pallas_impl_with_auto_dense_warns_not_raises():
    """impl='pallas' + bin_size=None on a scene auto resolves to dense
    (small mesh) must RENDER with a warning, not raise a ValueError about
    a bin_size the user never set; the dense point path likewise says so
    instead of silently ignoring the explicit impl (round-5 review)."""
    m, K, R, t = _scene(level=1)  # 80 faces: below MIN_BINNED_FACES
    r = MeshRenderer(K, (128, 128), impl="pallas")  # bin_size default None
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        out = r.render(m, R, t)
    assert np.isfinite(np.asarray(out.depth)).all()
    assert any("DENSE" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]

    pcd = _cloud(N=512)  # below MIN_BINNED_POINTS -> auto dense
    pr = AlphaPointRender(K, (128, 128), radius=0.02, impl="pallas")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        img = pr.render(pcd, jnp.asarray(R), jnp.asarray(t))
    assert np.isfinite(np.asarray(img)).all()
    assert any("DENSE" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]

    # explicit bin_size=0 + impl='pallas' points: warns in the dense
    # branch rather than silently ignoring the impl
    pr0 = AlphaPointRender(K, (128, 128), radius=0.02, impl="pallas",
                           bin_size=0)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        img0 = pr0.render(pcd, jnp.asarray(R), jnp.asarray(t))
    assert np.isfinite(np.asarray(img0)).all()
    assert any("DENSE point path" in str(w.message) for w in rec), \
        [str(w.message) for w in rec]

    # explicit bin_size=0 with impl='pallas' on the MESH path keeps the
    # hard error (the user chose both, they conflict)
    r2 = MeshRenderer(K, (128, 128), impl="pallas", bin_size=0)
    with pytest.raises(ValueError, match="bin_size"):
        r2.render(m, R, t)


def test_points_auto_grow_merges_budgets():
    """grow=True re-measures a cached resolution and max-merges budgets:
    the sharded render path sizes from EVERY shard's slice this way, so a
    denser cloud on a later shard cannot silently overflow a budget sized
    from shard 0 (round-5 review finding)."""
    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.rasterize.autotune import resolve_points_settings
    from torch_renderer_tpu.rasterize.points import PointsRasterizationSettings

    N = 4000
    rng = np.random.RandomState(0)
    sparse = Pointclouds.from_padded(
        jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.8))
    dense = Pointclouds.from_padded(
        jnp.asarray(rng.randn(1, N, 3).astype(np.float32) * 0.05))  # clustered
    f = 0.8 * 128
    K = np.array([[f, 0, 64], [0, f, 64], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(
        K, (128, 128), R=np.eye(3, dtype=np.float32)[None],
        t=np.array([[0, 0, 3.0]], np.float32))
    s = PointsRasterizationSettings(image_size=(128, 128), radius=0.02,
                                    bin_size=None)
    r0 = resolve_points_settings(s, sparse, cam)
    # cache hit without grow: dense cloud does NOT change the budget
    r1 = resolve_points_settings(s, dense, cam)
    assert r1.max_points_per_bin == r0.max_points_per_bin
    # grow=True: re-measured and merged upward
    r2 = resolve_points_settings(s, dense, cam, grow=True)
    assert r2.max_points_per_bin > r0.max_points_per_bin
    # growing with the SPARSE cloud again never shrinks
    r3 = resolve_points_settings(s, sparse, cam, grow=True)
    assert r3.max_points_per_bin == r2.max_points_per_bin


def test_pose_fit_prepare_uses_motion_margin():
    """Pose fits size auto budgets at 2x (moving footprint — the pose
    apps' documented protocol) and GROW an earlier 1.5x cached
    resolution instead of silently reusing it (round-5 review)."""
    from torch_renderer_tpu.rasterize.autotune import resolve_mesh_settings

    m, K, R, t = _scene()
    r = MeshRenderer(K, (128, 128), faces_per_pixel=4)
    st_static = r.prepare(m, R, t)                       # 1.5x, cached
    st_pose = r.prepare(m, R, t, grow=True, margin=2.0)  # re-measured at 2x
    assert st_pose.max_faces_per_bin > st_static.max_faces_per_bin
    # subsequent plain resolution sees the grown entry (never shrinks)
    st_after = r.resolved_settings(m, R, t)
    assert st_after.max_faces_per_bin == st_pose.max_faces_per_bin
