"""Binned (coarse-to-fine) top-K selection vs dense selection parity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.rasterize.raster import (
    RasterizationSettings,
    rasterize_meshes,
)
from torch_renderer_tpu.structures.meshes import Meshes

IMG = 48
B = 2


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * IMG
    K = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 2.8], np.float32),
        np.array([0.1, -0.05, 2.5], np.float32),
    ])
    return meshes, PerspectiveCamera.from_K(K, (IMG, IMG), R=R, t=t)


@pytest.mark.parametrize("blur,K_", [(0.0, 1), (0.0, 4), (1e-3, 4)])
def test_binned_matches_dense(scene, blur, K_):
    meshes, cam = scene
    dense = rasterize_meshes(
        meshes, cam,
        RasterizationSettings((IMG, IMG), blur_radius=blur, faces_per_pixel=K_),
    )
    binned = rasterize_meshes(
        meshes, cam,
        RasterizationSettings(
            (IMG, IMG), blur_radius=blur, faces_per_pixel=K_,
            bin_size=16, max_faces_per_bin=80,  # >= total faces: no overflow
        ),
    )
    p2f_b = np.asarray(binned.pix_to_face)
    p2f_d = np.asarray(dense.pix_to_face)
    if blur == 0.0:
        np.testing.assert_array_equal(p2f_b, p2f_d)
        # fused-per-tile vs dense differ only in f32 op ordering
        np.testing.assert_allclose(
            np.asarray(binned.zbuf), np.asarray(dense.zbuf), atol=5e-6
        )
        np.testing.assert_allclose(
            np.asarray(binned.dists), np.asarray(dense.dists), atol=5e-6
        )
    else:
        # blur-band faces can tie in clipped z; dense and binned top_k may
        # order ties differently. Slots must agree almost everywhere and the
        # z-buffer (sorted by construction) must agree everywhere.
        mismatch = (p2f_b != p2f_d).mean()
        assert mismatch < 3e-3, mismatch
        np.testing.assert_allclose(
            np.asarray(binned.zbuf), np.asarray(dense.zbuf), atol=1e-5
        )


def test_binned_gradients_flow(scene):
    meshes, cam = scene
    settings = RasterizationSettings(
        (IMG, IMG), blur_radius=1e-3, faces_per_pixel=4,
        bin_size=16, max_faces_per_bin=80,
    )

    def loss(v):
        frags = rasterize_meshes(meshes.update_padded(v), cam, settings)
        return jnp.sum(jax.nn.relu(frags.zbuf) * frags.mask)

    g = np.asarray(jax.grad(loss)(meshes.verts))
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0


def test_renderer_with_binning(scene):
    from torch_renderer_tpu.renderer import MeshRenderer

    meshes, cam = scene
    f = 0.8 * IMG
    Km = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]], np.float32)
    r_dense = MeshRenderer(Km, (IMG, IMG), faces_per_pixel=2)
    r_binned = MeshRenderer(
        Km, (IMG, IMG), faces_per_pixel=2, bin_size=16, max_faces_per_bin=80
    )
    out_d = r_dense.render(meshes, cam.R, cam.t, with_silhouette=True)
    out_b = r_binned.render(meshes, cam.R, cam.t, with_silhouette=True)
    np.testing.assert_allclose(
        np.asarray(out_b.depth), np.asarray(out_d.depth), atol=5e-6
    )
    # dists noise (5e-6) is amplified by 1/sigma in the sigmoid coverage
    np.testing.assert_allclose(
        np.asarray(out_b.silhouette), np.asarray(out_d.silhouette), atol=2e-4
    )


def test_chunked_binning_matches_unchunked(scene):
    """Scan-chunked binning (large-mesh path) == single-top_k binning."""
    from torch_renderer_tpu.rasterize.binning import bin_faces
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    meshes, cam = scene
    fd = setup_faces(meshes, cam)
    a = bin_faces(fd, (IMG, IMG), 16, 24, 0.0)
    b = bin_faces(fd, (IMG, IMG), 16, 24, 0.0, face_chunk=16)  # force chunked
    np.testing.assert_array_equal(np.asarray(a.face_mask), np.asarray(b.face_mask))
    # identical candidate sets (ordering is by the same score in both paths)
    np.testing.assert_array_equal(
        np.asarray(a.face_idx) * np.asarray(a.face_mask),
        np.asarray(b.face_idx) * np.asarray(b.face_mask),
    )


def test_chunked_onehot_gather_matches(scene):
    """F-chunked one-hot gather (large-mesh path) == small-mesh one-hot."""
    from torch_renderer_tpu.rasterize.binning import bin_faces, gather_bin_planes
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    meshes, cam = scene
    fd = setup_faces(meshes, cam)
    bins = bin_faces(fd, (IMG, IMG), 16, 24, 0.0)
    small = gather_bin_planes(fd, bins)
    big = gather_bin_planes(fd, bins, onehot_max_faces=16)  # force chunked
    for k in small:
        np.testing.assert_allclose(
            np.asarray(small[k]), np.asarray(big[k]), atol=1e-6, err_msg=k
        )


@pytest.mark.parametrize("impl,K_,blur,tile", [
    ("xla", 1, 0.0, 16),
    ("xla", 4, 1e-3, 16),
    ("pallas", 8, 0.0, 16),
])
def test_active_tile_compaction_exact_fragments(impl, K_, blur, tile):
    """settings.active_tiles (tile-axis compaction + scatter-back) is
    bit-exact vs the full grid on every Fragments field, values AND
    gradients, across the XLA K=1/K>1 and fused Pallas K>1 paths."""
    import math

    from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    # image big enough that the sphere leaves most tiles empty
    img = 96
    verts, faces = icosphere(2)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * img
    Km = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 3.5], np.float32),
        np.array([0.4, -0.3, 3.0], np.float32),
    ])
    cam = PerspectiveCamera.from_K(Km, (img, img), R=R, t=t)
    fd = setup_faces(meshes, cam)
    pad = math.sqrt(blur) if blur > 0 else 0.0
    act = suggest_active_tiles_fd(fd, (img, img), tile, pad)
    assert act < (img // tile) ** 2  # compaction engaged

    base = RasterizationSettings(
        image_size=(img, img), faces_per_pixel=K_, blur_radius=blur,
        bin_size=tile, max_faces_per_bin=128, impl=impl,
    )
    full = rasterize_meshes(meshes, cam, base)
    comp = rasterize_meshes(
        meshes, cam, dataclasses.replace(base, active_tiles=act)
    )
    for name in ("pix_to_face", "zbuf", "bary", "dists"):
        np.testing.assert_array_equal(
            np.asarray(getattr(full, name)), np.asarray(getattr(comp, name)),
            err_msg=name,
        )

    def loss(v, st):
        fr = rasterize_meshes(meshes.update_padded(v), cam, st)
        masked = jnp.where(fr.pix_to_face >= 0, fr.zbuf, 0.0)
        return jnp.sum(masked ** 2) + jnp.sum(fr.bary ** 2)

    g_full = jax.grad(loss)(meshes.verts, base)
    g_comp = jax.grad(loss)(
        meshes.verts, dataclasses.replace(base, active_tiles=act)
    )
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_comp))


def test_active_tiles_composes_with_binned_shading():
    """active_tiles + extra_face_attrs: the bin-local attribute channels
    stay compacted through interpolate_binned and the flat Phong chain
    (the joint-fit path); the shaded render must match the full-grid
    result, values and gradients."""
    import math

    from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
    from torch_renderer_tpu.rasterize.geometry import setup_faces
    from torch_renderer_tpu.renderer import MeshRenderer

    img = 96
    verts, faces = icosphere(2)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * img
    Km = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 3.5], np.float32),
        np.array([0.4, -0.3, 3.0], np.float32),
    ])
    blur = 1e-4 * math.log(1 / 1e-4 - 1)

    def renderer(act):
        return MeshRenderer(
            Km, (img, img), blur_radius=blur, faces_per_pixel=4,
            bin_size=16, max_faces_per_bin=128, impl="pallas",
            active_tiles=act,
        )

    cam = renderer(None).camera_with_pose(R, t)
    fd = setup_faces(meshes, cam)
    act = suggest_active_tiles_fd(fd, (img, img), 16, math.sqrt(blur))
    assert act < (img // 16) ** 2

    full = renderer(None).render(meshes, R, t, with_silhouette=True,
                                 with_rgb=True, soft_rgb=True)
    comp = renderer(act).render(meshes, R, t, with_silhouette=True,
                                with_rgb=True, soft_rgb=True)
    np.testing.assert_array_equal(np.asarray(full.depth), np.asarray(comp.depth))
    np.testing.assert_array_equal(np.asarray(full.silhouette),
                                  np.asarray(comp.silhouette))
    np.testing.assert_array_equal(np.asarray(full.rgb), np.asarray(comp.rgb))

    def loss(v, act):
        out = renderer(act).render(
            meshes.update_padded(v), R, t, with_silhouette=True,
            with_rgb=True, soft_rgb=True,
        )
        return (jnp.sum(out.rgb ** 2) + jnp.sum(out.silhouette ** 2)
                + jnp.sum(out.depth ** 2))

    g_full = jax.grad(loss)(meshes.verts, None)
    g_comp = jax.grad(loss)(meshes.verts, act)
    scale = float(jnp.abs(g_full).max())
    assert float(jnp.abs(g_full - g_comp).max()) <= 1e-6 * scale


def test_active_tiles_all_empty_batch_element():
    """A batch element with NOTHING on screen (mesh behind the camera) must
    come back all-background through the compacted path — the zero-active
    corner of the scatter/indicator machinery."""
    import math

    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces).extend(2)
    img = 64
    f = 0.8 * img
    Km = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 2.8], np.float32),
        np.array([0.0, 0.0, -5.0], np.float32),  # behind the camera
    ])
    cam = PerspectiveCamera.from_K(Km, (img, img), R=R, t=t)
    st = RasterizationSettings(
        image_size=(img, img), faces_per_pixel=1, bin_size=16,
        max_faces_per_bin=128, active_tiles=16,
    )
    fr = rasterize_meshes(meshes, cam, st)
    full = rasterize_meshes(
        meshes, cam, dataclasses.replace(st, active_tiles=None)
    )
    np.testing.assert_array_equal(np.asarray(fr.pix_to_face),
                                  np.asarray(full.pix_to_face))
    assert int(jnp.sum(fr.pix_to_face[1] >= 0)) == 0
    assert float(jnp.max(jnp.abs(fr.zbuf[1] + 1.0))) == 0.0  # all -1 sentinel
    assert int(jnp.sum(fr.pix_to_face[0] >= 0)) > 0  # element 0 unaffected


@pytest.mark.parametrize("K_,blur", [(1, 0.0), (4, 1e-3)])
def test_occupancy_split_exact_fragments(K_, blur):
    """settings.occupancy_split (count-ordered actives, full lanes for the
    dense head, lo_lanes for the sparse tail) is bit-exact vs the
    single-budget pipeline on every Fragments field, values AND gradients,
    when the tail budget covers the tail counts."""
    import math

    from torch_renderer_tpu.rasterize.binning import (
        suggest_active_tiles_fd,
        suggest_occupancy_split_fd,
    )
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    img, tile = 96, 16
    verts, faces = icosphere(2)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * img
    Km = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 3.5], np.float32),
        np.array([0.4, -0.3, 3.0], np.float32),
    ])
    cam = PerspectiveCamera.from_K(Km, (img, img), R=R, t=t)
    fd = setup_faces(meshes, cam)
    pad = math.sqrt(blur) if blur > 0 else 0.0
    act = suggest_active_tiles_fd(fd, (img, img), tile, pad)
    split = suggest_occupancy_split_fd(fd, (img, img), tile, pad, act, 128)
    if split is None:  # force a split so the path is exercised regardless
        split = (max(8, act // 2), 64)

    base = RasterizationSettings(
        image_size=(img, img), faces_per_pixel=K_, blur_radius=blur,
        bin_size=tile, max_faces_per_bin=128, impl="xla", active_tiles=act,
    )
    plain = rasterize_meshes(meshes, cam, base)
    sp = rasterize_meshes(
        meshes, cam, dataclasses.replace(base, occupancy_split=split)
    )
    for name in ("pix_to_face", "zbuf", "bary", "dists"):
        np.testing.assert_array_equal(
            np.asarray(getattr(plain, name)), np.asarray(getattr(sp, name)),
            err_msg=name,
        )

    def loss(v, st):
        fr = rasterize_meshes(meshes.update_padded(v), cam, st)
        masked = jnp.where(fr.pix_to_face >= 0, fr.zbuf, 0.0)
        return jnp.sum(masked ** 2) + jnp.sum(fr.bary ** 2)

    g_plain = jax.grad(loss)(meshes.verts, base)
    g_sp = jax.grad(loss)(
        meshes.verts, dataclasses.replace(base, occupancy_split=split)
    )
    # forward is bit-exact (above); the backward accumulates each face's
    # gradient over its overlapping tiles, and count-ordering changes that
    # f32 summation order — tolerance is summation-order noise only
    np.testing.assert_allclose(
        np.asarray(g_plain), np.asarray(g_sp), rtol=1e-5, atol=1e-5
    )


def test_occupancy_split_hi_covers_all_tiles_falls_back():
    """A stale/oversized hi (>= active tile count) must run the single-
    budget path, not demote the last count-ordered tile to lo_lanes
    (which would silently drop its faces beyond lo_lanes)."""
    from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    img, tile = 64, 32
    verts, faces = icosphere(2)
    meshes = Meshes.from_single(verts, faces)
    f = 0.8 * img
    Km = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(
        Km, (img, img), R=np.eye(3, dtype=np.float32)[None],
        t=np.array([[0.0, 0.0, 2.2]], np.float32),
    )
    fd = setup_faces(meshes, cam)
    act = suggest_active_tiles_fd(fd, (img, img), tile, 0.0)
    base = RasterizationSettings(
        image_size=(img, img), bin_size=tile, max_faces_per_bin=512,
        impl="xla", active_tiles=act,
    )
    plain = rasterize_meshes(meshes, cam, base)
    # hi >= A with a lo budget far below the dense tiles' counts
    over = rasterize_meshes(
        meshes, cam,
        dataclasses.replace(base, occupancy_split=(act + 8, 16)),
    )
    np.testing.assert_array_equal(
        np.asarray(plain.pix_to_face), np.asarray(over.pix_to_face)
    )
    np.testing.assert_array_equal(
        np.asarray(plain.zbuf), np.asarray(over.zbuf)
    )
    # A == 1 active tile: must not crash (empty lo subset pre-fix)
    one = dataclasses.replace(
        base, active_tiles=1, occupancy_split=(1, 16)
    )
    fr = rasterize_meshes(meshes, cam, one)
    assert int(jnp.sum(fr.pix_to_face >= 0)) > 0


def test_occupancy_split_conflicting_impl_raises():
    st = RasterizationSettings(
        image_size=(32, 32), bin_size=16, active_tiles=8,
        occupancy_split=(4, 16), impl="pallas",
    )
    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces)
    f = 25.0
    Km = np.array([[f, 0, 16], [0, f, 16], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(
        Km, (32, 32), R=np.eye(3, dtype=np.float32)[None],
        t=np.array([[0.0, 0.0, 3.0]], np.float32),
    )
    with pytest.raises(ValueError, match="XLA binned"):
        rasterize_meshes(meshes, cam, st)
    # impl='auto' + K>1 keeps the split on the XLA path (no error) even
    # where the Pallas kernel would be auto-picked
    ok = dataclasses.replace(
        st, impl="auto", faces_per_pixel=4, max_faces_per_bin=64
    )
    fr = rasterize_meshes(meshes, cam, ok)
    assert int(jnp.sum(fr.pix_to_face >= 0)) > 0


def test_occupancy_split_requires_active_tiles():
    st = RasterizationSettings(
        image_size=(32, 32), bin_size=16, occupancy_split=(8, 32),
    )
    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces)
    f = 25.0
    Km = np.array([[f, 0, 16], [0, f, 16], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(
        Km, (32, 32), R=np.eye(3, dtype=np.float32)[None],
        t=np.array([[0.0, 0.0, 3.0]], np.float32),
    )
    with pytest.raises(ValueError, match="active_tiles"):
        rasterize_meshes(meshes, cam, st)


def test_affine_select_matches_auto():
    """select_impl='affine' (MXU affine selection keys, -denom ordering)
    picks the same winners as the fused VPU form on non-coplanar scenes;
    zbuf/bary/dists are then identical (same interpolation einsum)."""
    img, tile = 96, 16
    verts, faces = icosphere(3)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * img
    Km = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 2.6], np.float32),
        np.array([0.3, -0.2, 3.1], np.float32),
    ])
    cam = PerspectiveCamera.from_K(Km, (img, img), R=R, t=t)
    base = RasterizationSettings(
        image_size=(img, img), bin_size=tile, max_faces_per_bin=256,
        impl="xla",
    )
    plain = rasterize_meshes(meshes, cam, base)
    aff = rasterize_meshes(
        meshes, cam, dataclasses.replace(base, select_impl="affine")
    )
    np.testing.assert_array_equal(
        np.asarray(plain.pix_to_face), np.asarray(aff.pix_to_face)
    )
    for name in ("zbuf", "bary", "dists"):
        np.testing.assert_array_equal(
            np.asarray(getattr(plain, name)), np.asarray(getattr(aff, name)),
            err_msg=name,
        )

    # gradients flow identically (selection is stop-gradient on both)
    def loss(v, st):
        fr = rasterize_meshes(meshes.update_padded(v), cam, st)
        return jnp.sum(jnp.where(fr.pix_to_face >= 0, fr.zbuf, 0.0) ** 2)

    g_plain = jax.grad(loss)(meshes.verts, base)
    g_aff = jax.grad(loss)(
        meshes.verts, dataclasses.replace(base, select_impl="affine")
    )
    np.testing.assert_array_equal(np.asarray(g_plain), np.asarray(g_aff))


def test_affine_select_invalid_configs_raise():
    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces)
    f = 25.0
    Km = np.array([[f, 0, 16], [0, f, 16], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(
        Km, (32, 32), R=np.eye(3, dtype=np.float32)[None],
        t=np.array([[0.0, 0.0, 3.0]], np.float32),
    )
    for bad in (
        dict(faces_per_pixel=4),
        dict(blur_radius=1e-4),
        dict(bin_size=None),
        dict(impl="pallas"),
    ):
        kw = dict(bin_size=16, select_impl="affine")
        kw.update(bad)
        st = RasterizationSettings(image_size=(32, 32), **kw)
        with pytest.raises(ValueError, match="affine"):
            rasterize_meshes(meshes, cam, st)


def test_affine_select_composes_with_occupancy_split():
    """The depth720 production config: active tiles + occupancy split +
    affine selection, all engaged — still bit-exact vs plain binned."""
    from torch_renderer_tpu.rasterize.binning import (
        suggest_active_tiles_fd,
        suggest_occupancy_split_fd,
    )
    from torch_renderer_tpu.rasterize.geometry import setup_faces

    img, tile = 96, 16
    verts, faces = icosphere(2)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * img
    Km = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 3.5], np.float32),
        np.array([0.4, -0.3, 3.0], np.float32),
    ])
    cam = PerspectiveCamera.from_K(Km, (img, img), R=R, t=t)
    fd = setup_faces(meshes, cam)
    act = suggest_active_tiles_fd(fd, (img, img), tile, 0.0)
    split = suggest_occupancy_split_fd(fd, (img, img), tile, 0.0, act, 128)
    if split is None:
        split = (max(8, act // 2), 64)
    base = RasterizationSettings(
        image_size=(img, img), bin_size=tile, max_faces_per_bin=128,
        impl="xla",
    )
    plain = rasterize_meshes(meshes, cam, base)
    combo = rasterize_meshes(
        meshes, cam,
        dataclasses.replace(
            base, active_tiles=act, occupancy_split=split,
            select_impl="affine",
        ),
    )
    for name in ("pix_to_face", "zbuf", "bary", "dists"):
        np.testing.assert_array_equal(
            np.asarray(getattr(plain, name)),
            np.asarray(getattr(combo, name)), err_msg=name,
        )
