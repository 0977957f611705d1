"""Group-packed Pallas soft-silhouette layout vs the streaming oracle.

The packed layout shares one lane axis across the 8 tiles of a kernel
program (faces pre-translated into their tile frame; per-tile segmentation
via a one-hot MXU contraction) — see pallas_soft layout="packed" and
binning.pack_groups. Runs in pallas interpret mode on the CPU backend
(conftest); the TPU A/B for this layout is recorded in docs/BENCHMARKS.md.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.rasterize.binning import pack_groups
from torch_renderer_tpu.rasterize.geometry import setup_face_planes
from torch_renderer_tpu.rasterize.pallas_soft import (
    soft_silhouette_pallas,
    suggest_group_lanes,
)
from torch_renderer_tpu.rasterize.soft import soft_silhouette_streaming
from torch_renderer_tpu.structures.meshes import Meshes

IMG = 32
B = 2


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(1)  # 80 faces
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * IMG
    K = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 3.0], np.float32),
        np.array([0.15, -0.1, 2.6], np.float32),
    ])
    cam = PerspectiveCamera.from_K(K, (IMG, IMG), R=R, t=t)
    return meshes, cam


# active_tiles=4 covers A < 8 (single partially-empty pack group);
# active_tiles=9 covers A not a multiple of 8 (internal pad to 16, second
# group fully empty -> zero trip count path). group_lanes=None exercises
# the always-safe 8*faces_per_tile default.
@pytest.mark.parametrize("active_tiles,group_lanes", [
    (4, None),
    (4, 256),
    (9, 256),
])
def test_packed_values_match_streaming(scene, active_tiles, group_lanes):
    meshes, cam = scene
    want = np.asarray(soft_silhouette_streaming(meshes, cam))
    got = np.asarray(
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=80,
            active_tiles=active_tiles, layout="packed",
            group_lanes=group_lanes,
        )
    )
    assert got.shape == want.shape == (B, IMG, IMG)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert want.max() > 0.9


def test_packed_gradients_match_streaming(scene):
    meshes, cam = scene

    def loss_packed(v):
        return jnp.sum(
            soft_silhouette_pallas(
                meshes.update_padded(v), cam, tile=16, faces_per_tile=80,
                active_tiles=4, layout="packed", group_lanes=256,
            )
        )

    def loss_ref(v):
        return jnp.sum(soft_silhouette_streaming(meshes.update_padded(v), cam))

    g1 = np.asarray(jax.grad(loss_packed)(meshes.verts))
    g2 = np.asarray(jax.grad(loss_ref)(meshes.verts))
    assert np.all(np.isfinite(g1))
    assert np.abs(g1).sum() > 0
    np.testing.assert_allclose(g1, g2, atol=5e-3, rtol=5e-3)


def test_packed_requires_active_tiles(scene):
    meshes, cam = scene
    with pytest.raises(ValueError, match="active_tiles"):
        soft_silhouette_pallas(meshes, cam, layout="packed")


def test_suggest_group_lanes(scene):
    meshes, cam = scene
    fp = setup_face_planes(meshes, cam)
    gl = suggest_group_lanes(fp, (IMG, IMG), tile=16, active_tiles=8,
                             faces_per_tile=80)
    # 128-aligned, positive, bounded by the 8 * faces_per_tile ceiling
    assert gl % 128 == 0
    assert 128 <= gl <= 8 * 80
    # and it is safe: packed coverage with the suggested budget matches
    want = np.asarray(soft_silhouette_streaming(meshes, cam))
    got = np.asarray(
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=80, active_tiles=8,
            layout="packed", group_lanes=gl,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_group_overflow_drops_like_face_bins(scene):
    """Candidates beyond group_lanes are dropped (documented), never
    corrupted: coverage with an under-sized budget is <= the full result
    everywhere and exact where tiles fit."""
    meshes, cam = scene
    full = np.asarray(
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=80, active_tiles=4,
            layout="packed", group_lanes=None,
        )
    )
    clipped = np.asarray(
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=80, active_tiles=4,
            layout="packed", group_lanes=128,
        )
    )
    assert (clipped <= full + 1e-6).all()


def test_packed_non_square_image():
    """Tile-frame translation + untile must hold on H != W grids (the tile
    grid is (TH, TW) with right/bottom crop)."""
    from torch_renderer_tpu.rasterize.soft import soft_silhouette_streaming

    verts, faces = icosphere(1)
    meshes = Meshes.from_single(verts, faces).extend(B)
    H, W = 48, 96
    f = 0.8 * min(H, W)
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.tile(np.array([0.0, 0.0, 3.0], np.float32), (B, 1))
    cam = PerspectiveCamera.from_K(K, (H, W), R=R, t=t)
    want = np.asarray(soft_silhouette_streaming(meshes, cam))
    got = np.asarray(
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=80, active_tiles=16,
            layout="packed", group_lanes=256,
        )
    )
    assert got.shape == want.shape == (B, H, W)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_suggest_layout_rule():
    from torch_renderer_tpu.rasterize.pallas_soft import suggest_layout

    assert suggest_layout(128) == "packed"
    assert suggest_layout(512) == "lane"


def test_pack_groups_exact():
    """Unit test of the pack contraction: known per-tile slabs concatenate
    in tile order at exclusive-cumsum offsets, exactly (f32 through the
    bf16-split one-hot)."""
    B_, A, K, C = 1, 8, 4, 2
    rng = np.random.RandomState(0)
    slabs = rng.randn(B_, A, K, C).astype(np.float32)
    capped = np.array([[2, 0, 4, 1, 0, 3, 0, 2]], np.int32)
    n_slots = 16
    packed, n_valid = pack_groups(
        jnp.asarray(slabs), jnp.asarray(capped), n_slots)
    packed = np.asarray(packed)
    assert int(n_valid[0, 0]) == capped.sum()
    want = np.zeros((n_slots, C), np.float32)
    s = 0
    for a in range(A):
        for k in range(capped[0, a]):
            want[s] = slabs[0, a, k]
            s += 1
    np.testing.assert_array_equal(packed[0], want)


# ---------------------------------------------------------------------------
# Occupancy split (hi_tiles / lo_lanes): count-ordered compaction, full
# gather lanes only for the densest tiles. Needs a grid with more than a
# handful of tiles -> its own 64x64 scene (16 tiles).
# ---------------------------------------------------------------------------

IMG_S = 64


@pytest.fixture(scope="module")
def split_scene():
    verts, faces = icosphere(2)  # 320 faces
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.9 * IMG_S
    K = np.array([[f, 0, IMG_S / 2], [0, f, IMG_S / 2], [0, 0, 1]],
                 np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 2.2], np.float32),
        np.array([0.25, -0.2, 2.0], np.float32),
    ])
    cam = PerspectiveCamera.from_K(K, (IMG_S, IMG_S), R=R, t=t)
    return meshes, cam


def test_occupancy_split_values_match_streaming(split_scene):
    meshes, cam = split_scene
    want = np.asarray(soft_silhouette_streaming(meshes, cam))
    # lo_lanes == faces_per_tile: the split changes only the layout
    # (count-ordered tiles + two packs), never the candidate sets, so the
    # result must match the oracle exactly like the unsplit layout does.
    got = np.asarray(
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=320, active_tiles=16,
            layout="packed", group_lanes=1280, hi_tiles=8, lo_lanes=320,
        )
    )
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert want.max() > 0.9

    # thin lo bucket sized by the suggester (its contract: lo_lanes covers
    # every non-hi tile's candidate count, with margin)
    fp = setup_face_planes(meshes, cam)
    from torch_renderer_tpu.rasterize.pallas_soft import (
        suggest_occupancy_split,
    )
    hi = suggest_occupancy_split(fp, (IMG_S, IMG_S), tile=16,
                                 active_tiles=16, lo_lanes=32)
    if hi is not None:
        got2 = np.asarray(
            soft_silhouette_pallas(
                meshes, cam, tile=16, faces_per_tile=320, active_tiles=16,
                layout="packed", group_lanes=1280, hi_tiles=hi,
                lo_lanes=32,
            )
        )
        np.testing.assert_allclose(got2, want, atol=1e-4)


def test_occupancy_split_gradients_match_streaming(split_scene):
    meshes, cam = split_scene

    def loss_split(v):
        return jnp.sum(
            soft_silhouette_pallas(
                meshes.update_padded(v), cam, tile=16, faces_per_tile=320,
                active_tiles=16, layout="packed", group_lanes=1280,
                hi_tiles=8, lo_lanes=320,
            )
        )

    def loss_ref(v):
        return jnp.sum(
            soft_silhouette_streaming(meshes.update_padded(v), cam))

    g1 = np.asarray(jax.grad(loss_split)(meshes.verts))
    g2 = np.asarray(jax.grad(loss_ref)(meshes.verts))
    assert np.all(np.isfinite(g1)) and np.abs(g1).sum() > 0
    np.testing.assert_allclose(g1, g2, atol=5e-3, rtol=5e-3)


def test_occupancy_split_validation(split_scene):
    meshes, cam = split_scene
    with pytest.raises(ValueError, match="hi_tiles"):
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=320, active_tiles=16,
            layout="packed", hi_tiles=5,  # not a multiple of 8
        )
    with pytest.raises(ValueError, match="hi_tiles"):
        soft_silhouette_pallas(
            meshes, cam, tile=16, faces_per_tile=320, active_tiles=16,
            layout="packed", hi_tiles=16,  # must be < active tiles
        )


def test_suggest_soft_config_bundle(scene):
    """suggest_soft_config bundles the suggest_* calls; its kwargs() splat
    must run the kernel and match the streaming oracle."""
    from torch_renderer_tpu.rasterize.pallas_soft import (
        SoftKernelConfig,
        soft_silhouette_pallas_fd,
        suggest_active_tiles,
        suggest_faces_per_tile,
        suggest_soft_config,
    )

    meshes, cam = scene
    fp = setup_face_planes(meshes, cam)
    cfg = suggest_soft_config(fp, cam.image_size, layout="auto")
    assert isinstance(cfg, SoftKernelConfig)
    assert cfg.faces_per_tile == suggest_faces_per_tile(fp, cam.image_size)
    assert cfg.active_tiles == suggest_active_tiles(fp, cam.image_size)
    if cfg.layout == "packed":
        assert cfg.group_lanes is not None

    want = np.asarray(soft_silhouette_streaming(meshes, cam))
    got = np.asarray(
        soft_silhouette_pallas_fd(fp, cam.image_size, **cfg.kwargs())
    )
    np.testing.assert_allclose(got, want, atol=1e-4)

    # forcing the lane layout drops the pack fields
    lane = suggest_soft_config(fp, cam.image_size, layout="lane")
    assert lane.layout == "lane" and lane.group_lanes is None
    got_lane = np.asarray(
        soft_silhouette_pallas_fd(fp, cam.image_size, **lane.kwargs())
    )
    np.testing.assert_allclose(got_lane, want, atol=1e-4)


def test_suggest_soft_config_multi_pose_max(scene):
    """Budgets over several projections are the max of the per-pose
    suggestions (the moving-footprint fit protocol)."""
    from torch_renderer_tpu.rasterize.pallas_soft import (
        suggest_active_tiles,
        suggest_faces_per_tile,
        suggest_soft_config,
    )

    meshes, cam = scene
    # two very different distances -> different footprints/budgets
    t2 = np.stack([
        np.array([0.0, 0.0, 1.8], np.float32),
        np.array([0.0, 0.0, 1.8], np.float32),
    ])
    cam2 = PerspectiveCamera.from_K(
        np.asarray(cam.K()[0]), cam.image_size,
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)), t=t2,
    )
    fps = [setup_face_planes(meshes, c) for c in (cam, cam2)]
    cfg = suggest_soft_config(fps, cam.image_size)
    assert cfg.faces_per_tile == max(
        suggest_faces_per_tile(fp, cam.image_size) for fp in fps
    )
    assert cfg.active_tiles == max(
        suggest_active_tiles(fp, cam.image_size) for fp in fps
    )
