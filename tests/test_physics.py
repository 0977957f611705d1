"""Rigid-body pose settling tests (datagen.physics).

The reference settles its scene objects with Blender physics
(coco_data_generator.py:296-309); these tests gate the TPU-native settle
sim: bodies come to rest ON the ground plane, do not interpenetrate, topple
out of unstable orientations, stay inside the room walls, and the datagen
integration produces renderable scenes."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_renderer_tpu.datagen.coco import (
    COCODataGenerator,
    DataGenConfig,
    ObjectLibrary,
)
from torch_renderer_tpu.datagen.physics import (
    SettleConfig,
    collision_proxies,
    drop_poses,
    settle_poses,
)
from torch_renderer_tpu.ops.icosphere import cube, icosphere

SCALE = 0.12


def _settle_single(verts, seed=1, cfg=SettleConfig()):
    pts, com, r = collision_proxies(verts)
    rng = np.random.default_rng(seed)
    p0, q0 = drop_poses(rng, 1, np.zeros((1, 2), np.float32), np.array([r]))
    R, t, res = settle_poses(
        jnp.asarray(pts)[None], jnp.asarray([r]), jnp.asarray(p0),
        jnp.asarray(q0), jnp.ones(1), cfg,
    )
    world = np.asarray(t[0]) + np.asarray(pts) @ np.asarray(R[0]).T
    return np.asarray(R[0]), np.asarray(t[0]), world, float(res)


def test_sphere_rests_on_floor():
    sv, _ = icosphere(2)
    R, t, world, res = _settle_single(sv * SCALE)
    # lowest collision proxy touches the plane (small spring penetration ok)
    assert abs(world[:, 2].min()) < 3e-3
    # COM sits roughly one (faceted) radius above the floor
    assert 0.8 * SCALE < t[2] < 1.05 * SCALE
    # settled: residual speed far below the drop's impact speed (~1.5 m/s)
    assert res < 0.15
    # rotations stay orthonormal through the integration
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-4)


def test_tall_box_topples_to_stable_side():
    cv, _ = cube(1.4)
    box = cv * np.array([0.5, 0.5, 1.5], np.float32) * SCALE
    half_side = box[:, 0].max()       # small half-extent (~0.042)
    half_up = box[:, 2].max()         # tall half-extent (~0.126)
    # several random drops: every one must end resting on a long side
    # (COM at the small half-extent), never balanced on its end
    for seed in range(4):
        _, t, world, _ = _settle_single(box, seed=seed)
        assert abs(world[:, 2].min()) < 3e-3
        assert t[2] < 0.6 * half_up, f"seed {seed}: balanced upright"
        assert abs(t[2] - half_side) < 0.35 * half_side


def test_two_bodies_separate():
    sv, _ = icosphere(2)
    pts, com, r = collision_proxies(sv * SCALE)
    pts2 = jnp.stack([jnp.asarray(pts)] * 2)
    radii = jnp.asarray([r, r])
    # dropped nearly on top of each other -> must push apart
    xy = np.array([[0.0, 0.0], [0.01, 0.0]], np.float32)
    p0, q0 = drop_poses(np.random.default_rng(0), 2, xy, np.asarray(radii))
    cfg = SettleConfig(extent=0.5)
    R, t, _ = settle_poses(pts2, radii, jnp.asarray(p0), jnp.asarray(q0),
                           jnp.ones(2), cfg)
    t = np.asarray(t)
    dist = np.linalg.norm(t[0] - t[1])
    assert dist > 0.9 * 2 * r
    # room walls hold: both inside extent + radius
    assert np.abs(t[:, :2]).max() < 0.5 + r + 1e-3


def test_inactive_bodies_stay_frozen():
    sv, _ = icosphere(1)
    pts, com, r = collision_proxies(sv * SCALE)
    pts2 = jnp.stack([jnp.asarray(pts)] * 2)
    radii = jnp.asarray([r, r])
    p0 = np.array([[0.0, 0.0, 0.3], [0.2, 0.0, 0.3]], np.float32)
    q0 = np.tile(np.array([1.0, 0, 0, 0], np.float32), (2, 1))
    active = jnp.asarray([1.0, 0.0])
    R, t, _ = settle_poses(pts2, radii, jnp.asarray(p0), jnp.asarray(q0),
                           active)
    assert np.allclose(np.asarray(t[1]), p0[1])       # frozen exactly
    assert np.allclose(np.asarray(R[1]), np.eye(3), atol=1e-6)
    assert float(t[0, 2]) < 0.2                        # active one fell


def test_datagen_physics_mode_renders():
    lib = ObjectLibrary.primitives(3, level=1)
    cfg = DataGenConfig(
        image_size=(48, 64), views_per_scene=2, objects_per_scene=(2, 3),
        placement_mode="physics", material_mode="vertex", view_chunk=2,
        normal_maps=False,
    )
    gen = COCODataGenerator(lib, cfg)
    rng = np.random.default_rng(3)
    scene, poses = gen.sample_scene(rng)
    nv = int(scene.meshes.num_verts[0])
    v = np.asarray(scene.meshes.verts[0][:nv])
    assert v[:, 2].min() > -5e-3          # everything rests on/above floor
    assert np.isfinite(v).all()
    # settled poses recorded per object with valid rotations
    for pose in poses:
        R = np.asarray(pose["R"], np.float32)
        assert np.allclose(R @ R.T, np.eye(3), atol=1e-3)
    out = gen.render_scene(scene, rng)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    # objects actually appear in at least one view
    seg = np.asarray(out["segmentation"])
    assert (seg != 255).any() if seg.dtype == np.uint8 else (seg >= 0).any()


def test_bad_placement_mode_raises():
    lib = ObjectLibrary.primitives(1, level=0)
    import pytest

    with pytest.raises(ValueError):
        COCODataGenerator(lib, DataGenConfig(placement_mode="hover"))
