"""Opt-in runtime budget guards (binning.check_budget): every silent-drop
budget class — face bins, active tiles, point bins, group lanes — is caught
at runtime when its configured budget overflows (VERDICT r3 weak #2: the
0.85-alpha fpt=128 overflow incident had no signal; pytorch3d's CUDA binner
at least warns — reference camera_pose_optimizer.py:112-115 sizes bins
against that warning)."""

import warnings

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
    verts, faces = icosphere(2)  # 320 faces: enough to overflow small bins
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * IMG
    K = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.tile(np.array([0.0, 0.0, 2.5], np.float32), (B, 1))
    return meshes, PerspectiveCamera.from_K(K, (IMG, IMG), R=R, t=t)


def _capture(fn):
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        jax.block_until_ready(fn())
    return [str(w.message) for w in rec if w.category is RuntimeWarning]


def test_face_bin_overflow_warns(scene):
    meshes, cam = scene
    s = RasterizationSettings(
        image_size=(IMG, IMG), bin_size=16, max_faces_per_bin=8,
        check_budgets="warn",
    )
    msgs = _capture(lambda: rasterize_meshes(meshes, cam, s))
    assert any("max_faces_per_bin overflow" in m for m in msgs), msgs


def test_face_bin_no_overflow_silent(scene):
    meshes, cam = scene
    s = RasterizationSettings(
        image_size=(IMG, IMG), bin_size=16, max_faces_per_bin=320,
        check_budgets="warn",
    )
    assert _capture(lambda: rasterize_meshes(meshes, cam, s)) == []


def test_active_tiles_overflow_warns(scene):
    meshes, cam = scene
    s = RasterizationSettings(
        image_size=(IMG, IMG), bin_size=16, max_faces_per_bin=320,
        active_tiles=2, check_budgets="warn",
    )
    msgs = _capture(lambda: rasterize_meshes(meshes, cam, s))
    assert any("active_tiles overflow" in m for m in msgs), msgs


def test_point_bin_overflow_warns():
    from torch_renderer_tpu.rasterize.points import (
        PointsRasterizationSettings,
        rasterize_points,
    )
    from torch_renderer_tpu.structures.pointclouds import Pointclouds

    rng = np.random.default_rng(0)
    P = 500
    pts = rng.standard_normal((1, P, 3)).astype(np.float32) * 0.3
    pcd = Pointclouds(points=jnp.asarray(pts),
                      num_points=jnp.full((1,), P, jnp.int32))
    f = 0.8 * IMG
    K = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]], np.float32)
    cam = PerspectiveCamera.from_K(
        K, (IMG, IMG), R=np.eye(3, dtype=np.float32)[None],
        t=np.array([[0.0, 0.0, 2.5]], np.float32))
    s = PointsRasterizationSettings(
        image_size=(IMG, IMG), radius=0.05, bin_size=16,
        max_points_per_bin=4, check_budgets="warn",
    )
    msgs = _capture(lambda: rasterize_points(pcd, cam, s))
    assert any("max_points_per_bin overflow" in m for m in msgs), msgs


def test_group_lanes_overflow_warns(scene):
    from torch_renderer_tpu.rasterize.geometry import setup_face_planes
    from torch_renderer_tpu.rasterize.pallas_soft import (
        soft_silhouette_pallas_fd,
    )

    meshes, cam = scene
    fd = setup_face_planes(meshes, cam)
    msgs = _capture(lambda: soft_silhouette_pallas_fd(
        fd, (IMG, IMG), sigma=1e-4, tile=16, faces_per_tile=128,
        layout="packed", active_tiles=8, group_lanes=128,
        check_budgets="warn",
    ))
    assert any("group_lanes overflow" in m for m in msgs), msgs


def test_occupancy_split_tail_overflow_warns(scene):
    meshes, cam = scene
    s = RasterizationSettings(
        image_size=(IMG, IMG), bin_size=16, max_faces_per_bin=320,
        active_tiles=16, occupancy_split=(1, 2), check_budgets="warn",
    )
    msgs = _capture(lambda: rasterize_meshes(meshes, cam, s))
    assert any("occupancy_split lo_lanes overflow" in m for m in msgs), msgs


def test_checkify_mode_raises(scene):
    from jax.experimental import checkify

    from torch_renderer_tpu.utils.debug import checked_budgets

    meshes, cam = scene
    s = RasterizationSettings(
        image_size=(IMG, IMG), bin_size=16, max_faces_per_bin=8,
        check_budgets="checkify",
    )
    fn = checked_budgets(
        lambda m: rasterize_meshes(m, cam, s).zbuf, jit=False
    )
    with pytest.raises(checkify.JaxRuntimeError, match="max_faces_per_bin"):
        fn(meshes)


def test_process_default_mode(scene):
    from torch_renderer_tpu.rasterize.binning import (
        set_budget_check_default,
    )

    meshes, cam = scene
    s = RasterizationSettings(
        image_size=(IMG, IMG), bin_size=16, max_faces_per_bin=8,
    )  # check_budgets unset: falls back to the process default
    set_budget_check_default("warn")
    try:
        msgs = _capture(lambda: rasterize_meshes(meshes, cam, s))
    finally:
        set_budget_check_default(None)
    assert any("max_faces_per_bin overflow" in m for m in msgs), msgs


def test_warn_mode_degrades_without_callbacks(scene, monkeypatch):
    """On the axon backend (no host send/recv callbacks) warn mode must not
    emit a jax.debug.callback — it would crash the guarded call at run time
    with UNIMPLEMENTED (round-5 regression: the auto-resolved default
    check_budgets='warn' broke every default-config TPU render). It
    degrades to a trace-time notice instead."""
    import warnings

    import jax as _jax

    from torch_renderer_tpu.rasterize import binning

    monkeypatch.setattr(binning, "_axon_backend", lambda: True)

    def _boom(*a, **k):  # any callback emission is the bug
        raise AssertionError("debug.callback emitted on axon")

    monkeypatch.setattr(_jax.debug, "callback", _boom)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        binning.check_budget("max_faces_per_bin", jnp.int32(999), 8, "warn")
    assert any("axon" in str(w.message) for w in rec)


def test_auto_resolution_honors_process_default_off(scene):
    """--check-budgets off must reach auto-resolved (bin_size=None)
    settings too: _auto_guard used to bake 'warn' over the process-wide
    default, silently disabling the documented benching opt-out (round-5
    review finding)."""
    from torch_renderer_tpu.rasterize.autotune import _auto_guard
    from torch_renderer_tpu.rasterize.binning import set_budget_check_default

    class S:  # minimal settings stand-in
        check_budgets = None

    set_budget_check_default("off")
    try:
        assert _auto_guard(S()) == "off"
    finally:
        set_budget_check_default(None)
    assert _auto_guard(S()) == "warn"          # nothing asked: default on
    S.check_budgets = "checkify"
    assert _auto_guard(S()) == "checkify"      # explicit always wins
