"""Group-packed K=1 selection path: parity vs the XLA binned path.

The packed hard layout is a MEASURED NEGATIVE RESULT for performance
(pallas_hard.py block comment has the 720p numbers) kept as a bit-exact,
opt-in second implementation — these tests pin that exactness so it stays
a valid validation oracle. Runs in interpret mode on CPU (conftest forces
cpu); the compiled kernel was verified bit-exact vs the XLA path on TPU
at tile 16 AND 32 (docs/ROUND2_NOTES.md).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import torch_renderer_tpu as trt
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.rasterize.binning import suggest_active_tiles_fd
from torch_renderer_tpu.rasterize.geometry import setup_faces
from torch_renderer_tpu.rasterize.raster import (
    RasterizationSettings,
    rasterize_face_data,
)

H, W = 96, 96
F = 0.8 * 96
K_MAT = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1]], np.float32)


def scene(batch=2, level=2):
    verts, faces = icosphere(level)
    meshes = trt.Meshes.from_single(verts, faces).extend(batch)
    ts = np.stack(
        [[0.1 * i, -0.05 * i, 2.5 + 0.5 * i] for i in range(batch)]
    ).astype(np.float32)
    cam = trt.PerspectiveCamera.from_K(
        K_MAT, (H, W),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (batch, 3, 3)), t=ts,
    )
    return meshes, cam


def settings(fd, blur=0.0, tile=16, **kw):
    act = suggest_active_tiles_fd(fd, (H, W), tile, 0.0)
    return RasterizationSettings(
        (H, W), blur_radius=blur, faces_per_pixel=1, bin_size=tile,
        max_faces_per_bin=128, active_tiles=act, layout="packed", **kw
    )


@pytest.mark.parametrize("blur", [0.0, 1e-4])
def test_packed_matches_xla_binned(blur):
    meshes, cam = scene()
    fd = setup_faces(meshes, cam)
    st = settings(fd, blur=blur)
    ours = rasterize_face_data(fd, st)
    ref = rasterize_face_data(
        fd, dataclasses.replace(st, impl="xla", layout="tile")
    )
    po = np.asarray(ours.pix_to_face)
    pr = np.asarray(ref.pix_to_face)
    # winner ties in the blur band are fp-ordering artifacts (as in
    # test_pallas_hard); require disagreements to be rare depth ties
    diff = po != pr
    assert diff.mean() < 1e-3, diff.mean()
    same = ~diff
    np.testing.assert_allclose(
        np.asarray(ours.zbuf)[same], np.asarray(ref.zbuf)[same], atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(ours.bary)[same[..., None] & np.ones(3, bool)],
        np.asarray(ref.bary)[same[..., None] & np.ones(3, bool)],
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(ours.dists)[same], np.asarray(ref.dists)[same], atol=2e-5
    )


def test_packed_group_lanes_budget():
    meshes, cam = scene()
    fd = setup_faces(meshes, cam)
    from torch_renderer_tpu.rasterize.binning import suggest_group_lanes_fd

    act = suggest_active_tiles_fd(fd, (H, W), 16, 0.0)
    gl = suggest_group_lanes_fd(fd, (H, W), 16, 0.0, act, 128)
    st = settings(fd, group_lanes=gl)
    ours = rasterize_face_data(fd, st)
    ref = rasterize_face_data(
        fd, dataclasses.replace(st, impl="xla", layout="tile")
    )
    assert (
        np.asarray(ours.pix_to_face) == np.asarray(ref.pix_to_face)
    ).mean() > 0.999


def test_packed_grads_match_xla():
    meshes, cam = scene()

    def loss(v, st):
        fd = setup_faces(meshes.update_padded(v), cam)
        fr = rasterize_face_data(fd, st)
        live = fr.pix_to_face[..., 0] >= 0
        return jnp.sum(
            jnp.where(live, fr.zbuf[..., 0] + fr.dists[..., 0], 0.0)
        )

    fd0 = setup_faces(meshes, cam)
    st = settings(fd0)
    gp = jax.grad(lambda v: loss(v, st))(meshes.verts)
    gx = jax.grad(
        lambda v: loss(v, dataclasses.replace(st, impl="xla", layout="tile"))
    )(meshes.verts)
    scale = float(jnp.max(jnp.abs(gx)))
    np.testing.assert_allclose(
        np.asarray(gp), np.asarray(gx), atol=2e-5 * max(scale, 1.0)
    )


def test_packed_extra_attrs_lane_mapping():
    """The packed winner lanes are converted back to per-tile lanes, so
    BinnedAttributes interpolation matches the per-tile path."""
    from torch_renderer_tpu.rasterize.fragments import interpolate_binned

    meshes, cam = scene()
    fd = setup_faces(meshes, cam)
    B, Fn = fd.valid.shape
    rng = np.random.default_rng(0)
    attr = jnp.asarray(rng.normal(size=(B, Fn, 3, 2)).astype(np.float32))

    st = settings(fd)
    ours = rasterize_face_data(fd, st, extra_face_attrs={"a": attr})
    ref = rasterize_face_data(
        fd, dataclasses.replace(st, impl="pallas", layout="tile"),
        extra_face_attrs={"a": attr},
    )
    assert ours.binned is not None and ref.binned is not None
    io = interpolate_binned(ours)["a"]              # (B, H, W, 1, 2)
    ir = interpolate_binned(ref)["a"]
    same = np.asarray(ours.pix_to_face) == np.asarray(ref.pix_to_face)
    np.testing.assert_allclose(
        np.asarray(io)[same], np.asarray(ir)[same], atol=2e-5
    )


def test_packed_validation_errors():
    meshes, cam = scene()
    fd = setup_faces(meshes, cam)
    st = dataclasses.replace(settings(fd), faces_per_pixel=2)
    with pytest.raises(ValueError, match="faces_per_pixel=1"):
        rasterize_face_data(fd, st)
    st = dataclasses.replace(settings(fd), active_tiles=None)
    with pytest.raises(ValueError, match="active_tiles"):
        rasterize_face_data(fd, st)


def test_packed_offscreen_batch_element():
    """A batch element fully off-screen exercises zero active tiles in its
    groups (all-padding lanes, zero trip counts)."""
    meshes, cam = scene()
    ts = np.array([[0.0, 0.0, 2.5], [10.0, 10.0, 2.5]], np.float32)
    cam = trt.PerspectiveCamera.from_K(
        K_MAT, (H, W),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (2, 3, 3)), t=ts,
    )
    fd = setup_faces(meshes, cam)
    st = settings(fd)
    fr = rasterize_face_data(fd, st)
    assert (np.asarray(fr.pix_to_face)[1] == -1).all()
    assert (np.asarray(fr.zbuf)[1] == -1.0).all()
    assert (np.asarray(fr.pix_to_face)[0] >= 0).any()
