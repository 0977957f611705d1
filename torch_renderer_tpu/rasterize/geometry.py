"""Vertex/face setup stage of the rasterizer (runs once per render).

Transforms mesh vertices into a normalized raster space and precomputes, per
face, the affine coefficients that make the per-pixel stage a matmul:
every edge function e(p) = a*px + b*py + c and the perspective z-denominator
are linear in pixel coordinates, so a pixel tile evaluates ALL of them with a
single [P, 3] x [3, 4F] contraction — the TPU-shaped replacement for
pytorch3d's CUDA per-pixel face loops (reference torch_renderer.py:97-100).

Raster space: x = (u - W/2) / s, y = (v - H/2) / s with s = min(H, W)/2
(pytorch3d's non-square-NDC scaling), so blur_radius / sigma values from the
reference (e.g. sigma=1e-4 at camera_pose_optimizer.py:109) transfer directly.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras.perspective import PerspectiveCamera
from ..structures.meshes import Meshes


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FaceRasterData:
    """Per-face screen-space quantities (all batched, (B, F, ...))."""

    q: jax.Array        # (B, F, 3, 2) corner positions in raster space
    z: jax.Array        # (B, F, 3) corner camera-space z
    invz: jax.Array     # (B, F, 3) 1/z (clamped)
    area2: jax.Array    # (B, F) signed doubled area in raster space
    abc: jax.Array      # (B, F, 3, 3) edge-function coeffs (a, b, c) per edge k
                        #   edge k is opposite corner k: e_k(p) = abc_k . (px, py, 1)
    zden: jax.Array     # (B, F, 3) coeffs of sum_k e_k(p) * invz_k (linear in p)
    valid: jax.Array    # (B, F) bool: real, front-of-camera, non-degenerate face

    @property
    def num_faces(self) -> int:
        return self.q.shape[1]


# Corner assembly (verts -> per-face corners) strategy: on TPU an
# arbitrary-index gather runs nearly scalar and its VJP is a scatter-add, so
# for meshes below this one-hot size (3F * V elements) the corners are
# assembled with an exact one-hot MXU contraction instead (bf16 3-pass split;
# see binning._split3). Large meshes keep the gather: the one-hot's O(F*V)
# construction would dominate.
_ONEHOT_TAKE_MAX_ELEMS = 64_000_000


@jax.custom_vjp
def _onehot_take(idx: jax.Array, arr: jax.Array) -> jax.Array:
    """out[b, n, c] = arr[b, idx[b, n], c] as an exact one-hot MXU matmul.

    idx (B, N) int32 in [0, V); arr (B, V, C) f32. Exact f32: the one-hot is
    exactly bf16 and arr splits into 3 exactly-bf16 parts (binning._split3).
    The backward is the transpose contraction (d_arr = onehot^T @ g) — a
    matmul where jnp's gather VJP would emit a TPU scatter-add."""
    from .binning import _split3

    V = arr.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2)
    onehot = (idx[:, :, None] == iota).astype(jnp.bfloat16)  # (B, N, V)
    hi, mid, lo = _split3(arr)
    C = arr.shape[-1]
    packed = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(  # one dot; bit-identical to the 3-pass form
        onehot, packed,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    return (y[..., :C] + y[..., C:2 * C]) + y[..., 2 * C:]


def _onehot_take_fwd(idx, arr):
    return _onehot_take(idx, arr), (idx, arr.shape[1])


def _onehot_take_bwd(res, g):
    from .binning import _split3

    idx, V = res
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2)
    onehot = (idx[:, :, None] == iota).astype(jnp.bfloat16)  # (B, N, V)
    hi, mid, lo = _split3(g)
    C = g.shape[-1]
    packed = jnp.concatenate([hi, mid, lo], axis=-1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        onehot, packed,
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, V, 3C)
    d_arr = (y[..., :C] + y[..., C:2 * C]) + y[..., 2 * C:]
    d_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return d_idx, d_arr


_onehot_take.defvjp(_onehot_take_fwd, _onehot_take_bwd)


@jax.custom_vjp
def _onehot_take_cm(idx: jax.Array, arr: jax.Array) -> jax.Array:
    """Channel-major one-hot take: out[b, c, n] = arr[b, c, idx[b, n]].

    idx (B, N) int32 in [0, V); arr (B, C, V) f32. Same exact bf16 3-pass
    contraction as _onehot_take, but the output keeps channels on the
    SUBLANE axis and the item axis on lanes: a (B, C, N) result with small
    C tiles to (8, 128)-aligned (C->8, N->128k) instead of the (B, N, C)
    form whose trailing C pads to 128 lanes (up to 42x HBM/write
    amplification at face-corner channel counts — the reason
    setup_face_planes exists)."""
    from .binning import _split3

    V = arr.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2)
    onehot = (idx[:, :, None] == iota).astype(jnp.bfloat16)  # (B, N, V)
    hi, mid, lo = _split3(arr)
    C = arr.shape[1]
    packed = jnp.concatenate([hi, mid, lo], axis=1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(  # one dot; bit-identical to the 3-pass form
        packed, onehot,
        (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, 3C, N)
    return (y[:, :C] + y[:, C:2 * C]) + y[:, 2 * C:]


def _onehot_take_cm_fwd(idx, arr):
    return _onehot_take_cm(idx, arr), (idx, arr.shape[-1])


def _onehot_take_cm_bwd(res, g):
    from .binning import _split3

    idx, V = res
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, V), 2)
    onehot = (idx[:, :, None] == iota).astype(jnp.bfloat16)  # (B, N, V)
    hi, mid, lo = _split3(g)
    C = g.shape[1]
    packed = jnp.concatenate([hi, mid, lo], axis=1).astype(jnp.bfloat16)
    y = jax.lax.dot_general(
        packed, onehot,
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (B, 3C, V)
    d_arr = (y[:, :C] + y[:, C:2 * C]) + y[:, 2 * C:]
    d_idx = np.zeros(idx.shape, dtype=jax.dtypes.float0)
    return d_idx, d_arr


_onehot_take_cm.defvjp(_onehot_take_cm_fwd, _onehot_take_cm_bwd)


class FacePlanes(NamedTuple):
    """Per-face screen-space channel planes, each (B, F) — the
    tile-padding-free alternative to FaceRasterData for consumers that read
    scalar channels (the binned soft/hard paths). x/y are raster coords of
    corners 0-2; z is camera-space depth; valid as FaceRasterData.valid."""

    x0: jax.Array
    y0: jax.Array
    x1: jax.Array
    y1: jax.Array
    x2: jax.Array
    y2: jax.Array
    z0: jax.Array
    z1: jax.Array
    z2: jax.Array
    valid: jax.Array

    @property
    def num_faces(self) -> int:
        return self.x0.shape[1]


def setup_face_planes(
    meshes: Meshes, camera: PerspectiveCamera, znear: float = 1e-5,
    eps_area: float = 1e-12,
) -> FacePlanes:
    """setup_faces, restated in channel planes (see FacePlanes).

    Same projection/validity math as setup_faces (same reference contract,
    torch_renderer.py:61-80), but corners are assembled CORNER-MAJOR
    through one channel-major one-hot contraction whose (B, 3, 3F) output
    slices into clean (B, F) planes — no (B, F, 3, 2)/(B, F, 3) arrays
    whose tiny trailing dims tile-pad up to 42x are ever materialized.
    """
    H, W = camera.image_size
    s = camera.ndc_scale

    verts_cam = camera.world_to_camera(meshes.verts)  # (B, V, 3)
    uv, z = camera.project(verts_cam)
    x = (uv[..., 0] - W / 2.0) / s
    y = (uv[..., 1] - H / 2.0) / s

    B, V = x.shape
    F = meshes.faces.shape[1]
    # corner-major index layout: idx[:, k*F:(k+1)*F] = corner k of all faces
    idx = jnp.swapaxes(meshes.faces, 1, 2).reshape(B, 3 * F)
    if jax.default_backend() == "tpu" and 3 * F * V <= _ONEHOT_TAKE_MAX_ELEMS:
        arr = jnp.stack([x, y, z], axis=1)                 # (B, 3, V)
        out = _onehot_take_cm(idx, arr)                    # (B, 3, 3F)
        xs = [out[:, 0, k * F:(k + 1) * F] for k in range(3)]
        ys = [out[:, 1, k * F:(k + 1) * F] for k in range(3)]
        zs = [out[:, 2, k * F:(k + 1) * F] for k in range(3)]
    else:
        take = jax.vmap(lambda a, i: a[i])
        xs = [take(x, meshes.faces[:, :, k]) for k in range(3)]
        ys = [take(y, meshes.faces[:, :, k]) for k in range(3)]
        zs = [take(z, meshes.faces[:, :, k]) for k in range(3)]

    front = (zs[0] > znear) & (zs[1] > znear) & (zs[2] > znear)
    area2 = (xs[1] - xs[0]) * (ys[2] - ys[0]) - (ys[1] - ys[0]) * (xs[2] - xs[0])
    valid = (meshes.face_mask() > 0) & front & (jnp.abs(area2) > eps_area)
    return FacePlanes(
        x0=xs[0], y0=ys[0], x1=xs[1], y1=ys[1], x2=xs[2], y2=ys[2],
        z0=zs[0], z1=zs[1], z2=zs[2], valid=valid,
    )


def setup_faces(
    meshes: Meshes, camera: PerspectiveCamera, znear: float = 1e-5,
    eps_area: float = 1e-12,
) -> FaceRasterData:
    """Project meshes through the camera and build per-face raster data.

    Faces with any corner at z <= znear are culled (no near-plane clipping in
    v1 — matches pytorch3d's default behavior of discarding such faces).
    """
    H, W = camera.image_size
    s = camera.ndc_scale

    verts_cam = camera.world_to_camera(meshes.verts)  # (B, V, 3)
    uv, z = camera.project(verts_cam)  # (B, V, 2), (B, V)
    x = (uv[..., 0] - W / 2.0) / s
    y = (uv[..., 1] - H / 2.0) / s
    pts = jnp.stack([x, y], axis=-1)  # (B, V, 2)

    B, V = pts.shape[:2]
    F = meshes.faces.shape[1]
    if (
        jax.default_backend() == "tpu"
        and 3 * F * V <= _ONEHOT_TAKE_MAX_ELEMS
    ):
        # one contraction assembles corners for pts AND z (channel concat)
        arr = jnp.concatenate([pts, z[..., None]], axis=-1)  # (B, V, 3)
        corners = _onehot_take(
            meshes.faces.reshape(B, F * 3), arr
        ).reshape(B, F, 3, 3)
        q = corners[..., :2]   # (B, F, 3, 2)
        fz = corners[..., 2]   # (B, F, 3)
    else:
        def gather_b(arr, faces):
            return arr[faces]

        q = jax.vmap(gather_b)(pts, meshes.faces)  # (B, F, 3, 2)
        fz = jax.vmap(gather_b)(z, meshes.faces)   # (B, F, 3)

    front = jnp.all(fz > znear, axis=-1)
    invz = 1.0 / jnp.clip(fz, znear, None)

    q0, q1, q2 = q[..., 0, :], q[..., 1, :], q[..., 2, :]

    def cross2(u, v):
        return u[..., 0] * v[..., 1] - u[..., 1] * v[..., 0]

    area2 = cross2(q1 - q0, q2 - q0)  # (B, F)

    def edge_coeffs(qa, qb):
        # e(p) = cross(qb - qa, p - qa): a = -(qb-qa).y, b = (qb-qa).x,
        # c = (qb-qa).y * qa.x - (qb-qa).x * qa.y
        g = qb - qa
        a = -g[..., 1]
        b = g[..., 0]
        c = g[..., 1] * qa[..., 0] - g[..., 0] * qa[..., 1]
        return jnp.stack([a, b, c], axis=-1)

    # edge k opposite corner k: e_0 over (q1,q2), e_1 over (q2,q0), e_2 over (q0,q1)
    abc = jnp.stack(
        [edge_coeffs(q1, q2), edge_coeffs(q2, q0), edge_coeffs(q0, q1)], axis=-2
    )  # (B, F, 3, 3)

    zden = jnp.einsum("bfk,bfkc->bfc", invz, abc)  # (B, F, 3)

    valid = (
        (meshes.face_mask() > 0)
        & front
        & (jnp.abs(area2) > eps_area)
    )
    return FaceRasterData(
        q=q, z=fz, invz=invz, area2=area2, abc=abc, zden=zden, valid=valid
    )


def pixel_coords_raster(image_size, dtype=jnp.float32):
    """Raster-space coordinates of all pixel centers: (H*W, 2), row-major."""
    H, W = image_size
    s = min(H, W) / 2.0
    v = (jnp.arange(H, dtype=dtype) + 0.5 - H / 2.0) / s
    u = (jnp.arange(W, dtype=dtype) + 0.5 - W / 2.0) / s
    yy, xx = jnp.meshgrid(v, u, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def point_to_edges_dist2(p: jax.Array, q: jax.Array):
    """Min squared distance from points to a triangle's three edges (segments).

    p: (..., 2) pixel positions; q: (..., 3, 2) triangle corners (broadcast).
    Returns (...,) min over the 3 edge segments.
    """
    d2s = []
    for a_i, b_i in ((0, 1), (1, 2), (2, 0)):
        qa = q[..., a_i, :]
        g = q[..., b_i, :] - qa
        len2 = jnp.clip(jnp.sum(g * g, axis=-1), 1e-12, None)
        w = p - qa
        t = jnp.clip(jnp.sum(w * g, axis=-1) / len2, 0.0, 1.0)
        proj = qa + t[..., None] * g
        d = p - proj
        d2s.append(jnp.sum(d * d, axis=-1))
    return jnp.minimum(jnp.minimum(d2s[0], d2s[1]), d2s[2])


def channel_edge_bary(px, py, qx, qy):
    """Edge functions + (perspective-incorrect) barycentrics from six corner
    CHANNEL rows; px/py broadcast against the per-face rows.

    The one definition of the screen-space inside test for every XLA path
    that works on gathered scalar channels (raster._fragment_math,
    raster._select_tile_channels, soft.soft_silhouette_binned) — identical
    op sequence at each site, so fixing e.g. the 1e-12 degenerate-area
    guard here fixes all of them. Edge k is opposite corner k
    (setup_faces' abc convention). Returns (bary 3-list, inside).
    """
    def cross_e(ax, ay, bx, by):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    e0 = cross_e(qx[1], qy[1], qx[2], qy[2])
    e1 = cross_e(qx[2], qy[2], qx[0], qy[0])
    e2 = cross_e(qx[0], qy[0], qx[1], qy[1])
    area2 = (qx[1] - qx[0]) * (qy[2] - qy[0]) - (qy[1] - qy[0]) * (
        qx[2] - qx[0])
    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)
    bary = [e0 * inv_area, e1 * inv_area, e2 * inv_area]
    inside = (bary[0] >= 0.0) & (bary[1] >= 0.0) & (bary[2] >= 0.0)
    return bary, inside


def channel_min_edge_dist2(px, py, qx, qy, hoist_inv: bool):
    """Min-over-3-edges clamped point-to-segment squared distance from six
    corner channel rows, >= 0.

    hoist_inv picks the division ROUNDING family — the two families must
    not be merged:
      * True:  t = wg * (1/len2), one per-face divide (the soft-coverage
        family; bit-matches pallas_soft._edge_terms so the XLA fallback
        agrees with the fused kernel).
      * False: t = wg / len2 per (pixel, face) pair (the hard-selection
        family; bit-matches pallas_hard's in-kernel math, which the
        winner-identity parity tests require).
    """
    d2 = None
    for a_i, b_i in ((0, 1), (1, 2), (2, 0)):
        gx = qx[b_i] - qx[a_i]
        gy = qy[b_i] - qy[a_i]
        len2 = jnp.clip(gx * gx + gy * gy, 1e-12, None)
        wx = px - qx[a_i]
        wy = py - qy[a_i]
        wg = wx * gx + wy * gy
        if hoist_inv:
            t = jnp.clip(wg * (1.0 / len2), 0.0, 1.0)
        else:
            t = jnp.clip(wg / len2, 0.0, 1.0)
        dd = wx * wx + wy * wy - 2.0 * t * wg + t * t * len2
        d2 = dd if d2 is None else jnp.minimum(d2, dd)
    return jnp.maximum(d2, 0.0)
