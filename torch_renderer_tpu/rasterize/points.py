"""Point-cloud rasterization: per-pixel top-K point splats, TPU-shaped.

Replaces pytorch3d's CUDA PointsRasterizer (consumed by the reference's
AlphaPointRender / NormPointRender / PulsarPointRender at
torch_renderer.py:163-230) with the same two-pass factorization as the mesh
rasterizer (rasterize/raster.py): a non-differentiable chunked SELECTION pass
(one MXU contraction gives every pixel-point screen distance; lax.top_k picks
the K nearest-in-z covering points) and a differentiable INTERPOLATION pass
that recomputes z and squared distances only for the selected K splats.

Conventions match the mesh path: raster space = pytorch3d non-square NDC
(shorter side spans [-1, 1]), so `radius` transfers directly from pytorch3d
PointsRasterizationSettings.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax
import jax.numpy as jnp

from ..cameras.perspective import PerspectiveCamera
from ..structures.pointclouds import Pointclouds
from .geometry import pixel_coords_raster

INF = jnp.float32(3.0e38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointFragments:
    """Per-pixel top-K point hits (pytorch3d PointFragments parity).

    idx:    (B, H, W, K) int32 point index, -1 = empty, sorted near-to-far.
    zbuf:   (B, H, W, K) camera z of the point, -1 for empty.
    dists2: (B, H, W, K) squared pixel-to-center distance in NDC, -1 empty.
    """

    idx: jax.Array
    zbuf: jax.Array
    dists2: jax.Array

    @property
    def mask(self) -> jax.Array:
        return self.idx >= 0


@dataclasses.dataclass(frozen=True)
class PointsRasterizationSettings:
    """pytorch3d PointsRasterizationSettings mirror (radius in NDC units).

    bin_size switches on coarse-to-fine binning (pytorch3d's bin_size /
    max_points_per_bin): points are bucketed into bin_size-pixel tiles by
    their radius-expanded bbox, and each tile evaluates only its own
    candidates — the large-cloud path (dense is O(pixels x points)).
    Overflowing tiles silently drop high-index points; size
    max_points_per_bin with headroom."""

    image_size: Tuple[int, int]
    radius: float = 0.01
    points_per_pixel: int = 8
    znear: float = 1e-5
    pixel_chunk: int = 8192
    bin_size: Union[None, int] = None
    max_points_per_bin: int = 128


def project_points_screen(
    pcls: Pointclouds, camera: PerspectiveCamera, znear: float
):
    """(B, N, 2) raster coords, (B, N) z, (B, N) valid."""
    H, W = camera.image_size
    s = camera.ndc_scale
    pts_cam = camera.world_to_camera(pcls.points)
    uv, z = camera.project(pts_cam)
    x = (uv[..., 0] - W / 2.0) / s
    y = (uv[..., 1] - H / 2.0) / s
    q = jnp.stack([x, y], axis=-1)
    valid = (pcls.mask() > 0) & (z > znear)
    return q, z, valid


def _select_chunk(pix, q, z, valid, radius2, K: int):
    """Top-K nearest-in-z covering points for one pixel chunk of one cloud.

    pix (P, 2); q (N, 2); z, valid, radius2 (N,). Returns (P, K) int32.
    """
    # |p - q|^2 via the matmul expansion (MXU does the cross term).
    pp = jnp.sum(pix * pix, axis=-1)  # (P,)
    qq = jnp.sum(q * q, axis=-1)      # (N,)
    pq = jnp.einsum("pc,nc->pn", pix, q, precision=jax.lax.Precision.HIGHEST)
    d2 = jnp.maximum(pp[:, None] + qq[None, :] - 2.0 * pq, 0.0)  # (P, N)

    cover = (d2 <= radius2[None, :]) & valid[None, :]
    priority = jnp.where(cover, z[None, :], INF)
    k_eff = min(K, priority.shape[-1])  # clouds smaller than K slots
    if k_eff == 1:
        zmin = jnp.min(priority, axis=-1)
        idx = jnp.argmin(priority, axis=-1).astype(jnp.int32)
        out = jnp.where(zmin < INF, idx, -1)[:, None]
    else:
        negz, idx = jax.lax.top_k(-priority, k_eff)
        out = jnp.where(negz > -INF, idx.astype(jnp.int32), -1)
    if k_eff < K:
        out = jnp.pad(out, ((0, 0), (0, K - k_eff)), constant_values=-1)
    return out


def _rasterize_points_binned(
    q, z, valid, radius2, settings: PointsRasterizationSettings
) -> PointFragments:
    """Coarse-to-fine point rasterization: bin points into pixel tiles by
    radius-expanded bbox, then per-tile top-K selection + differentiable
    recomputation via masked one-hot reductions over the tile's candidate
    lanes (mirrors raster._rasterize_binned; no arbitrary-index gathers)."""
    from .binning import (
        bin_bboxes,
        gather_bin_channels,
        tile_pixel_coords,
        untile_image,
    )

    H, W = settings.image_size
    K = settings.points_per_pixel
    tile = settings.bin_size
    B, N = z.shape

    r = jnp.sqrt(radius2)
    bins = bin_bboxes(
        jax.lax.stop_gradient(q - r[..., None]),
        jax.lax.stop_gradient(q + r[..., None]),
        valid, (H, W), tile, settings.max_points_per_bin,
    )
    T = bins.face_idx.shape[1]
    Pmax = bins.face_idx.shape[2]
    tp = tile * tile

    # per-tile candidate channels: x, y, z, r2 (differentiable gather)
    planes = jnp.stack([q[..., 0], q[..., 1], z, radius2], axis=-1)
    ch = gather_bin_channels(planes, bins)           # (B, T, Pmax, 4)
    vmask = bins.face_mask                           # (B, T, Pmax)

    local = tile_pixel_coords((H, W), tile)          # (tp, 2)
    flat = lambda a: a.reshape((B * T,) + a.shape[2:])
    chf = flat(ch)
    vf = flat(vmask)
    fidx = flat(bins.face_idx)
    of = jnp.broadcast_to(bins.tile_origin[None], (B, T, 2)).reshape(B * T, 2)

    NT = B * T
    tiles_per_chunk = max(1, min(settings.pixel_chunk // tp, NT))
    n_chunks = -(-NT // tiles_per_chunk)
    padn = n_chunks * tiles_per_chunk - NT
    padc = lambda a: jnp.pad(
        a, [(0, padn)] + [(0, 0)] * (a.ndim - 1)
    ).reshape((n_chunks, tiles_per_chunk) + a.shape[1:])

    iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Pmax), 2)

    def per_chunk(args):
        chc, v, fi, o = args
        px = local[None, :, 0] + o[:, 0:1]           # (c, tp)
        py = local[None, :, 1] + o[:, 1:2]
        x = chc[..., 0][:, None, :]                  # (c, 1, Pmax)
        y = chc[..., 1][:, None, :]
        zc = chc[..., 2][:, None, :]
        r2 = chc[..., 3][:, None, :]
        dx = px[..., None] - x                       # (c, tp, Pmax)
        dy = py[..., None] - y
        d2 = dx * dx + dy * dy

        cover = (jax.lax.stop_gradient(d2) <= r2) & v[:, None, :] & (
            jax.lax.stop_gradient(zc) > settings.znear
        )
        priority = jnp.where(
            cover, jax.lax.stop_gradient(zc) * jnp.ones_like(d2), INF
        )
        k_eff = min(K, Pmax)
        negz, idx_local = jax.lax.top_k(-priority, k_eff)  # (c, tp, K)
        idx_local = jnp.where(negz > -INF, idx_local, -1)
        if k_eff < K:
            idx_local = jnp.pad(
                idx_local, ((0, 0), (0, 0), (0, K - k_eff)),
                constant_values=-1,
            )

        zbufs, d2s, idxs = [], [], []
        for k in range(min(K, Pmax)):
            mk = idx_local[:, :, k][..., None] == iota_p  # (c, tp, Pmax)
            mf = mk.astype(d2.dtype)
            zbufs.append(jnp.sum(jnp.where(mk, zc, 0.0), axis=-1))
            d2s.append(jnp.sum(mf * d2, axis=-1))
            idxs.append(jnp.sum(mk * fi[:, None, :], axis=-1).astype(jnp.int32))
        for _ in range(Pmax, K):  # clouds smaller than K slots
            zbufs.append(jnp.zeros_like(zbufs[0]))
            d2s.append(jnp.zeros_like(d2s[0]))
            idxs.append(jnp.zeros_like(idxs[0]))

        live = idx_local >= 0
        zbuf = jnp.where(live, jnp.stack(zbufs, axis=-1), -1.0)
        dist2 = jnp.where(live, jnp.stack(d2s, axis=-1), -1.0)
        pidx = jnp.where(live, jnp.stack(idxs, axis=-1), -1)
        return pidx, zbuf, dist2

    pidx, zbuf, dist2 = jax.lax.map(
        per_chunk, (padc(chf), padc(vf), padc(fidx), padc(of))
    )

    def finish(a):
        a = a.reshape((n_chunks * tiles_per_chunk, tp) + a.shape[3:])[:NT]
        a = a.reshape((B, T, tp) + a.shape[2:])
        return untile_image(a, (H, W), tile, bins.n_tiles_hw)

    return PointFragments(
        idx=finish(pidx), zbuf=finish(zbuf), dists2=finish(dist2)
    )


def rasterize_points(
    pcls: Pointclouds, camera: PerspectiveCamera,
    settings: PointsRasterizationSettings,
    radius: Union[None, jax.Array] = None,
) -> PointFragments:
    """Rasterize point clouds into per-pixel top-K fragments.

    radius: optional per-point override (B, N) in NDC units (the Pulsar-style
    sphere radius path); default settings.radius for all points.
    """
    H, W = settings.image_size
    K = settings.points_per_pixel
    q, z, valid = project_points_screen(pcls, camera, settings.znear)
    B, N = z.shape
    if radius is None:
        radius_arr = jnp.full((B, N), settings.radius, jnp.float32)
    else:
        radius_arr = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (B, N))
    radius2 = radius_arr * radius_arr

    if settings.bin_size is not None:
        return _rasterize_points_binned(q, z, valid, radius2, settings)

    pix_all = pixel_coords_raster((H, W))
    HW = pix_all.shape[0]
    chunk = min(settings.pixel_chunk, HW)
    n_chunks = -(-HW // chunk)
    pad = n_chunks * chunk - HW
    pix_pad = jnp.pad(pix_all, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 2)

    q_sel = jax.lax.stop_gradient(q)
    z_sel = jax.lax.stop_gradient(z)

    def per_cloud(args):
        qb, zb, vb, r2b = args
        return jax.lax.map(
            lambda pc: _select_chunk(pc, qb, zb, vb, r2b, K), pix_pad
        ).reshape(n_chunks * chunk, K)[:HW]

    idx = jax.lax.map(per_cloud, (q_sel, z_sel, valid, radius2))  # (B, HW, K)

    # Differentiable recomputation for the selected splats only.
    safe = jnp.maximum(idx, 0)
    gather = lambda arr: jax.vmap(lambda a, i: a[i])(arr, safe)
    qg = gather(q)        # (B, HW, K, 2)
    zg = gather(z)        # (B, HW, K)
    diff = pix_all[None, :, None, :] - qg
    d2 = jnp.sum(diff * diff, axis=-1)

    live = idx >= 0
    reshape = lambda a: a.reshape((B, H, W) + a.shape[2:])
    return PointFragments(
        idx=reshape(idx),
        zbuf=reshape(jnp.where(live, zg, -1.0)),
        dists2=reshape(jnp.where(live, d2, -1.0)),
    )
