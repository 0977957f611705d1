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
    """pytorch3d PointsRasterizationSettings mirror (radius in NDC units)."""

    image_size: Tuple[int, int]
    radius: float = 0.01
    points_per_pixel: int = 8
    znear: float = 1e-5
    pixel_chunk: int = 8192


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
