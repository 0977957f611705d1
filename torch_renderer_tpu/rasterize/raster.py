"""Tiled mesh rasterization with top-K fragments — TPU-shaped, differentiable.

Replaces pytorch3d's CUDA MeshRasterizer (reference torch_renderer.py:97-100,
RasterizationSettings at :90-95) with a two-pass XLA design:

  1. SELECTION (non-differentiable, chunked over pixels): for each pixel tile,
     evaluate all faces' edge functions with one [P,3]x[3,3F] contraction,
     compute coverage (inside or within blur_radius) and perspective-correct
     depth, and take the K nearest faces with lax.top_k. Only int32 indices
     leave this pass, so no O(pixels x faces) residuals are kept for autodiff.

  2. INTERPOLATION (differentiable, O(pixels x K)): gather the selected faces'
     screen data and recompute barycentrics / z / signed distance per slot.
     Gradients w.r.t. vertices flow through this pass only — the same
     select-then-interpolate factorization pytorch3d uses, but expressed as
     pure jittable functions instead of custom CUDA backward kernels.

Soft (SoftRas) gradients come from downstream shaders consuming `dists` and
`zbuf`; a dedicated streaming soft-silhouette path (no top-K) lives in
rasterize/soft.py.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cameras.perspective import PerspectiveCamera
from ..structures.meshes import Meshes
from .fragments import EMPTY_DIST, Fragments
from .geometry import (
    FaceRasterData,
    pixel_coords_raster,
    point_to_edges_dist2,
    setup_faces,
)

INF = jnp.float32(3.0e38)


@dataclasses.dataclass(frozen=True)
class RasterizationSettings:
    """Mirror of pytorch3d.RasterizationSettings (reference
    torch_renderer.py:90-95, deform_mesh_with_color.py:149-159).

    blur_radius is a squared NDC distance (faces within sqrt(blur_radius) of a
    pixel produce fragments); faces_per_pixel is K. pixel_chunk bounds the
    O(pixels x faces) working set of the selection pass.
    """

    image_size: Tuple[int, int]
    blur_radius: float = 0.0
    faces_per_pixel: int = 1
    znear: float = 1e-5
    pixel_chunk: int = 8192
    clip_barycentric_coords: Optional[bool] = None  # default: blur_radius > 0
    # Coarse-to-fine selection: bucket faces into bin_size-pixel tiles and
    # evaluate only each tile's candidates (pytorch3d's bin_size /
    # max_faces_per_bin). None = dense selection over all faces. Size with
    # enough headroom (overflowing tiles silently drop high-index faces) —
    # pallas_soft.suggest_faces_per_tile measures the true maximum.
    bin_size: Optional[int] = None
    max_faces_per_bin: int = 128

    @property
    def clip_bary(self) -> bool:
        if self.clip_barycentric_coords is None:
            return self.blur_radius > 0.0
        return self.clip_barycentric_coords


def _select_chunk(pix: jax.Array, fd_b, K: int, blur: float, znear: float):
    """Top-K nearest covering faces for one pixel chunk of one mesh.

    pix: (P, 2) raster coords. fd_b: unbatched FaceRasterData leaves.
    Returns (P, K) int32 face ids (-1 = empty), sorted near-to-far.
    """
    q, invz, area2, abc, valid = fd_b
    P = pix.shape[0]
    pix_h = jnp.concatenate([pix, jnp.ones((P, 1), pix.dtype)], axis=-1)  # (P,3)

    # Edge functions for every (pixel, face, edge): one MXU contraction.
    e = jnp.einsum("pc,fkc->pfk", pix_h, abc,
                   precision=jax.lax.Precision.HIGHEST)  # (P, F, 3)
    inv_area = 1.0 / area2  # |area2| > eps guaranteed where valid
    bary = e * inv_area[None, :, None]
    inside = jnp.all(bary >= 0.0, axis=-1)

    # Clipped perspective-correct depth (finite in the blur band outside).
    n = jax.nn.relu(bary) * invz[None]  # (P, F, 3)
    denom = jnp.clip(jnp.sum(n, axis=-1), 1e-12, None)
    # z = sum(cb_k * z_k) with cb_k = n_k / denom and z_k = 1/invz_k
    #   = sum(relu(bary)_k) / denom.
    zfrag = jnp.sum(jax.nn.relu(bary), axis=-1) / denom

    if blur > 0.0:
        d2 = point_to_edges_dist2(pix[:, None, :], q[None])  # (P, F)
        cover = inside | (d2 < blur)
    else:
        cover = inside
    cover = cover & valid[None] & (zfrag > znear)

    priority = jnp.where(cover, zfrag, INF)
    k_eff = min(K, priority.shape[-1])
    if k_eff == 1:
        zmin = jnp.min(priority, axis=-1)
        idx = jnp.argmin(priority, axis=-1).astype(jnp.int32)
        out = jnp.where(zmin < INF, idx, -1)[:, None]
    else:
        negz, idx = jax.lax.top_k(-priority, k_eff)  # nearest first
        out = jnp.where(negz > -INF, idx.astype(jnp.int32), -1)
    if k_eff < K:
        out = jnp.pad(out, ((0, 0), (0, K - k_eff)), constant_values=-1)
    return out


def _interpolate(
    pix_all: jax.Array, fd: FaceRasterData, pix_to_face: jax.Array,
    clip_bary: bool,
) -> Fragments:
    """Differentiable re-computation of bary/z/dists for selected fragments.

    pix_all: (HW, 2); pix_to_face: (B, HW, K). Returns flat Fragments with
    image dims (B, HW, K, ...) — caller reshapes to (B, H, W, K, ...).
    """
    safe = jnp.maximum(pix_to_face, 0)

    def gather_b(arr_b, idx_b):
        return arr_b[idx_b]

    g = lambda arr: jax.vmap(gather_b)(arr, safe)
    qf = g(fd.q)          # (B, HW, K, 3, 2)
    zf = g(fd.z)          # (B, HW, K, 3)
    invzf = g(fd.invz)    # (B, HW, K, 3)
    area2f = g(fd.area2)  # (B, HW, K)
    abcf = g(fd.abc)      # (B, HW, K, 3, 3)

    HW = pix_all.shape[0]
    pix_h = jnp.concatenate([pix_all, jnp.ones((HW, 1), pix_all.dtype)], axis=-1)
    e = jnp.einsum("bpkec,pc->bpke", abcf, pix_h,
                   precision=jax.lax.Precision.HIGHEST)  # (B, HW, K, 3)
    bary = e / jnp.where(jnp.abs(area2f) > 1e-12, area2f, 1.0)[..., None]
    inside = jnp.all(bary >= 0.0, axis=-1)

    # Perspective-correct barycentrics.
    npc = bary * invzf
    pc = npc / jnp.clip(jnp.sum(npc, axis=-1, keepdims=True), 1e-12, None)
    if clip_bary:
        rp = jax.nn.relu(pc)
        pc = rp / jnp.clip(jnp.sum(rp, axis=-1, keepdims=True), 1e-12, None)
    zbuf = jnp.sum(pc * zf, axis=-1)

    d2 = point_to_edges_dist2(pix_all[None, :, None, :], qf)  # (B, HW, K)
    dists = jnp.where(inside, -d2, d2)

    live = pix_to_face >= 0
    return Fragments(
        pix_to_face=pix_to_face,
        zbuf=jnp.where(live, zbuf, -1.0),
        bary=jnp.where(live[..., None], pc, 0.0),
        dists=jnp.where(live, dists, EMPTY_DIST),
    )


def _select_binned(fd_sel: FaceRasterData, settings: RasterizationSettings):
    """Coarse-to-fine selection: per-tile candidate lists, then per-pixel
    top-K within each tile. Returns (B, HW, K) global face ids (-1 empty)."""
    import math

    from .binning import bin_faces, gather_bins, tile_pixel_coords, untile_image

    H, W = settings.image_size
    K = settings.faces_per_pixel
    tile = settings.bin_size
    pad_radius = math.sqrt(settings.blur_radius) if settings.blur_radius > 0 else 0.0
    bins = bin_faces(fd_sel, (H, W), tile, settings.max_faces_per_bin, pad_radius)
    q_t, abc_t, a2_t, _, invz_t = gather_bins(fd_sel, bins)
    valid_t = bins.face_mask  # (B, T, Fmax)
    B, T, Fmax = valid_t.shape
    tp = tile * tile

    local = tile_pixel_coords((H, W), tile)  # (tp, 2)
    flat = lambda a: a.reshape((B * T,) + a.shape[2:])
    qf, abcf, a2f, invzf, vf = (
        flat(q_t), flat(abc_t), flat(a2_t), flat(invz_t), flat(valid_t)
    )
    of = jnp.broadcast_to(bins.tile_origin[None], (B, T, 2)).reshape(B * T, 2)

    N = B * T
    tiles_per_chunk = max(1, min(settings.pixel_chunk // tp, N))
    n_chunks = -(-N // tiles_per_chunk)
    padn = n_chunks * tiles_per_chunk - N
    padc = lambda a: jnp.pad(
        a, [(0, padn)] + [(0, 0)] * (a.ndim - 1)
    ).reshape((n_chunks, tiles_per_chunk) + a.shape[1:])

    def per_chunk(args):
        q, invz, a2, abc, v, o = args
        pix = local[None] + o[:, None, :]  # (c, tp, 2)
        return jax.vmap(
            lambda p, q_, i_, a_, ab_, v_: _select_chunk(
                p, (q_, i_, a_, ab_, v_), K, settings.blur_radius, settings.znear
            )
        )(pix, q, invz, a2, abc, v)

    idx_local = jax.lax.map(
        per_chunk, (padc(qf), padc(invzf), padc(a2f), padc(abcf), padc(vf), padc(of))
    ).reshape(n_chunks * tiles_per_chunk, tp, K)[:N]

    # bin-local candidate slot -> global face id
    face_idx_flat = flat(bins.face_idx)  # (N, Fmax)
    g = jax.vmap(lambda f, i: f[jnp.maximum(i, 0)])(face_idx_flat, idx_local)
    g = jnp.where(idx_local >= 0, g, -1)  # (N, tp, K)

    img = untile_image(
        g.reshape(B, T, tp, K), (H, W), tile, bins.n_tiles_hw
    )  # (B, H, W, K)
    return img.reshape(B, H * W, K)


def rasterize_face_data(
    fd: FaceRasterData, settings: RasterizationSettings
) -> Fragments:
    """Rasterize pre-projected faces into per-pixel top-K fragments."""
    H, W = settings.image_size
    K = settings.faces_per_pixel
    pix_all = pixel_coords_raster((H, W))  # (HW, 2)
    HW = pix_all.shape[0]

    fd_sel = jax.lax.stop_gradient(fd)

    if settings.bin_size is not None:
        pix_to_face = _select_binned(fd_sel, settings)  # (B, HW, K)
    else:
        chunk = min(settings.pixel_chunk, HW)
        n_chunks = -(-HW // chunk)
        pad = n_chunks * chunk - HW
        pix_pad = jnp.pad(pix_all, ((0, pad), (0, 0))).reshape(n_chunks, chunk, 2)

        def per_mesh(fd_b):
            leaves = (fd_b.q, fd_b.invz, fd_b.area2, fd_b.abc, fd_b.valid)
            return jax.lax.map(
                lambda pc: _select_chunk(
                    pc, leaves, K, settings.blur_radius, settings.znear
                ),
                pix_pad,
            ).reshape(n_chunks * chunk, K)[:HW]

        pix_to_face = jax.vmap(per_mesh)(fd_sel)  # (B, HW, K)

    frags = _interpolate(pix_all, fd, pix_to_face, settings.clip_bary)
    reshape = lambda a: a.reshape((a.shape[0], H, W) + a.shape[2:])
    return Fragments(
        pix_to_face=reshape(frags.pix_to_face),
        zbuf=reshape(frags.zbuf),
        bary=reshape(frags.bary),
        dists=reshape(frags.dists),
    )


def rasterize_meshes(
    meshes: Meshes, camera: PerspectiveCamera, settings: RasterizationSettings
) -> Fragments:
    """End-to-end: meshes + camera -> Fragments (the MeshRasterizer call)."""
    fd = setup_faces(meshes, camera, znear=settings.znear)
    return rasterize_face_data(fd, settings)
