"""Coarse-to-fine tile binning for rasterization.

The TPU equivalent of pytorch3d's CUDA coarse-to-fine binning (bin_size /
max_faces_per_bin in RasterizationSettings, reference
camera_pose_optimizer.py:112-115 comments): the image is cut into square
pixel tiles; each tile gets a fixed-size list of candidate faces whose
(blur-expanded) screen bbox intersects it. The fine stage then evaluates only
(tile_pixels x faces_per_tile) pairs instead of (pixels x all_faces) —
typically a 10-30x work reduction — while every shape stays static:

  overlap:   (B, T, F) bool via broadcast bbox tests
  face list: (B, T, Fmax) int32 via top_k over overlap scores (ascending ids)
  gather:    face raster data re-laid-out per tile, (B, T, Fmax, ...)

Overflowing tiles (> Fmax candidates) drop the highest-index faces; pick
faces_per_tile with headroom (count_overflow() reports the true max).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .geometry import FaceRasterData


class TileBins(NamedTuple):
    face_idx: jax.Array   # (B, T, Fmax) int32 candidate face ids (0-padded)
    face_mask: jax.Array  # (B, T, Fmax) bool valid slot
    tile_origin: jax.Array  # (T, 2) raster coords of each tile's pixel (0,0)
    n_tiles_hw: Tuple[int, int]


def tile_grid(image_size, tile: int):
    """Static tile decomposition. Returns (TH, TW, tile_origin_raster (T,2))."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH = -(-H // tile)
    TW = -(-W // tile)
    ty = (jnp.arange(TH, dtype=jnp.float32) * tile + 0.5 - H / 2.0) / s
    tx = (jnp.arange(TW, dtype=jnp.float32) * tile + 0.5 - W / 2.0) / s
    yy, xx = jnp.meshgrid(ty, tx, indexing="ij")
    origin = jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)  # (T, 2)
    return TH, TW, origin


def bin_faces(
    fd: FaceRasterData,
    image_size,
    tile: int,
    faces_per_tile: int,
    pad_radius: float,
) -> TileBins:
    """Assign faces to pixel tiles by blur-expanded screen bbox overlap.

    pad_radius: extra margin in raster (NDC) units — sqrt(blur_radius) for
    soft rasterization, 0 for hard.
    """
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    T = TH * TW
    tile_extent = tile / s  # raster-units size of a tile

    # Face bboxes (B, F, 2x2), expanded by pad_radius.
    fmin = jnp.min(fd.q, axis=2) - pad_radius  # (B, F, 2)
    fmax = jnp.max(fd.q, axis=2) + pad_radius

    # Overlap: face interval vs tile interval per axis.
    t_lo = origin[None, :, None, :]            # (1, T, 1, 2)
    t_hi = t_lo + tile_extent
    lo_ok = fmin[:, None, :, :] <= t_hi        # (B, T, F, 2)
    hi_ok = fmax[:, None, :, :] >= t_lo
    overlap = jnp.all(lo_ok & hi_ok, axis=-1) & fd.valid[:, None, :]  # (B, T, F)

    F = fd.num_faces
    Fmax = min(faces_per_tile, F)
    # Prefer low face ids deterministically: score = F - id where overlapping.
    ids = jnp.arange(F, dtype=jnp.int32)
    score = jnp.where(overlap, (F - ids)[None, None, :], 0)
    vals, idx = jax.lax.top_k(score, Fmax)  # (B, T, Fmax)
    return TileBins(
        face_idx=idx.astype(jnp.int32),
        face_mask=vals > 0,
        tile_origin=origin,
        n_tiles_hw=(TH, TW),
    )


def count_overflow(fd: FaceRasterData, image_size, tile, faces_per_tile, pad_radius):
    """Max candidate count over tiles and how many tiles overflow (debugging/
    autotuning helper; same overlap math as bin_faces)."""
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    tile_extent = tile / s
    fmin = jnp.min(fd.q, axis=2) - pad_radius
    fmax = jnp.max(fd.q, axis=2) + pad_radius
    t_lo = origin[None, :, None, :]
    t_hi = t_lo + tile_extent
    overlap = jnp.all(
        (fmin[:, None, :, :] <= t_hi) & (fmax[:, None, :, :] >= t_lo), axis=-1
    ) & fd.valid[:, None, :]
    counts = jnp.sum(overlap, axis=-1)  # (B, T)
    return jnp.max(counts), jnp.sum(counts > faces_per_tile)


def gather_bins(fd: FaceRasterData, bins: TileBins):
    """Re-lay-out per-face raster data per tile: (B, T, Fmax, ...)."""
    def g(arr):
        return jax.vmap(lambda a, i: a[i])(arr, bins.face_idx)

    return g(fd.q), g(fd.abc), g(fd.area2), g(fd.z), g(fd.invz)


def gather_bin_planes(fd: FaceRasterData, bins: TileBins,
                      onehot_max_faces: int = 8192):
    """Per-tile face data as scalar channel planes, each (B, T, Fmax).

    TPU layout notes:
      * gathering arrays with tiny trailing dims (the (3, 2) corners /
        (3, 3) edge coefficients) makes XLA tile-pad them up to ~40x their
        logical size at big tile counts — hence scalar channels;
      * TPU dynamic gathers run nearly scalar (~90 ns/element), so for
        modest face counts the 12-channel gather is ONE one-hot matmul on
        the MXU instead (chunked over tiles); arbitrary-index gather remains
        the fallback for huge meshes where the one-hot would be wider than
        onehot_max_faces lanes.
    Returns dict with qx0..qy2, z0..2, invz0..2.
    """
    B, T, Fmax = bins.face_idx.shape
    F = fd.num_faces

    planes = jnp.stack(
        [fd.q[:, :, k, 0] for k in range(3)]
        + [fd.q[:, :, k, 1] for k in range(3)]
        + [fd.z[:, :, k] for k in range(3)]
        + [fd.invz[:, :, k] for k in range(3)],
        axis=-1,
    )  # (B, F, 12) — order: qx0..2, qy0..2, z0..2, invz0..2

    if F <= onehot_max_faces:
        # chunk tiles so the one-hot stays a bounded VMEM/HBM guest
        t_chunk = max(1, min(T, 1 + 16_000_000 // (Fmax * F)))
        n_chunks = -(-T // t_chunk)
        padt = n_chunks * t_chunk - T
        idx = jnp.pad(bins.face_idx, ((0, 0), (0, padt), (0, 0)))
        idx = idx.reshape(B, n_chunks, t_chunk, Fmax)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, t_chunk, Fmax, F), 3)

        def chunk_gather(idx_c):  # (B, t_chunk, Fmax) -> (B, t_chunk, Fmax, 12)
            onehot = (idx_c[..., None] == iota).astype(planes.dtype)
            return jnp.einsum(
                "btkf,bfc->btkc", onehot, planes,
                precision=jax.lax.Precision.HIGHEST,
            )

        gathered = jax.lax.map(
            chunk_gather, jnp.swapaxes(idx, 0, 1)
        )  # (n_chunks, B, t_chunk, Fmax, 12)
        gathered = jnp.swapaxes(gathered, 0, 1).reshape(
            B, n_chunks * t_chunk, Fmax, 12
        )[:, :T]
    else:
        flat_idx = bins.face_idx.reshape(B, T * Fmax)
        out = {}
        for c, name in enumerate(_PLANE_ORDER):
            out[name] = jnp.take_along_axis(
                planes[:, :, c], flat_idx, axis=1
            ).reshape(B, T, Fmax)
        return out

    return {name: gathered[..., c] for c, name in enumerate(_PLANE_ORDER)}


_PLANE_ORDER = ("qx0", "qx1", "qx2", "qy0", "qy1", "qy2",
                "z0", "z1", "z2", "invz0", "invz1", "invz2")


def tile_pixel_coords(image_size, tile: int):
    """Local pixel offsets within a tile, raster units: (tile*tile, 2)."""
    H, W = image_size
    s = min(H, W) / 2.0
    d = jnp.arange(tile, dtype=jnp.float32) / s
    yy, xx = jnp.meshgrid(d, d, indexing="ij")
    return jnp.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1)


def untile_image(per_tile: jax.Array, image_size, tile: int, n_tiles_hw):
    """(B, T, tile*tile, C?) -> (B, H, W, C?) cropping any right/bottom pad."""
    TH, TW = n_tiles_hw
    B = per_tile.shape[0]
    trailing = per_tile.shape[3:]
    img = per_tile.reshape((B, TH, TW, tile, tile) + trailing)
    img = jnp.moveaxis(img, 3, 2).reshape((B, TH * tile, TW * tile) + trailing)
    H, W = image_size
    return img[:, :H, :W]
