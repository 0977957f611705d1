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
    face_chunk: int = 8192,
) -> TileBins:
    """Assign faces to pixel tiles by blur-expanded screen bbox overlap.

    pad_radius: extra margin in raster (NDC) units — sqrt(blur_radius) for
    soft rasterization, 0 for hard. Meshes larger than face_chunk are binned
    by a scan that merges per-chunk top-k candidate lists (a single top_k
    over a (B, T, 100k) score tensor crashes the TPU compiler).
    """
    H, W = image_size
    s = min(H, W) / 2.0
    TH, TW, origin = tile_grid(image_size, tile)
    T = TH * TW
    tile_extent = tile / s  # raster-units size of a tile

    F = fd.num_faces
    Fmax = min(faces_per_tile, F)
    t_lo = origin[None, :, None, :]            # (1, T, 1, 2)
    t_hi = t_lo + tile_extent

    def chunk_scores(q_c, valid_c, id_c):
        """Candidate scores for one face chunk: higher = keep, 0 = no overlap."""
        fmin = jnp.min(q_c, axis=2) - pad_radius  # (B, Fc, 2)
        fmax = jnp.max(q_c, axis=2) + pad_radius
        lo_ok = fmin[:, None, :, :] <= t_hi      # (B, T, Fc, 2)
        hi_ok = fmax[:, None, :, :] >= t_lo
        overlap = jnp.all(lo_ok & hi_ok, axis=-1) & valid_c[:, None, :]
        # prefer low face ids deterministically
        return jnp.where(overlap, (F - id_c)[None, None, :], 0)

    ids = jnp.arange(F, dtype=jnp.int32)
    if F <= face_chunk:
        score = chunk_scores(fd.q, fd.valid, ids)
        vals, idx = jax.lax.top_k(score, Fmax)  # (B, T, Fmax)
    else:
        n_chunks = -(-F // face_chunk)
        padf = n_chunks * face_chunk - F
        q_p = jnp.pad(fd.q, ((0, 0), (0, padf), (0, 0), (0, 0)))
        v_p = jnp.pad(fd.valid, ((0, 0), (0, padf)))
        id_p = jnp.pad(ids, (0, padf), constant_values=F)  # pad scores to <=0
        B = fd.q.shape[0]
        q_c = jnp.swapaxes(q_p.reshape(B, n_chunks, face_chunk, 3, 2), 0, 1)
        v_c = jnp.swapaxes(v_p.reshape(B, n_chunks, face_chunk), 0, 1)
        id_c = id_p.reshape(n_chunks, face_chunk)

        def body(carry, chunk):
            best_vals, best_idx = carry
            qc, vc, ic = chunk
            sc = chunk_scores(qc, vc, ic)
            cv, ci = jax.lax.top_k(sc, min(Fmax, face_chunk))
            cand_idx = ic[ci]  # global ids via chunk-local lookup
            vals = jnp.concatenate([best_vals, cv], axis=-1)
            idxs = jnp.concatenate([best_idx, cand_idx], axis=-1)
            mv, mi = jax.lax.top_k(vals, Fmax)
            merged_idx = jnp.take_along_axis(idxs, mi, axis=-1)
            return (mv, merged_idx), None

        init = (
            jnp.zeros((fd.q.shape[0], T, Fmax), jnp.int32),
            jnp.zeros((fd.q.shape[0], T, Fmax), jnp.int32),
        )
        (vals, idx), _ = jax.lax.scan(body, init, (q_c, v_c, id_c))

    return TileBins(
        face_idx=jnp.where(vals > 0, idx, 0).astype(jnp.int32),
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

        @jax.checkpoint  # recompute the one-hot in backward, never store it
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
        # large meshes: accumulate one-hot matmuls over face chunks (each
        # candidate id hits exactly one chunk's window)
        n_f = -(-F // onehot_max_faces)
        padf = n_f * onehot_max_faces - F
        planes_p = jnp.pad(planes, ((0, 0), (0, padf), (0, 0)))
        planes_c = jnp.swapaxes(
            planes_p.reshape(B, n_f, onehot_max_faces, 12), 0, 1
        )
        lo_c = jnp.arange(n_f, dtype=jnp.int32) * onehot_max_faces
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, Fmax, onehot_max_faces), 3
        )

        @jax.checkpoint  # one-hot is recomputed in backward, never stored
        def accumulate(acc, pl, lo):
            local = bins.face_idx - lo  # (B, T, Fmax)
            onehot = (local[..., None] == iota).astype(planes.dtype)
            return acc + jnp.einsum(
                "btkf,bfc->btkc", onehot, pl,
                precision=jax.lax.Precision.HIGHEST,
            )

        def body(acc, chunk):
            pl, lo = chunk
            return accumulate(acc, pl, lo), None

        gathered, _ = jax.lax.scan(
            body, jnp.zeros((B, T, Fmax, 12), planes.dtype), (planes_c, lo_c)
        )

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
