"""Soft silhouette rendering — streaming and tile-binned TPU fast paths.

The north-star metric path (256^2 soft-silhouette render+backward,
BASELINE.md). Key insight: the SoftRas coverage
    alpha(p) = 1 - prod_f (1 - sigmoid(-d_f(p)/sigma))
is a PRODUCT over all faces, i.e. in log space a pure SUM:
    alpha(p) = 1 - exp(-sum_f softplus(-d_f(p)/sigma)).
Unlike pytorch3d (which needs per-pixel top-K fragment selection before its
silhouette shader, reference camera_pose_optimizer.py:131-137), the sum needs
NO selection, NO sorting and NO fragment buffers — and it decomposes across
face shards on a device mesh with one psum (parallel/ exploits this).

Two implementations:
  * soft_silhouette (default): coarse-to-fine TILE-BINNED — faces are bucketed
    into 16x16-pixel tiles by blur-expanded bbox (rasterize/binning.py), so
    each pixel only measures distances to its tile's candidates. 10-30x fewer
    (pixel, face) pairs than dense; the per-tile evaluation is one batched
    einsum (MXU) + VPU segment distances.
  * soft_silhouette_streaming: dense scan over ALL face chunks — exact for any
    mesh (no faces_per_tile cap), used as the oracle in tests.

Backward memory stays O(pixels) via jax.checkpoint on chunk bodies.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..cameras.perspective import PerspectiveCamera
from ..structures.meshes import Meshes
from .binning import (
    tile_pixel_coords,
    untile_image,
)
from .geometry import (
    FaceRasterData,
    channel_edge_bary,
    channel_min_edge_dist2,
    pixel_coords_raster,
    setup_faces,
)

# softplus(-d2/sigma) < 2e-7 once d2 > SOFT_CUTOFF * sigma: beyond this a face
# contributes nothing, so bins are padded by sqrt(SOFT_CUTOFF * sigma).
SOFT_CUTOFF = 16.0


def signed_dist2(pix_h: jax.Array, pix: jax.Array, q, abc, area2, valid):
    """Signed squared pixel->face distance (negative inside), broadcasting over
    any leading dims.

    pix_h (..., P, 3) homogeneous raster coords, pix (..., P, 2);
    q (..., Fc, 3, 2), abc (..., Fc, 3, 3), area2 (..., Fc), valid (..., Fc).
    Returns (..., P, Fc); invalid faces get +1e9.
    """
    e = jnp.einsum(
        "...pc,...fkc->...pfk", pix_h, abc, precision=jax.lax.Precision.HIGHEST
    )
    bary = e / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)[..., None, :, None]
    inside = jnp.all(bary >= 0.0, axis=-1)

    p = pix[..., :, None, :]  # (..., P, 1, 2)
    d2 = None
    for a_i, b_i in ((0, 1), (1, 2), (2, 0)):
        qa = q[..., None, :, a_i, :]  # (..., 1, Fc, 2)
        g = q[..., None, :, b_i, :] - qa
        len2 = jnp.clip(jnp.sum(g * g, axis=-1), 1e-12, None)
        inv_len2 = 1.0 / len2  # per-face divide, not per (pixel, face) pair
        w = p - qa
        wg = jnp.sum(w * g, axis=-1)
        t = jnp.clip(wg * inv_len2, 0.0, 1.0)
        dd = jnp.sum(w * w, axis=-1) - 2.0 * t * wg + t * t * len2
        d2 = dd if d2 is None else jnp.minimum(d2, dd)
    d2 = jnp.maximum(d2, 0.0)

    signed = jnp.where(inside, -d2, d2)
    return jnp.where(valid[..., None, :], signed, 1e9)


# ---------------------------------------------------------------------------
# Tile-binned fast path
# ---------------------------------------------------------------------------

_CORNER_CHANNELS = ("qx0", "qx1", "qx2", "qy0", "qy1", "qy2")


def soft_silhouette_binned(
    fd: FaceRasterData,
    image_size,
    sigma: float = 1e-4,
    tile: int = 16,
    faces_per_tile: int = 256,
    tile_chunk: int = 128,
) -> jax.Array:
    """Tile-binned soft coverage (B, H, W) — the XLA fallback path.

    Same one-hot scalar-channel-plane layout as the Pallas kernel and the
    binned hard rasterizer (gather_bin_planes): only the six corner
    coordinate channels are gathered (the coverage sum needs no depth), and
    edge functions / distances are recomputed per tile from those planes —
    no (F, 3, 2)/(F, 3, 3) arbitrary-index gathers (which TPUs tile-pad up
    to ~40x and execute nearly scalar)."""
    from .binning import bin_faces_ranked, gather_rank_planes

    B = fd.q.shape[0]
    pad_radius = math.sqrt(SOFT_CUTOFF * sigma)
    bins = bin_faces_ranked(fd, image_size, tile, pad_radius)
    ch, valid_t = gather_rank_planes(
        fd, bins, min(faces_per_tile, fd.num_faces),
        channels=_CORNER_CHANNELS,
    )
    T, Fmax = valid_t.shape[1:]
    tp = tile * tile

    local = tile_pixel_coords(image_size, tile)  # (tp, 2)
    origins = bins.tile_origin  # (T, 2)

    # Flatten (B, T) -> N tiles, chunk for bounded memory.
    def flat(a):
        return a.reshape((B * T,) + a.shape[2:])

    chf = {k: flat(v) for k, v in ch.items()}
    vf = flat(valid_t)
    of = jnp.broadcast_to(origins[None], (B, T, 2)).reshape(B * T, 2)

    N = B * T
    chunk = min(tile_chunk, N)
    n_chunks = -(-N // chunk)
    padn = n_chunks * chunk - N

    def padc(a):
        return jnp.pad(a, [(0, padn)] + [(0, 0)] * (a.ndim - 1)).reshape(
            (n_chunks, chunk) + a.shape[1:]
        )

    inv_sigma = 1.0 / sigma

    @jax.checkpoint
    def per_chunk(args):
        chc, vb, ob = args  # dict (c, Fmax), (c, Fmax), (c, 2)
        px = (local[None, :, 0] + ob[:, 0:1])[..., None]  # (c, tp, 1)
        py = (local[None, :, 1] + ob[:, 1:2])[..., None]
        qx = [chc[f"qx{k}"][:, None, :] for k in range(3)]  # (c, 1, Fmax)
        qy = [chc[f"qy{k}"][:, None, :] for k in range(3)]

        _, inside = channel_edge_bary(px, py, qx, qy)
        d2 = channel_min_edge_dist2(px, py, qx, qy, hoist_inv=True)
        d = jnp.where(inside, -d2, d2)
        d = jnp.where(vb[:, None, :], d, 1e9)
        return jnp.sum(jax.nn.softplus(-d * inv_sigma), axis=-1)  # (c, tp)

    S = jax.lax.map(
        per_chunk, ({k: padc(v) for k, v in chf.items()}, padc(vf), padc(of))
    )
    S = S.reshape(n_chunks * chunk, tp)[:N].reshape(B, T, tp)
    alpha = 1.0 - jnp.exp(-S)
    return untile_image(alpha, image_size, tile, bins.n_tiles_hw)


# ---------------------------------------------------------------------------
# Dense streaming path (exact oracle, no per-tile face cap)
# ---------------------------------------------------------------------------

def soft_coverage_sum(
    fd: FaceRasterData,
    image_size,
    sigma: float = 1e-4,
    pixel_chunk: int = 8192,
    face_chunk: int = 1024,
) -> jax.Array:
    """The log-space coverage sum S (B, H, W): alpha = 1 - exp(-S).

    S is a pure SUM over faces, so it decomposes across face shards — the
    face-parallel path in parallel/sharded.py computes local S per shard and
    psums over the 'model' mesh axis (one collective per render)."""
    alpha = soft_silhouette_streaming_face_data(
        fd, image_size, sigma=sigma, pixel_chunk=pixel_chunk,
        face_chunk=face_chunk, _return_sum=True,
    )
    return alpha


def soft_silhouette_streaming_face_data(
    fd: FaceRasterData,
    image_size,
    sigma: float = 1e-4,
    pixel_chunk: int = 8192,
    face_chunk: int = 1024,
    _return_sum: bool = False,
) -> jax.Array:
    """Soft coverage (B, H, W), dense streaming over every face chunk."""
    H, W = image_size
    pix_all = pixel_coords_raster((H, W))
    HW = pix_all.shape[0]
    pchunk = min(pixel_chunk, HW)
    n_pchunks = -(-HW // pchunk)
    ppad = n_pchunks * pchunk - HW
    pix_tiles = jnp.pad(pix_all, ((0, ppad), (0, 0))).reshape(n_pchunks, pchunk, 2)

    F = fd.num_faces
    fchunk = min(face_chunk, F)
    n_fchunks = -(-F // fchunk)
    fpad = n_fchunks * fchunk - F

    def pad_f(a):
        return jnp.pad(a, [(0, fpad)] + [(0, 0)] * (a.ndim - 1))

    inv_sigma = 1.0 / sigma

    def per_mesh(q, abc, area2, valid):
        qc = pad_f(q).reshape(n_fchunks, fchunk, 3, 2)
        abcc = pad_f(abc).reshape(n_fchunks, fchunk, 3, 3)
        a2c = pad_f(area2).reshape(n_fchunks, fchunk)
        vc = pad_f(valid).reshape(n_fchunks, fchunk)

        def per_pixel_tile(pix):
            pix_h = jnp.concatenate([pix, jnp.ones((pchunk, 1), pix.dtype)], -1)

            @jax.checkpoint
            def body(S, chunk):
                qb, ab, a2b, vb = chunk
                d = signed_dist2(pix_h, pix, qb, ab, a2b, vb)
                return S + jnp.sum(jax.nn.softplus(-d * inv_sigma), axis=-1), None

            S, _ = jax.lax.scan(
                body, jnp.zeros((pchunk,), pix.dtype), (qc, abcc, a2c, vc)
            )
            return S

        S_all = jax.lax.map(per_pixel_tile, pix_tiles).reshape(-1)[:HW]
        return S_all if _return_sum else 1.0 - jnp.exp(-S_all)

    alpha = jax.vmap(per_mesh)(fd.q, fd.abc, fd.area2, fd.valid)
    return alpha.reshape(alpha.shape[0], H, W)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------

def soft_silhouette(
    meshes: Meshes,
    camera: PerspectiveCamera,
    sigma: float = 1e-4,
    tile: int = 16,
    faces_per_tile: int = 256,
    impl: str = "auto",
) -> jax.Array:
    """Soft silhouette over ALL faces (exact SoftRas formulation) — (B, H, W).

    impl='auto' uses the fused Pallas kernel on TPU (rasterize/pallas_soft;
    ~3x the XLA binned path) and the XLA tile-binned path elsewhere;
    'binned' / 'pallas' force a path. All are equivalent to top-K fragments +
    sigmoid_alpha for K large enough (pytorch3d approximates this with
    K=faces_per_pixel)."""
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "binned"
    if impl == "pallas":
        from .pallas_soft import soft_silhouette_pallas_fd

        fd = setup_faces(meshes, camera)
        fpt = -(-min(faces_per_tile, fd.num_faces) // 128) * 128
        return soft_silhouette_pallas_fd(
            fd, camera.image_size, sigma=sigma, tile=tile, faces_per_tile=fpt
        )
    fd = setup_faces(meshes, camera)
    return soft_silhouette_binned(
        fd, camera.image_size, sigma=sigma, tile=tile, faces_per_tile=faces_per_tile
    )


def soft_silhouette_streaming(
    meshes: Meshes,
    camera: PerspectiveCamera,
    sigma: float = 1e-4,
    pixel_chunk: int = 8192,
    face_chunk: int = 1024,
) -> jax.Array:
    """Dense-streaming soft silhouette (oracle; no face-count caps)."""
    fd = setup_faces(meshes, camera)
    return soft_silhouette_streaming_face_data(
        fd, camera.image_size, sigma=sigma,
        pixel_chunk=pixel_chunk, face_chunk=face_chunk,
    )
