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
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..cameras.perspective import PerspectiveCamera
from ..structures.meshes import Meshes
from .fragments import EMPTY_DIST, Fragments
from .geometry import (
    FaceRasterData,
    channel_edge_bary,
    channel_min_edge_dist2,
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
    # max_faces_per_bin, SAME contract): None = AUTO — tile size and
    # budgets (max_faces_per_bin, active_tiles) are measured from the first
    # concrete scene per shape via rasterize.autotune and the runtime
    # overflow guard defaults on; 0 = force the dense O(pixels x faces)
    # path; k > 0 = explicit binned settings (size with enough headroom:
    # overflowing tiles silently drop high-index faces —
    # pallas_soft.suggest_faces_per_tile measures the true maximum).
    bin_size: Optional[int] = None
    max_faces_per_bin: int = 128
    # Binned-path implementation: 'auto' picks the fused Pallas kernel
    # (pallas_hard) for K=1 on TPU (per-tile occupancy skipping; empty
    # tiles cost ~nothing) and the XLA tile path otherwise; 'xla'/'pallas'
    # force a path (pallas falls back to interpret mode off-TPU).
    impl: str = "auto"
    # Active-tile compaction: if set, the binned paths compact the tile axis
    # to this many non-empty tiles before selection/interpolation and
    # scatter the per-tile outputs back afterwards (exact; background
    # everywhere a tile was empty). At 720p ~80% of tiles are empty and the
    # XLA tile path computes them all — size with
    # binning.suggest_active_tiles_fd (tiles beyond the budget are DROPPED,
    # like overflowing face bins). Composes with extra_face_attrs: the
    # bin-local attribute channels stay compacted and
    # fragments.interpolate_binned (and flat shading chains on top of it)
    # run on the active tiles only, scattering back at the final image.
    active_tiles: Optional[int] = None
    # Pallas K=1 kernel layout: "tile" (per-tile lane axis, chunk quantum
    # 128 lanes per tile) or "packed" (the candidates of the 8 tiles a
    # program owns share one lane axis). "packed" is a MEASURED NEGATIVE
    # RESULT for hard selection — segmented min cannot ride the MXU the
    # way the soft path's segmented sum does, and the masked lane-min
    # reductions cost more than the padding the packing saves (XLA 20.3 ms
    # vs packed 66+ ms, 720p 12 views; pallas_hard block comment has the
    # full numbers). Kept opt-in as a bit-exact second implementation
    # (validation/debugging); never auto-picked. Requires
    # faces_per_pixel == 1 and active_tiles; engages the Pallas path
    # regardless of impl ('xla' still forces the XLA path). Size
    # group_lanes with binning.suggest_group_lanes_fd (None = 8 *
    # max_faces_per_bin, always safe).
    layout: str = "tile"
    group_lanes: Optional[int] = None
    # Occupancy split for the XLA binned path (requires active_tiles;
    # with impl='auto' it PINS the XLA path so one config means one
    # pipeline on every backend): (hi_tiles, lo_lanes). Active tiles are
    # compacted in DESCENDING
    # candidate-count order; the first hi_tiles run the full
    # max_faces_per_bin lane budget and the tail runs lo_lanes — the
    # selection argmin, winner one-hot einsums and gathers are all
    # O(tiles x lanes), and sparse scenes (720p: median 38 of max 82
    # candidates) waste most of it at a single global budget. Exact as
    # long as every lo tile's count stays <= lo_lanes (same drop contract
    # as max_faces_per_bin) — size with
    # binning.suggest_occupancy_split_fd, which adds margin on the
    # boundary.
    occupancy_split: Optional[Tuple[int, int]] = None
    # Selection engine for the XLA binned path, K=1 / blur=0 only:
    # "auto" = the fused VPU iota-argmin over zfrag = rbsum/denom (the
    # bit-exactness reference); "affine" = every selection quantity is
    # affine in pixel coords at blur=0 (edge functions AND the
    # interpolated INVERSE depth — 1/z interpolates linearly in screen
    # space), so the (tp, F) selection slab is built as one
    # (tp, 3) @ (3, 4F) MXU dot + VPU sign tests, ordering by -denom
    # (division-free; argmin z == argmax denom when the barycentrics sum
    # to 1). Winner parity with "auto" except at eps-level z ties
    # (coplanar overlapping faces); opt-in for that reason.
    select_impl: str = "auto"
    # Image-assembly engine for the XLA binned path's epilogue: "xla" =
    # scatter_active_bg + untile_image (one-hot scatter dot + reshape/
    # moveaxis — XLA materializes ~6 relayout copies, ~2.0 ms of the 720p
    # 12-view depth call); "pallas" = the fused strip-assembly kernel
    # (pallas_untile.untile_scatter_pallas): one pass per fragment field,
    # bit-identical values, differentiable (backward is the exact XLA
    # inverse). Fields whose VMEM working set exceeds the kernel's budget
    # (large K bary stacks) fall back to the XLA epilogue per-field.
    untile_impl: str = "xla"
    # Opt-in runtime guard for every silent-drop budget on the binned paths
    # (face bins, active tiles, occupancy-split tail lanes): None (off, or
    # the process default from binning.set_budget_check_default), "warn"
    # (host warning via jax.debug.callback whenever a true candidate count
    # exceeds its budget), or "checkify" (emits checkify checks; wrap the
    # calling function with utils.debug.checked_budgets). Costs one count
    # reduction per budget — the counts already exist on these paths.
    check_budgets: Optional[str] = None

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


def _fragment_math(px, py, qx, qy, zf, invzf, clip_bary: bool):
    """Shared differentiable fragment math on scalar channels of any shape S.

    px, py: (S,) pixel coords; qx, qy, zf, invzf: 3-lists of (S,) gathered
    corner channels. Returns (zbuf (S,), pc 3-list (S,), dists (S,)).
    """
    bary, inside = channel_edge_bary(px, py, qx, qy)

    npc = [bary[k] * invzf[k] for k in range(3)]
    denom = jnp.clip(npc[0] + npc[1] + npc[2], 1e-12, None)
    pc = [npc[k] / denom for k in range(3)]
    if clip_bary:
        rp = [jax.nn.relu(pc[k]) for k in range(3)]
        rden = jnp.clip(rp[0] + rp[1] + rp[2], 1e-12, None)
        pc = [rp[k] / rden for k in range(3)]
    zbuf = pc[0] * zf[0] + pc[1] * zf[1] + pc[2] * zf[2]

    d2 = channel_min_edge_dist2(px, py, qx, qy, hoist_inv=False)
    dists = jnp.where(inside, -d2, d2)
    return zbuf, pc, dists


def _interpolate(
    pix_all: jax.Array, fd: FaceRasterData, pix_to_face: jax.Array,
    clip_bary: bool,
) -> Fragments:
    """Differentiable re-computation of bary/z/dists for selected fragments.

    pix_all: (HW, 2); pix_to_face: (B, HW, K). Returns flat Fragments with
    image dims (B, HW, K, ...) — caller reshapes to (B, H, W, K, ...).

    TPU layout note: everything is computed on flattened (B, HW*K) scalar
    channels gathered from per-face (B, F) planes. Gathering arrays with tiny
    trailing dims — e.g. the per-face (3, 3) edge coefficients — makes XLA's
    (sublane, 128-lane) tiling pad them up to 40x their logical size at
    1280x720-scale pixel counts; edge functions are instead recomputed from
    the six corner-coordinate channels.
    """
    B, HW, K = pix_to_face.shape
    flat_idx = jnp.maximum(pix_to_face, 0).reshape(B, HW * K)

    def g(plane):  # (B, F) -> (B, HW*K)
        return jnp.take_along_axis(plane, flat_idx, axis=1)

    qx = [g(fd.q[:, :, k, 0]) for k in range(3)]
    qy = [g(fd.q[:, :, k, 1]) for k in range(3)]
    zf = [g(fd.z[:, :, k]) for k in range(3)]
    invzf = [g(fd.invz[:, :, k]) for k in range(3)]

    # pixel coords per (pixel, slot): broadcast along K then flatten
    px = jnp.broadcast_to(pix_all[None, :, None, 0], (B, HW, K)).reshape(B, HW * K)
    py = jnp.broadcast_to(pix_all[None, :, None, 1], (B, HW, K)).reshape(B, HW * K)

    zbuf, pc, dists = _fragment_math(px, py, qx, qy, zf, invzf, clip_bary)

    live = pix_to_face >= 0
    reshape = lambda a: a.reshape(B, HW, K)
    return Fragments(
        pix_to_face=pix_to_face,
        zbuf=jnp.where(live, reshape(zbuf), -1.0),
        bary=jnp.where(
            live[..., None],
            jnp.stack([reshape(b) for b in pc], axis=-1), 0.0,
        ),
        dists=jnp.where(live, reshape(dists), EMPTY_DIST),
    )


def _select_tile_channels(px, py, ch, valid, K, blur, znear):
    """Top-K selection for one chunk of tiles from scalar channel planes.

    px, py: (c, tp, 1); ch: dict of (c, 1, Fmax) channel rows; valid
    (c, 1, Fmax). Broadcasts to (c, tp, Fmax) — all big-minor-dim arrays.
    Returns (c, tp, K) bin-local indices (-1 empty), nearest first.
    """
    qx = [ch[f"qx{k}"] for k in range(3)]
    qy = [ch[f"qy{k}"] for k in range(3)]
    invz = [ch[f"invz{k}"] for k in range(3)]

    (b0, b1, b2), inside = channel_edge_bary(px, py, qx, qy)

    rb0, rb1, rb2 = jax.nn.relu(b0), jax.nn.relu(b1), jax.nn.relu(b2)
    denom = jnp.clip(rb0 * invz[0] + rb1 * invz[1] + rb2 * invz[2], 1e-12, None)
    zfrag = (rb0 + rb1 + rb2) / denom

    if blur > 0.0:
        d2 = channel_min_edge_dist2(px, py, qx, qy, hoist_inv=False)
        cover = inside | (d2 < blur)
    else:
        cover = inside
    cover = cover & (valid > 0) & (zfrag > znear)

    priority = jnp.where(cover, zfrag, INF)
    k_eff = min(K, priority.shape[-1])
    if k_eff == 1:
        zmin = jnp.min(priority, axis=-1)
        idx = jnp.argmin(priority, axis=-1).astype(jnp.int32)
        out = jnp.where(zmin < INF, idx, -1)[..., None]
    else:
        negz, idx = jax.lax.top_k(-priority, k_eff)
        out = jnp.where(negz > -INF, idx.astype(jnp.int32), -1)
    if k_eff < K:
        out = jnp.pad(
            out, ((0, 0), (0, 0), (0, K - k_eff)), constant_values=-1
        )
    return out


def _select_tile_channels_affine(px, py, ch, valid, znear):
    """K=1 / blur=0 selection with the whole (tp, Fmax) slab built by ONE
    (tp, 3) @ (3, 4F) MXU dot: at blur=0 the edge functions AND the
    interpolated inverse depth are affine in pixel coords (1/z
    interpolates linearly in screen space), so each is a coefficient row
    per face (cheap (1, Fmax) VPU work) contracted against (px, py, 1).
    Ordering by -denom is division-free: argmin z == argmax denom when
    the barycentrics sum to 1 (inside pixels). Winner parity with
    _select_tile_channels except at eps-level z ties.

    px, py: (c, tp, 1); ch: dict of (c, 1, Fmax) rows; valid (c, 1, Fmax).
    Returns (c, tp, 1) bin-local indices (-1 empty)."""
    qx = [ch[f"qx{k}"] for k in range(3)]
    qy = [ch[f"qy{k}"] for k in range(3)]
    invz = [ch[f"invz{k}"] for k in range(3)]

    def edge_coeffs(ax, ay, bx, by):
        # e(p) = (bx-ax)(py-ay) - (by-ay)(px-ax) = -gy*px + gx*py + C
        gx = bx - ax
        gy = by - ay
        return -gy, gx, gy * ax - gx * ay

    A0, B0, C0 = edge_coeffs(qx[1], qy[1], qx[2], qy[2])
    A1, B1, C1 = edge_coeffs(qx[2], qy[2], qx[0], qy[0])
    A2, B2, C2 = edge_coeffs(qx[0], qy[0], qx[1], qy[1])
    area2 = (qx[1] - qx[0]) * (qy[2] - qy[0]) - (qy[1] - qy[0]) * (
        qx[2] - qx[0])
    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)
    s = jnp.sign(inv_area)  # orient edges so inside == all e >= 0
    Ad = inv_area * (A0 * invz[0] + A1 * invz[1] + A2 * invz[2])
    Bd = inv_area * (B0 * invz[0] + B1 * invz[1] + B2 * invz[2])
    Cd = inv_area * (C0 * invz[0] + C1 * invz[1] + C2 * invz[2])

    # evaluate the four affine forms as broadcast FMAs: (c, 1, F) coeff
    # rows against (c, tp, 1) pixel coords — 4 ops per (pixel, face) pair
    # per form vs ~35/pair for the cross-product + relu + divide form.
    # (An MXU (tp, 3) @ (3, 4F) dot variant measured 2.5x SLOWER overall:
    # XLA expands the K=3 HIGHEST contraction into (tp, 4F) pad/multiply
    # loop fusions with hostile layouts instead of an MXU op.)
    aff = lambda A, B, C: A * px + B * py + C          # (c, tp, F)
    e0 = aff(s * A0, s * B0, s * C0)
    e1 = aff(s * A1, s * B1, s * C1)
    e2 = aff(s * A2, s * B2, s * C2)
    denom = aff(Ad, Bd, Cd)
    inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
    cover = inside & (valid > 0) & (denom * znear < 1.0) & (denom > 0)
    key = jnp.where(cover, -denom, INF)
    kmin = jnp.min(key, axis=-1)
    idx = jnp.argmin(key, axis=-1).astype(jnp.int32)
    return jnp.where(kmin < INF, idx, -1)[..., None]


def _rasterize_binned(fd: FaceRasterData, settings: RasterizationSettings) -> Fragments:
    """Fused coarse-to-fine rasterization: selection AND interpolation happen
    per pixel tile, so the interpolation 'gather' is a masked reduction over
    the tile's <=Fmax candidate lanes instead of an arbitrary-index gather
    over all faces (which TPUs execute nearly scalar — 10x slower at 720p).
    Returns image-shaped Fragments (B, H, W, K, ...)."""
    import math

    from .binning import (
        bin_faces_active,
        bin_faces_ranked,
        check_budget,
        gather_rank_channels,
        scatter_active_bg,
        tile_pixel_coords,
        untile_image,
    )

    H, W = settings.image_size
    K = settings.faces_per_pixel
    tile = settings.bin_size
    blur = settings.blur_radius
    pad_radius = math.sqrt(blur) if blur > 0 else 0.0
    fd_sel = jax.lax.stop_gradient(fd)
    # rank binning (prefix-count slots, no top_k); the global face id rides
    # the one-hot contraction as one extra f32 channel (exact below 2^24).
    # active_tiles additionally compacts the tile axis to the non-empty
    # tiles (binning.bin_ranks_active) — every per-tile stage below then
    # runs on A instead of T tiles, and the outputs scatter back to the
    # full grid at the end (exact; empty tiles carry background values).
    split = settings.occupancy_split
    if split is not None and settings.active_tiles is None:
        raise ValueError("occupancy_split requires active_tiles")
    if settings.active_tiles is not None:
        bins = bin_faces_active(
            fd_sel, (H, W), tile, pad_radius, settings.active_tiles,
            order="count" if split is not None else "tile",
        )
        origins = bins.origin                                 # (B, A, 2)
        check_budget(
            "active_tiles", jnp.max(bins.n_active), settings.active_tiles,
            settings.check_budgets,
            hint="size with binning.suggest_active_tiles_fd",
        )
    else:
        bins = bin_faces_ranked(fd_sel, (H, W), tile, pad_radius)
        origins = None
    check_budget(
        "max_faces_per_bin", jnp.max(bins.count),
        min(settings.max_faces_per_bin, fd.num_faces), settings.check_budgets,
        hint="size with pallas_soft.suggest_faces_per_tile / count_overflow",
    )
    B = fd.valid.shape[0]
    F = fd.num_faces
    fid = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.float32, (1, F, 1), 1), (B, F, 1)
    )
    tp = tile * tile
    local = tile_pixel_coords((H, W), tile)  # (tp, 2)

    def run_tiles(bins_sub, origins_sub, lanes):
        """Select + interpolate one tile subset at its own lane budget;
        returns (p2f, zbuf, bary, dists) shaped (B, T_sub, tp, ...)."""
        from .binning import _PLANE_ORDER, _channel_sources

        # ONE stacked (B, F, 13) plane tensor (12 geometry channels + the
        # global face id) rides the gather contraction and stays stacked
        # through the chunk loop: splitting it into 13 per-channel planes
        # here and re-stacking per chunk (the previous layout) materialized
        # 13 pad copies + one (c, Fmax, 13) stack per chunk — pure data
        # formatting XLA could not elide.
        sources = _channel_sources(fd)
        planes = jnp.stack([sources[n] for n in _PLANE_ORDER], axis=-1)
        planes = jnp.concatenate([planes, fid], axis=-1)  # (B, F, 13)
        Fmax = min(lanes, F)
        gathered = gather_rank_channels(planes, bins_sub, Fmax)
        # gathered: DIFFERENTIABLE (B, T_sub, Fmax, 13) candidate channels
        _, T = bins_sub.count.shape
        capped = jnp.minimum(bins_sub.count, Fmax)  # (B, T)
        valid_t = (
            jax.lax.broadcasted_iota(jnp.int32, (1, 1, Fmax), 2)
            < capped[:, :, None]
        ).astype(jnp.float32)
        gf = gathered.reshape(B * T, Fmax, planes.shape[-1])
        vf = valid_t.reshape(B * T, Fmax)
        if origins_sub is None:
            o_sub = jnp.broadcast_to(bins_sub.tile_origin[None], (B, T, 2))
        else:
            o_sub = origins_sub
        of = o_sub.reshape(B * T, 2)

        N = B * T
        tiles_per_chunk = max(1, min(settings.pixel_chunk // tp, N))
        n_chunks = -(-N // tiles_per_chunk)
        padn = n_chunks * tiles_per_chunk - N
        padc = lambda a: jnp.pad(
            a, [(0, padn)] + [(0, 0)] * (a.ndim - 1)
        ).reshape((n_chunks, tiles_per_chunk) + a.shape[1:])

        ch_idx = {n: c for c, n in enumerate(_PLANE_ORDER)}

        def per_chunk(args):
            g, v, o = args  # g: (c, Fmax, 13)
            px = (local[None, :, 0] + o[:, 0:1])[..., None]  # (c, tp, 1)
            py = (local[None, :, 1] + o[:, 1:2])[..., None]
            if settings.select_impl == "affine":
                sel_fn = functools.partial(
                    _select_tile_channels_affine, znear=settings.znear
                )
            else:
                sel_fn = functools.partial(
                    _select_tile_channels, K=K, blur=blur,
                    znear=settings.znear,
                )
            g_sel = jax.lax.stop_gradient(g)
            idx_local = sel_fn(
                jax.lax.stop_gradient(px), jax.lax.stop_gradient(py),
                {n: g_sel[:, None, :, c] for n, c in ch_idx.items()},
                v[:, None, :],
            )  # (c, tp, K)

            # winner gather: one one-hot contraction over the tile's Fmax
            # lanes per hit (MXU) instead of 13 masked VPU reductions per
            # channel — measured 3.06 -> ~0.5 ms of the 720p 12-view call
            # (fusion.152 in the op profile). Exact: a single nonzero per
            # (pixel, lane) row, so binning.winner_gather's 3-way bf16
            # split reconstructs the f32 values bit-for-bit at half the
            # MXU passes of a HIGHEST einsum — and its custom_vjp keeps
            # only (lane, live) as residuals instead of the per-k
            # (c, tp, Fmax) masks AD stored across the chunk loop.
            # Channel-MAJOR output (c, 13, tp): the channel slices below
            # are then contiguous (c, tp) planes — the (c, tp, 13)
            # orientation forced XLA to materialize a full relayout copy
            # of the winner channels (0.50 ms of the 12-view 720p call,
            # copy.384 in the op profile) before the fragment math could
            # read them.
            from .binning import winner_gather

            zbufs, pcs, dists_l, p2fs = [], [], [], []
            for k in range(K):
                lane_k = idx_local[:, :, k]                   # (c, tp)
                sel = winner_gather(
                    Fmax, lane_k, lane_k >= 0, g
                )  # (c, 13, tp)
                qx = [sel[:, ch_idx[f"qx{j}"]] for j in range(3)]
                qy = [sel[:, ch_idx[f"qy{j}"]] for j in range(3)]
                zf = [sel[:, ch_idx[f"z{j}"]] for j in range(3)]
                invzf = [sel[:, ch_idx[f"invz{j}"]] for j in range(3)]
                zb, pck, dd = _fragment_math(
                    px[..., 0], py[..., 0], qx, qy, zf, invzf,
                    settings.clip_bary
                )
                p2f = jnp.round(sel[:, 12]).astype(jnp.int32)
                zbufs.append(zb)
                pcs.append(jnp.stack(pck, axis=-1))
                dists_l.append(dd)
                p2fs.append(p2f)

            if K == 1:
                # keep the K axis OFF the loop outputs: trailing size-1
                # dims forced 1-sublane-tiled loop-carry buffers (the
                # 0.71 ms reshape_select fusion in the 720p op profile);
                # the axis is re-added by a free bitcast after untiling.
                live1 = idx_local[:, :, 0] >= 0  # (c, tp)
                zbuf = jnp.where(live1, zbufs[0], -1.0)
                bary = jnp.where(live1[..., None], pcs[0], 0.0)  # (c,tp,3)
                dists = jnp.where(live1, dists_l[0], EMPTY_DIST)
                p2f = jnp.where(live1, p2fs[0], -1)
                return p2f, zbuf, bary, dists
            live = idx_local >= 0  # (c, tp, K)
            zbuf = jnp.where(live, jnp.stack(zbufs, axis=-1), -1.0)
            bary = jnp.where(
                live[..., None], jnp.stack(pcs, axis=-2), 0.0
            )  # (c, tp, K, 3)
            dists = jnp.where(live, jnp.stack(dists_l, axis=-1), EMPTY_DIST)
            p2f = jnp.where(live, jnp.stack(p2fs, axis=-1), -1)
            return p2f, zbuf, bary, dists

        outs = jax.lax.map(per_chunk, (padc(gf), padc(vf), padc(of)))
        return tuple(
            a.reshape((n_chunks * tiles_per_chunk, tp) + a.shape[3:])[:N]
            .reshape((B, T, tp) + a.shape[3:])
            for a in outs
        )

    if split is not None and int(split[0]) >= bins.slot.shape[1]:
        # hi covers every active tile (stale suggestion, smaller image, or
        # A == 1): there is no sparse tail — run the single-budget path
        # rather than demoting the last tile to lo_lanes (which would drop
        # its faces beyond lo_lanes).
        split = None
    if split is not None:
        # count-ordered tiles: [0, hi) at the full lane budget, the sparse
        # tail at lo_lanes. Exact while every tail tile's count stays
        # <= lo_lanes (suggest_occupancy_split_fd sizes the boundary with
        # margin); rank order is preserved so the concatenated axis lines
        # up with bins.invrank for the scatter below.
        hi, lo_lanes = split
        A = bins.slot.shape[1]
        hi = max(1, int(hi))
        # tail tiles run at lo_lanes; counts are DESCENDING so the first
        # tail tile carries the max
        check_budget(
            "occupancy_split lo_lanes", jnp.max(bins.count[:, hi:]),
            int(lo_lanes), settings.check_budgets,
            hint="size with binning.suggest_occupancy_split_fd",
        )
        sub = lambda lo_, hi_: bins._replace(
            slot=bins.slot[:, lo_:hi_], count=bins.count[:, lo_:hi_]
        )
        outs_hi = run_tiles(sub(0, hi), origins[:, :hi],
                            settings.max_faces_per_bin)
        outs_lo = run_tiles(sub(hi, A), origins[:, hi:], int(lo_lanes))
        p2f, zbuf, bary, dists = tuple(
            jnp.concatenate([a, b], axis=1)
            for a, b in zip(outs_hi, outs_lo)
        )
    else:
        p2f, zbuf, bary, dists = run_tiles(
            bins, origins, settings.max_faces_per_bin
        )

    finish_xla = None
    if settings.active_tiles is not None:
        from .binning import active_indicator

        ind = active_indicator(bins)

        def finish_xla(a, bg):
            dtype = a.dtype
            if dtype == jnp.int32:  # scatter rides f32 (ids < 2^24: exact)
                a = a.astype(jnp.float32)
            a = scatter_active_bg(a, bins, bg, indicator=ind)
            if dtype == jnp.int32:
                a = jnp.round(a).astype(jnp.int32)
            return untile_image(a, (H, W), tile, bins.n_tiles_hw)
    else:
        def finish_xla(a, bg):
            del bg
            return untile_image(a, (H, W), tile, bins.n_tiles_hw)

    if settings.untile_impl == "pallas":
        from .pallas_untile import tile_slot_table, untile_scatter_pallas

        if settings.active_tiles is not None:
            A_rows = bins.invrank.shape[1]
            table = tile_slot_table(bins.rank, A_rows, bins.n_tiles_hw)
        else:
            table = tile_slot_table(None, 0, bins.n_tiles_hw, batch=B)

        def finish(a, bg):
            trail = a.shape[3:]
            Cc = 1
            for d in trail:
                Cc *= d
            # whole-rows VMEM block at the kernel's lane-padded channel
            # count: fall back per-field when it won't fit (e.g. (tp, K, 3)
            # bary stacks at large K)
            creq = 128 // math.gcd(128, tile)
            Cp = -(-Cc // creq) * creq
            if (a.shape[1] + 1) * tp * Cp * 4 > 8 << 20:
                return finish_xla(a, bg)
            dtype = a.dtype
            r = a.reshape(B, a.shape[1], tp, Cc)
            if dtype == jnp.int32:  # rides f32 (ids < 2^24: exact)
                r = r.astype(jnp.float32)
            img = untile_scatter_pallas(
                r, table, float(bg), (H, W), tile, bins.n_tiles_hw
            )
            if dtype == jnp.int32:
                img = jnp.round(img).astype(jnp.int32)
            return img.reshape((B, H, W) + trail) if trail else img[..., 0]
    else:
        finish = finish_xla

    if K == 1:
        # re-add the K axis dropped inside per_chunk — size-1 expansions
        # of the untiled images are free bitcasts
        return Fragments(
            pix_to_face=finish(p2f, -1)[..., None],
            zbuf=finish(zbuf, -1.0)[..., None],
            bary=finish(bary, 0.0)[..., None, :],
            dists=finish(dists, EMPTY_DIST)[..., None],
        )
    return Fragments(
        pix_to_face=finish(p2f, -1), zbuf=finish(zbuf, -1.0),
        bary=finish(bary, 0.0), dists=finish(dists, EMPTY_DIST),
    )


def uses_binned_pallas(settings: RasterizationSettings) -> bool:
    """Whether rasterize_face_data will route to the fused Pallas binned
    kernels (see the dispatch comment in rasterize_face_data): explicitly
    forced via impl='pallas', or auto-picked for K>1 on TPU. Only these
    fragments carry Fragments.binned attribute slabs.

    NB: auto settings (bin_size=None) must be resolved first
    (autotune.resolve_mesh_settings — rasterize_meshes / MeshRenderer do);
    unresolved auto conservatively reports False here."""
    if not settings.bin_size or settings.impl == "xla":
        return False
    if settings.occupancy_split is not None:
        return False  # split is an XLA-binned-path tuning (routing intent)
    if settings.layout == "packed":
        return settings.faces_per_pixel == 1
    if settings.bin_size > 16:
        return False
    return settings.impl == "pallas" or (
        settings.impl == "auto"
        and settings.faces_per_pixel > 1
        and jax.default_backend() == "tpu"
    )


def rasterize_face_data(
    fd: FaceRasterData, settings: RasterizationSettings,
    extra_face_attrs=None,
) -> Fragments:
    """Rasterize pre-projected faces into per-pixel top-K fragments.

    extra_face_attrs: optional {name: (B, F, 3, C)} per-face-corner
    attribute channels. On the binned Pallas path they are bin-gathered
    alongside the corner channels and returned on Fragments.binned for
    bin-local interpolation (fragments.interpolate_binned); other paths
    ignore them (shading falls back to global interpolation).
    """
    from .autotune import resolve_mesh_settings

    settings = resolve_mesh_settings(settings, fd=fd)
    if (
        settings.impl == "pallas"
        and settings.layout != "packed"
        and (not settings.bin_size or settings.bin_size > 16)
    ):
        # NB: bin_size=None AUTO never reaches this error — when auto
        # resolution picks the dense path it downgrades an impl='pallas'
        # request to 'auto' with a warning (autotune._dense), so the
        # error below always names a bin_size the user actually set.
        raise ValueError(
            "impl='pallas' requires bin_size <= 16 (per-tile tile=32 "
            "kernels crash the Mosaic compiler; the packed layout supports "
            f"bin_size 32); got bin_size={settings.bin_size}"
        )
    if settings.layout == "packed" and not settings.bin_size:
        raise ValueError("layout='packed' requires bin_size (binned path)")
    if settings.occupancy_split is not None:
        # the split only exists on the XLA binned path. impl='auto' treats
        # it as routing intent (stay on XLA even where the Pallas kernel
        # would be auto-picked, so one config means one pipeline on every
        # backend); an explicit Pallas/packed/dense request conflicts —
        # fail loudly instead of silently dropping the tuning (mirrors
        # the impl='pallas' bin_size guard).
        if (
            not settings.bin_size
            or settings.impl == "pallas"
            or settings.layout == "packed"
        ):
            raise ValueError(
                "occupancy_split applies to the XLA binned path only; got "
                f"bin_size={settings.bin_size}, impl={settings.impl!r}, "
                f"layout={settings.layout!r}"
            )
        if settings.active_tiles is None:
            raise ValueError("occupancy_split requires active_tiles")
    if settings.select_impl == "affine":
        # affine keys exist only at blur=0 (soft coverage needs the
        # boundary distance) and the -denom ordering only for K=1
        if (
            settings.faces_per_pixel != 1
            or settings.blur_radius > 0.0
            or not settings.bin_size
            or settings.impl == "pallas"
            or settings.layout == "packed"
        ):
            raise ValueError(
                "select_impl='affine' requires the XLA binned path with "
                "faces_per_pixel=1 and blur_radius=0; got "
                f"K={settings.faces_per_pixel}, blur={settings.blur_radius}, "
                f"bin_size={settings.bin_size}, impl={settings.impl!r}, "
                f"layout={settings.layout!r}"
            )
    elif settings.select_impl != "auto":
        raise ValueError(
            f"unknown select_impl {settings.select_impl!r} "
            "(expected 'auto' or 'affine')"
        )
    if (
        settings.layout == "packed"
        and settings.impl != "xla"
        and settings.faces_per_pixel != 1
    ):
        raise ValueError(
            "layout='packed' supports faces_per_pixel=1 only; got "
            f"{settings.faces_per_pixel} (K>1 uses the per-tile top-K "
            "kernel — drop layout='packed')"
        )
    if settings.bin_size:
        # auto: the fused Pallas top-K kernel on TPU for K>1 — it beats the
        # XLA tile path 19-27x there (the XLA K>1 interpolation does
        # K x Fmax masked reductions per channel). K=1 stays on the XLA
        # path, which measured FASTER than the Pallas hard kernel at every
        # scale tried (2.2 vs 2.7 ms at 128^2; 4x at 720p where sparse
        # tiles waste the kernel's 128-lane chunk padding). Gated to
        # bin_size <= 16: tile=32 (tp=1024) kernels deterministically
        # crash the Mosaic compile helper (measured at any N/F).
        if uses_binned_pallas(settings):
            from .pallas_hard import (
                rasterize_binned_pallas,
                rasterize_packed_pallas,
            )

            extra = None
            layout = ()
            if extra_face_attrs:
                B, F = fd.valid.shape[:2]
                parts, start = [], 0
                for name, a in extra_face_attrs.items():
                    parts.append(a)
                    layout += ((name, start, a.shape[-1]),)
                    start += a.shape[-1]
                extra = jnp.concatenate(parts, axis=-1).reshape(B, F, -1)
            if settings.layout == "packed":
                return rasterize_packed_pallas(fd, settings, extra, layout)
            return rasterize_binned_pallas(fd, settings, extra, layout)
        return _rasterize_binned(fd, settings)

    H, W = settings.image_size
    K = settings.faces_per_pixel
    pix_all = pixel_coords_raster((H, W))  # (HW, 2)
    HW = pix_all.shape[0]

    fd_sel = jax.lax.stop_gradient(fd)
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
    meshes: Meshes, camera: PerspectiveCamera,
    settings: RasterizationSettings, extra_face_attrs=None,
) -> Fragments:
    """End-to-end: meshes + camera -> Fragments (the MeshRasterizer call)."""
    from .autotune import resolve_mesh_settings

    settings = resolve_mesh_settings(settings, meshes, camera)
    if settings.bin_size:
        # the binned paths read only scalar channel planes — the
        # channel-plane setup skips the tiny-trailing-dim corner tensors
        # (up to 42x TPU tile-padding); bit-exact vs setup_faces
        # (tests/test_rank_binning, test_binned_raster)
        from .geometry import setup_face_planes

        fd = setup_face_planes(meshes, camera, znear=settings.znear)
    else:
        fd = setup_faces(meshes, camera, znear=settings.znear)
    return rasterize_face_data(fd, settings, extra_face_attrs)
