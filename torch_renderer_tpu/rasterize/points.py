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
from typing import Optional, Tuple, Union

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
    features: optional (B, H, W, K, C) per-hit point features, 0 at empty
        slots — produced by the binned path when `extra` channels ride its
        candidate gather (the winner one-hot einsum pulls them with the
        geometry, so compositors skip the near-scalar per-pixel gather AND
        its scatter-add backward; gather_point_features is the fallback).
    """

    idx: jax.Array
    zbuf: jax.Array
    dists2: jax.Array
    features: Optional[jax.Array] = None

    @property
    def mask(self) -> jax.Array:
        return self.idx >= 0


@dataclasses.dataclass(frozen=True)
class PointsRasterizationSettings:
    """pytorch3d PointsRasterizationSettings mirror (radius in NDC units).

    bin_size follows pytorch3d's contract: None = AUTO — coarse-to-fine
    binning with tile size and budgets (max_points_per_bin, active_tiles)
    measured from the first concrete cloud per shape
    (rasterize.autotune.resolve_points_settings; the runtime overflow
    guard defaults on); 0 = force the dense O(pixels x points) path;
    k > 0 = explicit binned settings — points are bucketed into
    bin_size-pixel tiles by their radius-expanded bbox and each tile
    evaluates only its own candidates. Overflowing tiles silently drop
    high-index points; size explicit max_points_per_bin with headroom
    (suggest_points_per_bin)."""

    image_size: Tuple[int, int]
    radius: float = 0.01
    points_per_pixel: int = 8
    znear: float = 1e-5
    pixel_chunk: int = 8192
    bin_size: Union[None, int] = None
    max_points_per_bin: int = 128
    # Binned-path K-extraction engine: "xla" = the iota-argmin passes as
    # XLA reductions (measured 16.9 ms of the 27.8 ms forward at the
    # 4x20k/256^2/K=8 bench — each pass re-reads the (tp, Pmax) priority
    # slab from HBM); "pallas" = the fused selection kernel
    # (pallas_points.points_select_pallas) that keeps the slab in VMEM
    # across all K passes (selection only — the differentiable winner
    # one-hot einsum epilogue is shared, so fragments are bit-exact
    # between impls); "auto" = pallas on TPU, xla elsewhere.
    impl: str = "auto"
    # Active-tile compaction (the mesh path's lever, binning.bin_ranks_active):
    # compact the tile axis to this many non-empty tiles before the candidate
    # gather + per-tile K extraction, scattering the fragments back to the
    # full grid afterwards (exact; empty tiles carry background). The bin
    # gather's one-hot (T x Pmax x N) contraction dominates the binned
    # forward, and point clouds rarely cover every tile — size with
    # suggest_active_tiles_points (tiles beyond the budget are DROPPED,
    # like overflowing point bins).
    active_tiles: Union[None, int] = None
    # Opt-in runtime guard for the silent-drop point-bin budget: None (off /
    # process default), "warn", or "checkify" — see
    # RasterizationSettings.check_budgets / binning.check_budget.
    check_budgets: Union[None, str] = None


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
    q, z, valid, radius2, settings: PointsRasterizationSettings, extra=None,
    uniform_r2=None,
) -> PointFragments:
    """Coarse-to-fine point rasterization with the mesh path's machinery
    (raster._rasterize_binned): RANK binning (prefix-count slots, no
    top_k sort), one-hot MXU candidate gathers, per-pixel K extraction by
    iota-argmin passes, and ONE winner one-hot einsum per hit that pulls
    all candidate channels together — the winner's d2 is then recomputed
    differentiably from its gathered x/y (gradients flow through the
    gather einsum, never a scatter). Replaced the top_k + per-k masked-
    reduction formulation: 107 -> 41 ms forward on the 4x20k-point 256^2
    K=8 TPU benchmark, then -> 27.5 ms with the compositor's feature
    channels riding this gather as `extra` (scripts/bench_points.py;
    dense path 247 ms)."""
    from .binning import (
        bin_ranks,
        gather_rank_channels,
        tile_pixel_coords,
        untile_image,
        winner_gather,
    )

    H, W = settings.image_size
    K = settings.points_per_pixel
    tile = settings.bin_size
    B, N = z.shape
    tp = tile * tile

    # rank binning materializes (B, T, N) overlap/slot tensors (the price
    # of prefix-count slots; the mesh path pays the same at (B, T, F)).
    # Guard the envelope with a clear error instead of an opaque OOM —
    # larger tiles shrink T quadratically.
    from .binning import tile_grid as _tg

    TH_, TW_, _ = _tg((H, W), tile)
    if B * TH_ * TW_ * N > 1 << 30:
        raise ValueError(
            f"rank binning envelope B*T*N = {B}x{TH_ * TW_}x{N} exceeds "
            "2^30 elements (~4 GB int32); raise bin_size (T shrinks "
            "quadratically) or reduce the cloud"
        )
    if N >= 1 << 24:
        # the global point id rides the one-hot contraction as an f32
        # channel; ids at/above 2^24 round and silently corrupt
        # PointFragments.idx
        raise ValueError(
            f"cloud size N = {N} >= 2^24: point ids are carried as f32 "
            "channels (exact only below 2^24); split the cloud"
        )
    r = jnp.sqrt(radius2)
    lo = jax.lax.stop_gradient(q - r[..., None])
    hi = jax.lax.stop_gradient(q + r[..., None])
    compact = settings.active_tiles is not None
    if compact:
        from .binning import bin_ranks_active

        bins = bin_ranks_active(
            lo, hi, valid, (H, W), tile, settings.active_tiles
        )
        origins = bins.origin                                # (B, A, 2)
        from .binning import check_budget

        check_budget(
            "active_tiles", jnp.max(bins.n_active), settings.active_tiles,
            settings.check_budgets,
            hint="size with points.suggest_active_tiles_points",
        )
    else:
        bins = bin_ranks(lo, hi, valid, (H, W), tile)
        origins = None
    T = bins.slot.shape[1]                                   # = A if compact
    Pmax = min(settings.max_points_per_bin, N)
    if Pmax % 128 == 0 and Pmax < N:
        # measured TPU cliff: the XLA one-hot slot gather runs 1.6-3x
        # SLOWER when the slot count is a 128 multiple (4x20k/256^2 alpha
        # forward: Pmax 384 -> 28.3 ms, 416 -> 17.3; 512 -> 54.7, 448 ->
        # 18.4 — same t_chunk). Growing the budget is always safe (drops
        # strictly decrease), so step off the lane multiple.
        Pmax = min(Pmax + 32, N)
    from .binning import check_budget

    check_budget(
        "max_points_per_bin", jnp.max(bins.count), Pmax,
        settings.check_budgets,
        hint="size with points.suggest_points_per_bin",
    )

    # candidate channels x, y, z (+ r2 only with a per-point radius
    # override — the uniform-radius case keeps it out of the gather, whose
    # one-hot contraction cost scales with the channel count) + the global
    # point id riding as one f32 channel (exact below 2^24)
    fid = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.float32, (1, N, 1), 1), (B, N, 1)
    )
    geo = [q[..., 0], q[..., 1], z]
    if uniform_r2 is None:
        geo.append(radius2)
    CB = len(geo)                                    # id channel index
    cols = [jnp.stack(geo, axis=-1), fid]
    CE = 0
    if extra is not None:                            # (B, N, CE) features
        CE = extra.shape[-1]
        cols.append(extra)
    planes = jnp.concatenate(cols, axis=-1)          # (B, N, CB+1+CE)
    C = planes.shape[-1]
    ch = gather_rank_channels(planes, bins, Pmax)    # (B, T, Pmax, C)
    capped = jnp.minimum(bins.count, Pmax)
    valid_t = (
        jax.lax.broadcasted_iota(jnp.int32, (1, 1, Pmax), 2)
        < capped[:, :, None]
    )

    local = tile_pixel_coords((H, W), tile)          # (tp, 2)
    chf = ch.reshape(B * T, Pmax, C)
    vf = valid_t.reshape(B * T, Pmax)
    if origins is None:
        origins = jnp.broadcast_to(bins.tile_origin[None], (B, T, 2))
    of = origins.reshape(B * T, 2)

    NT = B * T
    tiles_per_chunk = max(1, min(settings.pixel_chunk // tp, NT))
    n_chunks = -(-NT // tiles_per_chunk)
    padn = n_chunks * tiles_per_chunk - NT
    padc = lambda a: jnp.pad(
        a, [(0, padn)] + [(0, 0)] * (a.ndim - 1)
    ).reshape((n_chunks, tiles_per_chunk) + a.shape[1:])

    iota_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Pmax), 2)
    k_eff = min(K, Pmax)

    def winner_channels(g, lane, live, px, py):
        """ONE differentiable one-hot einsum per hit pulls all candidate
        channels together (lean residuals + exact bf16 split:
        binning.winner_gather); d2 recomputed
        from the winner's gathered x/y so gradients flow through the
        gather, never a scatter."""
        sel = winner_gather(Pmax, lane, live, g)     # (c, C, tp)
        wx, wy, wz = sel[:, 0], sel[:, 1], sel[:, 2]
        ddx = px - wx
        ddy = py - wy
        d2 = ddx * ddx + ddy * ddy
        idx = jnp.round(sel[:, CB]).astype(jnp.int32)
        feat = (jnp.moveaxis(sel[:, CB + 1:], 1, -1)
                if CE else None)                     # (c, tp, CE)
        return wz, d2, idx, feat

    def stack_k(zbufs, d2s, idxs, lives, featl):
        for _ in range(k_eff, K):                    # clouds smaller than K
            zbufs.append(jnp.zeros_like(zbufs[0]))
            d2s.append(jnp.zeros_like(d2s[0]))
            idxs.append(jnp.zeros_like(idxs[0]))
            lives.append(jnp.zeros_like(lives[0]))
            if CE:
                featl.append(jnp.zeros_like(featl[0]))
        live = jnp.stack(lives, axis=-1)
        zbuf = jnp.where(live, jnp.stack(zbufs, axis=-1), -1.0)
        dist2 = jnp.where(live, jnp.stack(d2s, axis=-1), -1.0)
        pidx = jnp.where(live, jnp.stack(idxs, axis=-1), -1)
        if CE:
            feats = jnp.where(
                live[..., None], jnp.stack(featl, axis=-2), 0.0
            )  # (c, tp, K, CE)
            return pidx, zbuf, dist2, feats
        return pidx, zbuf, dist2

    def per_chunk(args):
        g, v, o = args                               # (c, Pmax, 5), ...
        px = local[None, :, 0] + o[:, 0:1]           # (c, tp)
        py = local[None, :, 1] + o[:, 1:2]
        gs = jax.lax.stop_gradient(g)
        x = gs[..., 0][:, None, :]                   # (c, 1, Pmax)
        y = gs[..., 1][:, None, :]
        zc = gs[..., 2][:, None, :]
        r2 = (jnp.float32(uniform_r2) if uniform_r2 is not None
              else gs[..., 3][:, None, :])
        dx = px[..., None] - x                       # (c, tp, Pmax)
        dy = py[..., None] - y
        cover = (dx * dx + dy * dy <= r2) & v[:, None, :]
        priority = jnp.where(cover, zc * jnp.ones_like(dx), INF)

        # K nearest-z extraction passes (iota-argmin, the mesh selection
        # form; beats a lane sort) + ONE winner one-hot einsum per hit
        zbufs, d2s, idxs, lives, featl = [], [], [], [], []
        for _ in range(k_eff):
            zmin = jnp.min(priority, axis=-1)        # (c, tp)
            amin = jnp.min(
                jnp.where(priority == zmin[..., None], iota_p, Pmax),
                axis=-1,
            )
            live = zmin < INF
            mk = (amin[..., None] == iota_p) & live[..., None]
            priority = jnp.where(mk, INF, priority)
            wz, d2, idx, feat = winner_channels(g, amin, live, px, py)
            zbufs.append(wz)
            d2s.append(d2)
            idxs.append(idx)
            lives.append(live)
            if CE:
                featl.append(feat)
        return stack_k(zbufs, d2s, idxs, lives, featl)

    def per_chunk_pallas(args):
        # selection came from the fused kernel (lane/live per k); only the
        # differentiable winner einsums + fragment math run here
        g, o, lane_c, live_c = args                  # lane_c (c, K', tp)
        px = local[None, :, 0] + o[:, 0:1]
        py = local[None, :, 1] + o[:, 1:2]
        zbufs, d2s, idxs, lives, featl = [], [], [], [], []
        for k in range(k_eff):
            lv = live_c[:, k, :]
            wz, d2, idx, feat = winner_channels(
                g, lane_c[:, k, :], lv, px, py)
            zbufs.append(wz)
            d2s.append(d2)
            idxs.append(idx)
            lives.append(lv)
            if CE:
                featl.append(feat)
        return stack_k(zbufs, d2s, idxs, lives, featl)

    if settings.impl not in ("auto", "xla", "pallas"):
        raise ValueError(f"unknown impl {settings.impl!r}")
    use_pallas = settings.impl == "pallas" or (
        settings.impl == "auto" and jax.default_backend() == "tpu"
    )
    if use_pallas:
        from .pallas_points import SUPPORTED_TILES

        if tile not in SUPPORTED_TILES:
            # the kernel's out/offset blocks need tp = tile*tile to be a
            # 128-lane multiple; Mosaic rejects other granules at compile
            # time on real TPUs (interpret mode would hide it)
            if settings.impl == "pallas":
                raise ValueError(
                    f"impl='pallas' supports bin_size in {SUPPORTED_TILES}, "
                    f"got {tile}"
                )
            import warnings

            warnings.warn(
                f"bin_size={tile} is outside the fused point-selection "
                f"kernel's supported tiles {SUPPORTED_TILES}; impl='auto' "
                "falls back to the XLA selection path (bit-exact, slower "
                "at scale)",
                stacklevel=2,
            )
            use_pallas = False
    if use_pallas:
        from .pallas_points import _PC, _TN, points_select_pallas

        # assemble the kernel's (N, 8, Ppad) slab: stop-grad channel rows
        # x/y/z/r2 + valid + origin/count meta rows, lanes 128-padded
        # (uniform radius: r2 is a constant-filled row, not a gathered one)
        Ppad = Pmax + (-Pmax) % _PC
        ksl = jax.lax.stop_gradient(
            jnp.swapaxes(ch[..., :CB], 2, 3))        # (B, T, CB, Pmax)
        if uniform_r2 is not None:
            ksl = jnp.concatenate([
                ksl,
                jnp.full((B, T, 1, Pmax), uniform_r2, jnp.float32),
            ], axis=2)                               # -> rows x, y, z, r2
        padp = lambda a: jnp.pad(
            a, ((0, 0), (0, 0), (0, 0), (0, Ppad - Pmax)))
        vrow = valid_t.astype(jnp.float32)[:, :, None, :]
        zrow = jnp.zeros((B, T, 1, Ppad), jnp.float32)
        orow = jnp.zeros((B, T, 1, Ppad), jnp.float32)
        orow = orow.at[..., 0, 0].set(origins[..., 0])
        orow = orow.at[..., 0, 1].set(origins[..., 1])
        crow = jnp.zeros((B, T, 1, Ppad), jnp.float32)
        crow = crow.at[..., 0, 0].set(
            (-(-jnp.minimum(capped, Pmax) // _PC)).astype(jnp.float32))
        planes_k = jnp.concatenate(
            [padp(ksl), padp(vrow), zrow, orow, crow], axis=2
        ).reshape(B * T, 8, Ppad)
        padN = (-(B * T)) % _TN
        if padN:
            planes_k = jnp.pad(planes_k, ((0, padN), (0, 0), (0, 0)))
        lane, live = points_select_pallas(
            planes_k, tile, local, settings.znear, k_eff
        )
        lane = lane[:NT]
        live = live[:NT]
        outs = jax.lax.map(
            per_chunk_pallas,
            (padc(chf), padc(of), padc(lane), padc(live)),
        )
    else:
        outs = jax.lax.map(per_chunk, (padc(chf), padc(vf), padc(of)))

    if compact:
        from .binning import active_indicator, scatter_active_bg

        ind = active_indicator(bins)

    def finish(a, bg):
        a = a.reshape((n_chunks * tiles_per_chunk, tp) + a.shape[3:])[:NT]
        a = a.reshape((B, T, tp) + a.shape[2:])
        if compact:
            # scatter the active slots back to the full tile grid (exact
            # one-hot contraction; int ids ride f32 — exact below 2^24,
            # guarded above)
            dtype = a.dtype
            if dtype == jnp.int32:
                a = a.astype(jnp.float32)
            a = scatter_active_bg(a, bins, bg, indicator=ind)
            if dtype == jnp.int32:
                a = jnp.round(a).astype(jnp.int32)
        return untile_image(a, (H, W), tile, bins.n_tiles_hw)

    return PointFragments(
        idx=finish(outs[0], -1), zbuf=finish(outs[1], -1.0),
        dists2=finish(outs[2], -1.0),
        features=finish(outs[3], 0.0) if CE else None,
    )


def rasterize_points(
    pcls: Pointclouds, camera: PerspectiveCamera,
    settings: PointsRasterizationSettings,
    radius: Union[None, jax.Array] = None,
    extra: Union[None, jax.Array] = None,
) -> PointFragments:
    """Rasterize point clouds into per-pixel top-K fragments.

    radius: optional per-point override (B, N) in NDC units (the Pulsar-style
    sphere radius path); default settings.radius for all points.
    extra: optional (B, N, C) per-point channels (features) gathered with
    the candidates on the BINNED path and returned per hit on
    PointFragments.features (ignored by the dense path).
    """
    H, W = settings.image_size
    K = settings.points_per_pixel
    q, z, valid = project_points_screen(pcls, camera, settings.znear)
    B, N = z.shape
    if radius is None:
        radius_arr = jnp.full((B, N), settings.radius, jnp.float32)
        uniform_r2 = float(settings.radius) ** 2
    else:
        radius_arr = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (B, N))
        uniform_r2 = None
    radius2 = radius_arr * radius_arr

    from .autotune import resolve_points_settings

    settings = resolve_points_settings(
        settings, q=q, z=z, valid=valid, radius_arr=radius_arr
    )
    if settings.bin_size:
        return _rasterize_points_binned(
            q, z, valid, radius2, settings, extra=extra,
            uniform_r2=uniform_r2,
        )

    if settings.impl == "pallas":
        # small cloud / tiny image: auto (or explicit bin_size=0) routed
        # to the dense path, where the fused selection kernel does not
        # apply — say so instead of silently ignoring the explicit impl
        # (the mesh path warns the same way; round-5 review finding)
        import warnings

        warnings.warn(
            "impl='pallas' resolved to the DENSE point path (bin_size 0 "
            "or auto below the binning thresholds) — the fused selection "
            "kernel only runs binned; rendering dense XLA. Pass an "
            "explicit bin_size to force binning.", RuntimeWarning,
        )

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


def suggest_points_per_bin(
    pcls: Pointclouds, camera: PerspectiveCamera,
    settings: PointsRasterizationSettings,
    radius=None, margin: float = 1.3, multiple: int = 32,
) -> int:
    """Smallest safe max_points_per_bin for this concrete cloud+camera
    (overflowing tiles silently drop high-index points, like face bins).
    Call OUTSIDE jit; the result is a static setting."""
    import math

    from .binning import count_bbox_overflow

    q, z, valid = project_points_screen(pcls, camera, settings.znear)
    B, N = z.shape
    if radius is None:
        r = jnp.full((B, N), settings.radius, jnp.float32)
    else:
        r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (B, N))
    if not settings.bin_size:
        raise ValueError(
            "suggest_points_per_bin needs settings.bin_size (the budget is "
            "per-tile; sizing for a default tile then rendering at another "
            "bin_size would overflow and silently drop points)"
        )
    mx = count_bbox_overflow(
        q - r[..., None], q + r[..., None], valid,
        settings.image_size, settings.bin_size,
    )
    want = int(math.ceil(float(mx) * margin / multiple)) * multiple
    return max(multiple, min(want, N))


def suggest_active_tiles_points(
    pcls: Pointclouds, camera: PerspectiveCamera,
    settings: PointsRasterizationSettings,
    radius=None, margin: float = 1.5, multiple: int = 8,
) -> int:
    """Smallest safe active-tile budget for this concrete cloud+camera
    (max non-empty tile count over the batch, with headroom — clouds whose
    footprint moves during a fit need the margin; tiles beyond the budget
    are DROPPED like overflowing point bins). Call OUTSIDE jit; pass as
    PointsRasterizationSettings.active_tiles."""
    import math

    from .binning import count_bbox_active_tiles, tile_grid

    q, z, valid = project_points_screen(pcls, camera, settings.znear)
    B, N = z.shape
    if radius is None:
        r = jnp.full((B, N), settings.radius, jnp.float32)
    else:
        r = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), (B, N))
    if not settings.bin_size:
        raise ValueError("suggest_active_tiles_points needs settings.bin_size")
    n = count_bbox_active_tiles(
        q - r[..., None], q + r[..., None], valid,
        settings.image_size, settings.bin_size,
    )
    TH, TW, _ = tile_grid(settings.image_size, settings.bin_size)
    T = TH * TW
    want = int(math.ceil(n * margin / multiple)) * multiple
    return max(multiple, min(want, T))
