"""Fused Pallas TPU kernels for tile-binned top-K rasterization.

Two kernels share one planes layout:
- _topk_select_kernel (K>1) — THE production winner: with its XLA
  re-interpolation epilogue, 19-27x faster than the XLA tile path on the
  soft-Phong/texture-fit settings (K=8 at 128^2, reference
  deform_mesh_with_color.py:149-159), because the XLA path's per-K
  one-hot interpolation does K x Fmax masked reductions per channel.
  raster.py auto-routes K>1 here on TPU. The kernel does SELECTION ONLY
  (winner lanes); zbuf/bary/dists/fid are re-derived outside by
  _xla_reinterpolate's differentiable one-hot MXU einsum (an earlier
  in-kernel variant also interpolated in-kernel via 13 per-k (tp, F)
  pick reductions — ~85% of its slab traversals — and measured 2.05 vs
  0.65 ms on the joint-fit step; the einsum was already being paid in
  the backward).
- _hard_kernel (K=1) — kept selectable via impl='pallas' but NOT the
  default: the XLA K=1 path measured faster at every scale tried (2.2 vs
  2.7 ms at 128^2; 4x at 720p, where mostly-empty tiles waste the
  kernel's 128-lane chunk padding while XLA sizes lanes to the true bin
  occupancy).

Both keep one tile's pixel-x-face working set in VMEM and bound each
tile's face loop by its real candidate count (scalar-prefetched from the
planes array; the grid runs sequentially per core, so skipped chunks are
pure wall-clock saving).

Gradient convention matches raster.py: SELECTION (which face wins each
pixel) is non-differentiable; gradients flow through the re-interpolation
of the selected face's corner channels only. For K>1 that needs NO
custom_vjp — plain AD through the re-interpolation einsum (its transpose
scatters cotangents back to the candidate lanes); _hard_kernel (K=1)
interpolates in-kernel and keeps the custom_vjp over the same einsum.

Data layout (TPU tiling wants (8, 128)-aligned blocks): per flattened tile,
faces live in 'planes' (N, 16, F) float32 slabs along the face/lane axis:
  rows 0-5   qx0, qy0, qx1, qy1, qx2, qy2  (corner raster coords)
  rows 6-8   z0, z1, z2                    (corner camera z)
  rows 9-11  invz0, invz1, invz2
  row  12    global face id (exact in f32 below 2^24 faces)
  row  13    valid mask
  row  14    tile origin in lanes 0, 1
  row  15    face-chunk trip count in lane 0 (rides in the planes array
             because a separate SMEM operand overflows SMEM at 720p tile
             counts and SMEM BlockSpecs must be (8,128)-tiled)
The 8 output channels per hit are: zbuf, pc0, pc1, pc2, dists, p2f
(global id, f32), live, local winner lane (f32, for the one-hot).
_hard_kernel emits (N, 8, tile^2); _topk_select_kernel emits the same
(N, K*8, tile^2) k-major band layout but fills only rows k*8 (lane,
-1 = dead) and k*8+1 (live) — _tile_topk_reinterp assembles the full
bands.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import (
    bin_faces_ranked,
    check_budget,
    gather_rank_planes,
    untile_image,
)
from .fragments import EMPTY_DIST, Fragments
from .geometry import FaceRasterData

_INF = 3.0e38
_TN = 8    # tiles per program (sublane alignment)
_FC = 128  # face-chunk lanes (bounds the VMEM working set)


def _hard_pixel_offsets(tile: int, inv_s: float):
    """Within-tile pixel-center offsets (TP, 1); computed once per program
    (int div/mod expansions are expensive on the VPU)."""
    tp = tile * tile
    idx = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    xoff = (idx % tile).astype(jnp.float32) * inv_s
    yoff = (idx // tile).astype(jnp.float32) * inv_s
    return xoff, yoff


def _face_chunk_width(F: int) -> int:
    """Chunk lane width: always _FC (Mosaic rejects dynamic-slice vector
    loads whose lane extent is not a 128-multiple on real TPUs; the face
    axis is padded to _FC multiples instead)."""
    del F
    return _FC


def _chunk_fragment_math(px, py, q, zf, invzf, blur, znear, clip_bary, valid):
    """All fragment quantities for one (TP, FC) pixel-x-face chunk.

    Mirrors raster._fragment_math / _select_tile_channels exactly (same
    formulas and clamps) so the kernel's outputs match the XLA binned path.
    Returns (priority, zbuf, pc0, pc1, pc2, dists)."""
    qx = q[0::2]
    qy = q[1::2]

    def cross_e(ax, ay, bx, by):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    # edge k opposite corner k (geometry.setup_faces' abc convention)
    e0 = cross_e(qx[1], qy[1], qx[2], qy[2])
    e1 = cross_e(qx[2], qy[2], qx[0], qy[0])
    e2 = cross_e(qx[0], qy[0], qx[1], qy[1])
    area2 = (qx[1] - qx[0]) * (qy[2] - qy[0]) - (qy[1] - qy[0]) * (qx[2] - qx[0])
    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)
    b0, b1, b2 = e0 * inv_area, e1 * inv_area, e2 * inv_area
    inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)

    # selection z (relu-clipped form, as _select_tile_channels)
    rb0, rb1, rb2 = jax.nn.relu(b0), jax.nn.relu(b1), jax.nn.relu(b2)
    den_sel = jnp.clip(
        rb0 * invzf[0] + rb1 * invzf[1] + rb2 * invzf[2], 1e-12, None
    )
    zsel = (rb0 + rb1 + rb2) / den_sel

    # signed squared boundary distance (always computed: dists output)
    d2 = None
    for a_i, b_i in ((0, 1), (1, 2), (2, 0)):
        gx = qx[b_i] - qx[a_i]
        gy = qy[b_i] - qy[a_i]
        len2 = jnp.clip(gx * gx + gy * gy, 1e-12, None)
        wx = px - qx[a_i]
        wy = py - qy[a_i]
        wg = wx * gx + wy * gy
        t = jnp.clip(wg / len2, 0.0, 1.0)
        dd = wx * wx + wy * wy - 2.0 * t * wg + t * t * len2
        d2 = dd if d2 is None else jnp.minimum(d2, dd)
    d2 = jnp.maximum(d2, 0.0)
    dists = jnp.where(inside, -d2, d2)

    if blur > 0.0:
        cover = inside | (d2 < blur)
    else:
        cover = inside
    cover = cover & (valid > 0.0) & (zsel > znear)
    priority = jnp.where(cover, zsel, _INF)

    # interpolation outputs (raw-bary perspective correction, _fragment_math)
    npc = [b0 * invzf[0], b1 * invzf[1], b2 * invzf[2]]
    denom = jnp.clip(npc[0] + npc[1] + npc[2], 1e-12, None)
    pc = [n / denom for n in npc]
    if clip_bary:
        rp = [jax.nn.relu(p) for p in pc]
        rden = jnp.clip(rp[0] + rp[1] + rp[2], 1e-12, None)
        pc = [p / rden for p in rp]
    zbuf = pc[0] * zf[0] + pc[1] * zf[1] + pc[2] * zf[2]
    return priority, zbuf, pc[0], pc[1], pc[2], dists


def _hard_kernel(tile, inv_s, blur, znear, clip_bary, fc, n_fc,
                 planes_ref, out_ref):
    tp = tile * tile
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tp, fc), 1)
    xoff, yoff = _hard_pixel_offsets(tile, inv_s)

    def row_body(i):
        px = planes_ref[i, 14, 0] + xoff
        py = planes_ref[i, 14, 1] + yoff

        def face_chunk(c, carry):
            bz, bzbuf, bpc0, bpc1, bpc2, bdist, bfid, blane = carry
            f0 = pl.multiple_of(c * fc, fc)
            sl = pl.ds(f0, fc)
            q = tuple(planes_ref[i, r, sl][None, :] for r in range(6))
            zf = tuple(planes_ref[i, 6 + r, sl][None, :] for r in range(3))
            invzf = tuple(planes_ref[i, 9 + r, sl][None, :] for r in range(3))
            fid = planes_ref[i, 12, sl][None, :]
            valid = planes_ref[i, 13, sl][None, :]

            prio, zbuf, pc0, pc1, pc2, dists = _chunk_fragment_math(
                px, py, q, zf, invzf, blur, znear, clip_bary, valid
            )

            # per-pixel winner within this chunk: min-reduce, then the first
            # lane attaining it (= lowest global face id, matching
            # jnp.argmin's tie-break) via a second min over masked iota
            zmin = jnp.min(prio, axis=-1)                      # (TP,)
            amin = jnp.min(
                jnp.where(prio == zmin[:, None], lane_iota, fc), axis=-1
            )
            onehot = (lane_iota == amin[:, None]).astype(jnp.float32)
            pick = lambda v: jnp.sum(onehot * v, axis=-1)      # (TP,)

            upd = zmin < bz
            sel = lambda new, old: jnp.where(upd, new, old)
            lane_g = (c * fc + amin).astype(jnp.float32)
            return (
                sel(zmin, bz), sel(pick(zbuf), bzbuf),
                sel(pick(pc0), bpc0), sel(pick(pc1), bpc1),
                sel(pick(pc2), bpc2), sel(pick(dists), bdist),
                sel(pick(fid), bfid), sel(lane_g, blane),
            )

        zero = jnp.zeros((tp,), jnp.float32)
        init = (jnp.full((tp,), _INF, jnp.float32), zero, zero, zero, zero,
                zero, zero, zero)
        bz, bzbuf, bpc0, bpc1, bpc2, bdist, bfid, blane = jax.lax.fori_loop(
            0, planes_ref[i, 15, 0].astype(jnp.int32), face_chunk, init
        )

        live = bz < _INF
        livef = live.astype(jnp.float32)
        out_ref[i, 0, :] = jnp.where(live, bzbuf, -1.0)
        out_ref[i, 1, :] = jnp.where(live, bpc0, 0.0)
        out_ref[i, 2, :] = jnp.where(live, bpc1, 0.0)
        out_ref[i, 3, :] = jnp.where(live, bpc2, 0.0)
        out_ref[i, 4, :] = jnp.where(live, bdist, EMPTY_DIST)
        out_ref[i, 5, :] = jnp.where(live, bfid, -1.0)
        out_ref[i, 6, :] = livef
        out_ref[i, 7, :] = jnp.where(live, blane, 0.0)

    # Unrolling rows keeps _TN copies of the (tp, _FC) intermediates live on
    # the VMEM stack — only safe for small tiles (tile=32 blows the 16M
    # scoped-vmem limit); a fori over rows reuses one iteration's stack.
    if n_fc <= 3 and tp <= 256:
        for i in range(_TN):
            row_body(i)
    else:
        def row(i, _):
            row_body(i)
            return 0

        jax.lax.fori_loop(0, _TN, row, 0)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _topk_select_kernel(tile, inv_s, blur, znear, clip_bary, K, F, fc,
                        planes_ref, out_ref, prio_ref):
    """Selection-only variant of _topk_kernel: per extraction pass emit
    ONLY the winner's local lane (row k*8; -1 = no hit) and live mask
    (row k*8+1); rows k*8+2..7 are zero.

    The fragment values (zbuf/bary/dists/fid) are NOT computed in-kernel —
    the caller re-derives them differentiably via _xla_reinterpolate's
    one-hot MXU einsum, which the top-K backward ran anyway. _topk_kernel's
    13 per-k `pick` reductions were ~85% of its (tp, F) slab traversals;
    this kernel's extraction pass is just min + arg-lane + prio update.
    Same split-selection-from-interpolation architecture as the packed K=1
    kernel (see the negative-result header below), where it was the fix
    for in-kernel extraction being latency-poison.

    Output keeps the (8, tp)-band store pattern (dynamic sublane stores
    need 8-row alignment; single-sublane dynamic stores don't compile)."""
    tp = tile * tile
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tp, F), 1)
    xoff, yoff = _hard_pixel_offsets(tile, inv_s)
    zero = jnp.zeros((tp,), jnp.float32)
    neg1 = -1.0 * jnp.ones((tp,), jnp.float32)
    empty_band = jnp.stack([neg1] + [zero] * 7, axis=0)  # (8, tp)

    def row_body(i):
        count = planes_ref[i, 15, 0].astype(jnp.int32)

        @pl.when(count == 0)
        def _empty():
            def k_body(k, _):
                out_ref[i, pl.ds(pl.multiple_of(k * 8, 8), 8), :] = empty_band
                return 0

            jax.lax.fori_loop(0, K, k_body, 0)

        @pl.when(count > 0)
        def _full():
            px = planes_ref[i, 14, 0] + xoff
            py = planes_ref[i, 14, 1] + yoff

            # phase 1: priority slab, chunk by chunk (as _topk_kernel)
            prio_ref[...] = jnp.full((tp, F), _INF, jnp.float32)

            def chunk_body(c, _):
                sl = pl.ds(pl.multiple_of(c * fc, fc), fc)
                q = tuple(planes_ref[i, r, sl][None, :] for r in range(6))
                zf = tuple(
                    planes_ref[i, 6 + r, sl][None, :] for r in range(3)
                )
                invzf = tuple(
                    planes_ref[i, 9 + r, sl][None, :] for r in range(3)
                )
                valid = planes_ref[i, 13, sl][None, :]
                prio_c, _, _, _, _, _ = _chunk_fragment_math(
                    px, py, q, zf, invzf, blur, znear, clip_bary, valid
                )
                prio_ref[:, sl] = prio_c
                return 0

            jax.lax.fori_loop(0, count, chunk_body, 0)

            # phase 2: K selection-only extraction passes
            def k_body(k, prio):
                zmin = jnp.min(prio, axis=-1)                  # (TP,)
                amin = jnp.min(
                    jnp.where(prio == zmin[:, None], lane_iota, F), axis=-1
                )
                live = zmin < _INF
                band = jnp.stack(
                    [
                        jnp.where(live, amin.astype(jnp.float32), -1.0),
                        live.astype(jnp.float32),
                    ] + [zero] * 6,
                    axis=0,
                )  # (8, tp)
                out_ref[i, pl.ds(pl.multiple_of(k * 8, 8), 8), :] = band
                return jnp.where(lane_iota == amin[:, None], _INF, prio)

            jax.lax.fori_loop(0, K, k_body, prio_ref[...])

    def row(i, _):
        row_body(i)
        return 0

    jax.lax.fori_loop(0, _TN, row, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4, 5))
def _tile_hard(planes, tile, inv_s, blur, znear, clip_bary):
    """planes (N, 16, F) -> out (N, 8, tile^2) [zbuf, pc0..2, dists, p2f,
    live, lane]."""
    return _tile_hard_fwd(planes, tile, inv_s, blur, znear, clip_bary)[0]


def _tile_hard_fwd(planes, tile, inv_s, blur, znear, clip_bary):
    N, _, F = planes.shape
    tp = tile * tile
    fc = _face_chunk_width(F)
    out = pl.pallas_call(
        functools.partial(
            _hard_kernel, tile, inv_s, blur, znear, clip_bary, fc,
            -(-F // fc)
        ),
        grid=(N // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 16, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, 8, tp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8, tp), jnp.float32),
        interpret=_interpret(),
    )(planes)
    return out, (planes, out[:, 6, :], out[:, 7, :])


def _xla_reinterpolate(planes, lane, live, tile, inv_s, blur, znear,
                       clip_bary, K: int = 1, tile_chunk: int = 512,
                       with_fid: bool = False):
    """Differentiable XLA recomputation of the kernel's zbuf/pc/dists rows
    from the saved winner lanes: one-hot gather of the 12 corner channels
    (MXU einsum; its transpose is the scatter back to candidate lanes),
    then the same fragment math. Used inside the per-tile kernels'
    backward passes, and as the packed selection kernel's forward
    interpolation (with_fid=True adds the planes' row-12 face id as a
    sixth output row).

    lane, live: (N, K, tp). Returns (N, 5 + with_fid, K, tp)."""
    from .raster import _fragment_math

    N, _, F = planes.shape
    tp = tile * tile
    ktp = K * tp
    tile_chunk = max(1, tile_chunk // K)
    ncols = 13 if with_fid else 12

    n_chunks = -(-N // tile_chunk)
    padn = n_chunks * tile_chunk - N
    padc = lambda a: jnp.pad(
        a, [(0, padn)] + [(0, 0)] * (a.ndim - 1)
    ).reshape((n_chunks, tile_chunk) + a.shape[1:])

    iota_f = jax.lax.broadcasted_iota(jnp.int32, (1, 1, F), 2)
    d = jnp.arange(tile, dtype=jnp.float32) * inv_s
    lx = jnp.tile(jnp.tile(d, tile), K)[None, :]    # (1, K*tp) x offsets
    ly = jnp.tile(jnp.repeat(d, tile), K)[None, :]  # (1, K*tp) y offsets

    # rebuild the one-hot in backward, never store it: without the
    # checkpoint, jax.vjp across the lax.map saves the (chunk, K*tp, F)
    # one-hot as a residual — ~2 GB of HBM write+read per joint-fit step
    # at the 128^2/K=8 scale (profiled: 3.2 ms of a 19.6 ms step as a DUS
    # store + reload pair). But DO save the (chunk, K*tp, ncols) gathered
    # sel (tiny): the backward then needs only the TRANSPOSE one-hot dot
    # (the scatter to planes), not a recompute of the forward gather dot
    # — measured 0.70 ms/step of the joint fit.
    @functools.partial(
        jax.checkpoint,
        policy=jax.checkpoint_policies.checkpoint_dots,
    )
    def per_chunk(args):
        pl_c, lane_c, live_c = args             # (c,16,F), (c,ktp), (c,ktp)
        idx = lane_c.astype(jnp.int32)[..., None]   # (c, ktp, 1)
        onehot = ((idx == iota_f) & (live_c[..., None] > 0.0)).astype(
            planes.dtype
        )                                           # (c, ktp, F)
        sel = jnp.einsum(
            "ntf,ncf->ntc", onehot, pl_c[:, :ncols],
            precision=jax.lax.Precision.HIGHEST,
        )                                           # (c, ktp, ncols)
        px = pl_c[:, 14, 0][:, None] + lx
        py = pl_c[:, 14, 1][:, None] + ly
        qx = [sel[..., 0], sel[..., 2], sel[..., 4]]
        qy = [sel[..., 1], sel[..., 3], sel[..., 5]]
        zf = [sel[..., 6 + k] for k in range(3)]
        invzf = [sel[..., 9 + k] for k in range(3)]
        zbuf, pc, dists = _fragment_math(px, py, qx, qy, zf, invzf, clip_bary)
        rows = [zbuf, pc[0], pc[1], pc[2], dists]
        if with_fid:
            rows.append(sel[..., 12])
        return jnp.stack(rows, axis=1)

    flat = lambda a: a.reshape(a.shape[0], ktp)
    rows = jax.lax.map(
        per_chunk,
        (padc(planes), padc(flat(jax.lax.stop_gradient(lane))),
         padc(flat(jax.lax.stop_gradient(live)))),
    )
    R = 6 if with_fid else 5
    return rows.reshape(n_chunks * tile_chunk, R, K, tp)[:N]


def _tile_hard_bwd(tile, inv_s, blur, znear, clip_bary, res, g):
    planes, live, lane = res[0], res[1], res[2]
    # only rows 0-4 (zbuf, pc, dists) carry gradients; mask empty slots
    g05 = (g[:, :5, :] * live[:, None, :])[:, :, None, :]  # (N, 5, 1, tp)

    def rec(p):
        return _xla_reinterpolate(
            p, lane[:, None, :], live[:, None, :], tile, inv_s, blur, znear,
            clip_bary, K=1,
        )

    _, vjp = jax.vjp(rec, planes)
    return (vjp(g05)[0],)


_tile_hard.defvjp(_tile_hard_fwd, _tile_hard_bwd)


def _tile_topk_reinterp(planes, tile, inv_s, blur, znear, clip_bary, K):
    """K>1 fused path: selection-only Pallas kernel + differentiable XLA
    re-interpolation. Same (N, 8K, tp) k-major band layout and bit-exact
    values as the retired in-kernel-interpolating variant, but with NO
    custom_vjp: plain AD flows through the one-hot einsum (whose transpose
    is the scatter the old backward built by hand); _xla_reinterpolate's
    checkpoint_dots policy keeps the one-hot out of the residuals while
    saving the tiny gathered sel."""
    N, _, F = planes.shape
    tp = tile * tile
    fc = _face_chunk_width(F)
    sel = pl.pallas_call(
        functools.partial(
            _topk_select_kernel, tile, inv_s, blur, znear, clip_bary, K, F,
            fc
        ),
        grid=(N // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 16, F), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, 8 * K, tp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8 * K, tp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tp, F), jnp.float32)],
        interpret=_interpret(),
    )(jax.lax.stop_gradient(planes))
    per_k = sel.reshape(N, K, 8, tp)
    lane = per_k[:, :, 0, :]                       # (N, K, tp), -1 = dead
    live = per_k[:, :, 1, :]

    rows = _xla_reinterpolate(
        planes, jnp.maximum(lane, 0.0), live, tile, inv_s, blur, znear,
        clip_bary, K=K, with_fid=True,
    )                                              # (N, 6, K, tp)
    lv = live > 0.0
    bands = jnp.stack(
        [
            jnp.where(lv, rows[:, 0], -1.0),       # zbuf
            jnp.where(lv, rows[:, 1], 0.0),        # pc0
            jnp.where(lv, rows[:, 2], 0.0),        # pc1
            jnp.where(lv, rows[:, 3], 0.0),        # pc2
            jnp.where(lv, rows[:, 4], EMPTY_DIST),  # dists
            jnp.where(lv, rows[:, 5], -1.0),       # p2f (global fid)
            live,
            jnp.maximum(lane, 0.0),                # lane (0 where dead)
        ],
        axis=2,
    )                                              # (N, K, 8, tp)
    return bands.reshape(N, 8 * K, tp)


# ---------------------------------------------------------------------------
# Group-packed K=1 SELECTION kernel — MEASURED NEGATIVE RESULT (kept,
# tested, opt-in via RasterizationSettings.layout="packed"; never
# auto-picked).
#
# The hypothesis: the candidates of the 8 tiles a program owns share ONE
# lane axis (the soft path's biggest occupancy lever, 1.42x there), so a
# group pays ceil(group_total/128) face chunks instead of the per-tile
# layout's ceil(count/128)*128 lanes per tile (720p tile=16: mean 20
# candidates in a 128-lane chunk, 6.4x padding waste — why the per-tile
# _hard_kernel measured 4x slower than the XLA tile path there).
#
# Why it LOSES for hard selection (same-session 720p 12-view A/Bs, v5e):
#   * Segmented MIN cannot ride the MXU the way the soft path's segmented
#     SUM does (a one-hot dot). It needs 8 masked lane-min reductions per
#     chunk (x2 passes for the winner lane), and a lane reduction of a
#     (TP, 128) slab costs ~8x an elementwise op (~7 shuffle steps per
#     vreg) — ~2/3 of the kernel's cycles, ~4x more than the padding the
#     packing saves. Kernel-only: 27.1 ms (tile=16) / 53.9 ms (tile=32)
#     vs the ENTIRE XLA path's 20.3 ms.
#   * XLA's fused iota-argmin over static Fmax lanes is already within
#     ~2x of the VPU op bound; its 2.5-2.9x static-lane padding and any
#     packed formulation's segmentation overhead cancel out. Measured
#     end-to-end: XLA 20.3 ms vs packed 66 (tile=16) / 76 (tile=32); on a
#     DENSE 20k-face mesh at 512^2 (best case for packing: max/mean
#     occupancy 158/76) XLA 35.8 vs packed 46.4 ms.
#   * A first cut extracted winner channels in-kernel with per-chunk
#     one-hot HIGHEST dots: 38 ms of a 52 ms call (6 latency-bound MXU
#     dots per chunk). The selection-only split below removes them; the
#     masked reductions then dominate. A region-aligned variant (per-tile
#     budgets quantized to 32-lane regions, one reshape-reduce) pencils
#     out to ~8 ms kernel at tile=16 but the tile=16 assembly (gather at
#     A=1192 + pack, ~8 ms) still leaves it at parity with XLA — not
#     built.
#
# What the path still provides (why it is kept): a bit-exact, fully
# tested SECOND implementation of K=1 binned rasterization (winner
# identity, zbuf, bary, dists match the XLA path exactly on TPU), whose
# design splits selection from interpolation:
#
# The kernel finds WINNERS ONLY (per pixel per tile: live + winning packed
# lane) and is pure VPU selection work with no gradient: fragment values
# are re-derived OUTSIDE by the same exact one-hot re-interpolation the
# per-tile backwards use (_xla_reinterpolate on the per-tile gathered
# channels), so the whole path is differentiable through ordinary AD — no
# custom_vjp, and the pack contraction runs on stop-gradient selection
# channels (no transpose in the backward).
#
# Ingredients (mirrors pallas_soft's packed kernel):
#   * translation invariance: the selection math only uses coordinate
#     DIFFERENCES (edge crosses, point-to-edge distances), so corners are
#     pre-translated into their tile's pixel frame and every face
#     rasterizes against the same within-tile offsets; invz is untouched
#     by an xy translation.
#   * per-tile segmentation of the winner search: per chunk, each of the
#     8 tile slots takes a masked lane-min of the priority (exact VPU
#     selects + reduces — an MXU broadcast has ~1.5e-5 error, which would
#     break the == winner test), then the winning lane is the masked min
#     of a W-masked lane iota (first-lane tie-break, matching the XLA
#     path's slot order = ascending face id).
#
# Layout: planes (N_g, 16, S) f32 — rows 0-5 tile-frame corner channels,
# rows 6-8 invz (selection z needs no plain-z rows), row 9 ev = tile_slot
# + 1 (0 = padding), row 10 meta (lane 0 = face-chunk trip count), rows
# 11-15 zero (sublane alignment). Output (N_g, 16, tp): row t*2 = live,
# row t*2 + 1 = winning packed lane of tile slot t.
# ---------------------------------------------------------------------------


def _chunk_priority(px, py, q, invzf, blur, znear, valid):
    """Selection priority for one (TP, FC) pixel-x-face chunk: the
    relu-clipped selection z of _chunk_fragment_math, INF where the face
    does not cover the pixel (inside test, blur band, znear, validity).
    Same formulas and clamps — winner identity matches exactly."""
    qx = q[0::2]
    qy = q[1::2]

    def cross_e(ax, ay, bx, by):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    e0 = cross_e(qx[1], qy[1], qx[2], qy[2])
    e1 = cross_e(qx[2], qy[2], qx[0], qy[0])
    e2 = cross_e(qx[0], qy[0], qx[1], qy[1])
    area2 = (qx[1] - qx[0]) * (qy[2] - qy[0]) - (qy[1] - qy[0]) * (qx[2] - qx[0])
    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)
    b0, b1, b2 = e0 * inv_area, e1 * inv_area, e2 * inv_area
    inside = (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)

    rb0, rb1, rb2 = jax.nn.relu(b0), jax.nn.relu(b1), jax.nn.relu(b2)
    den_sel = jnp.clip(
        rb0 * invzf[0] + rb1 * invzf[1] + rb2 * invzf[2], 1e-12, None
    )
    zsel = (rb0 + rb1 + rb2) / den_sel

    if blur > 0.0:
        d2 = None
        for a_i, b_i in ((0, 1), (1, 2), (2, 0)):
            gx = qx[b_i] - qx[a_i]
            gy = qy[b_i] - qy[a_i]
            len2 = jnp.clip(gx * gx + gy * gy, 1e-12, None)
            wx = px - qx[a_i]
            wy = py - qy[a_i]
            wg = wx * gx + wy * gy
            t = jnp.clip(wg / len2, 0.0, 1.0)
            dd = wx * wx + wy * wy - 2.0 * t * wg + t * t * len2
            d2 = dd if d2 is None else jnp.minimum(d2, dd)
        cover = inside | (jnp.maximum(d2, 0.0) < blur)
    else:
        cover = inside
    cover = cover & (valid > 0.0) & (zsel > znear)
    return jnp.where(cover, zsel, _INF)


def _select_kernel_packed(tile, inv_s, blur, znear, fc, planes_ref, out_ref):
    from .pallas_soft import _packed_oh

    tp = tile * tile
    xoff, yoff = _hard_pixel_offsets(tile, inv_s)
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tp, fc), 1)

    def face_chunk(c, carry):
        bprio, blane = carry
        sl = pl.ds(pl.multiple_of(c * fc, fc), fc)
        blk = planes_ref[0, :, sl]                       # (16, fc)
        q = tuple(blk[r][None, :] for r in range(6))
        invzf = tuple(blk[6 + r][None, :] for r in range(3))
        ev = blk[9][None, :]
        valid = (ev > 0.0).astype(jnp.float32)

        prio = _chunk_priority(xoff, yoff, q, invzf, blur, znear, valid)

        oh = _packed_oh(ev)                              # (8, fc) 0/1 f32
        ohb = [oh[j][None, :] > 0.0 for j in range(_TN)]

        # per-tile winner priority: masked lane-min per tile slot (exact)
        zmins = [
            jnp.min(jnp.where(ohb[j], prio, _INF), axis=-1)   # (TP,)
            for j in range(_TN)
        ]
        # broadcast each lane's own tile's winner z back (exact select
        # chain), then first winning lane per tile via a masked iota min
        zl = jnp.full((tp, fc), _INF, jnp.float32)
        for j in range(_TN):
            zl = jnp.where(ohb[j], zmins[j][:, None], zl)
        W = (prio == zl) & (prio < _INF)
        im = jnp.where(W, lane_iota, fc)
        amins = [
            jnp.min(jnp.where(ohb[j], im, fc), axis=-1)  # (TP,) int32
            for j in range(_TN)
        ]

        zmin_rows = jnp.stack(zmins, axis=0)             # (8, TP)
        lane_g = (c * fc + jnp.stack(amins, axis=0)).astype(jnp.float32)
        upd = zmin_rows < bprio
        return (jnp.where(upd, zmin_rows, bprio),
                jnp.where(upd, lane_g, blane))

    init = (jnp.full((_TN, tp), _INF, jnp.float32),
            jnp.zeros((_TN, tp), jnp.float32))
    nc = planes_ref[0, 10, 0].astype(jnp.int32)
    bprio, blane = jax.lax.fori_loop(0, nc, face_chunk, init)

    for t in range(_TN):
        live = bprio[t] < _INF
        out_ref[0, 2 * t, :] = live.astype(jnp.float32)
        out_ref[0, 2 * t + 1, :] = jnp.where(live, blane[t], 0.0)


def _tile_select_packed(planes, tile, inv_s, blur, znear):
    """Group-packed selection planes (N_g, 16, S) -> (N_g, 16, tp), rows
    (2t, 2t+1) = (live, winning packed lane) of tile slot t. Selection is
    non-differentiable by convention; callers stop_gradient the inputs."""
    N, _, S = planes.shape
    tp = tile * tile
    return pl.pallas_call(
        functools.partial(
            _select_kernel_packed, tile, inv_s, blur, znear, _FC
        ),
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, 16, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 16, tp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 16, tp), jnp.float32),
        interpret=_interpret(),
    )(planes)


def rasterize_binned_pallas(
    fd: FaceRasterData, settings, extra=None, extra_layout=(),
) -> Fragments:
    """Coarse-to-fine top-K rasterization through the fused Pallas kernels.

    Drop-in for raster._rasterize_binned: K=1 uses _tile_hard (the
    hard-depth / silhouette / single-hit Phong path), K>1 uses _tile_topk_reinterp
    (soft Phong / texture fitting, reference deform_mesh_with_color.py:
    149-159's faces_per_pixel=50 settings). Same bins, same fragment
    semantics; selection runs in VMEM with per-tile occupancy skipping.

    extra: optional (B, F, CE) per-face attribute channels (corner-major
    flattened (B, F, 3, Ctot)); they ride the bin gather's one-hot einsum
    and come back on Fragments.binned together with the kernel's winner
    lanes, enabling bin-local attribute interpolation
    (fragments.interpolate_binned). extra_layout: ((name, start, c), ...)
    slices into Ctot."""
    H, W = settings.image_size
    K = settings.faces_per_pixel
    tile = settings.bin_size
    blur = settings.blur_radius
    pad_radius = math.sqrt(blur) if blur > 0 else 0.0

    fd_sel = jax.lax.stop_gradient(fd)
    compact = settings.active_tiles is not None
    # rank binning (prefix-count slots, no top_k); the global face id rides
    # the one-hot contraction as one extra f32 channel (exact below 2^24).
    # active_tiles compacts the tile axis to the non-empty tiles first —
    # the gather and both kernels then run on A instead of T tiles, and the
    # per-tile channel bands scatter back to the full grid at the end.
    if compact:
        from .binning import bin_faces_active

        bins = bin_faces_active(
            fd_sel, (H, W), tile, pad_radius, settings.active_tiles
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
    ex = fid if extra is None else jnp.concatenate([extra, fid], axis=-1)
    ch, exg, mask = gather_rank_planes(
        fd, bins, min(settings.max_faces_per_bin, F), extra=ex
    )  # (B, T, Fmax) channels
    extra_bin = exg[..., :-1] if extra is not None else None
    fidf = jax.lax.stop_gradient(exg[..., -1])
    B, T, Fmax = mask.shape                                   # T = A if compact

    valid = mask.astype(jnp.float32)
    if origins is None:
        origins = jnp.broadcast_to(bins.tile_origin[None], (B, T, 2))
    origin_row = jnp.zeros((B, T, Fmax), jnp.float32)
    origin_row = origin_row.at[..., 0].set(origins[..., 0])
    origin_row = origin_row.at[..., 1].set(origins[..., 1])
    # per-tile face-chunk trip count rides in planes row 15 lane 0: a
    # separate SMEM input would need a whole-array (overflows SMEM at 720p
    # tile counts) or (8,128)-tiled block, and the kernels already do
    # scalar VMEM reads for the tile origins
    fc = _face_chunk_width(Fmax + ((-Fmax) % _FC))
    n_chunks = -(-jnp.minimum(bins.count, Fmax) // fc)      # (B, T) int
    zrow = jnp.zeros((B, T, Fmax), jnp.float32)
    zrow = zrow.at[..., 0].set(n_chunks.astype(jnp.float32))

    planes = jnp.stack(
        [
            ch["qx0"], ch["qy0"], ch["qx1"], ch["qy1"], ch["qx2"], ch["qy2"],
            ch["z0"], ch["z1"], ch["z2"],
            ch["invz0"], ch["invz1"], ch["invz2"],
            fidf, valid, origin_row, zrow,
        ],
        axis=2,
    ).reshape(B * T, 16, Fmax)

    # pad the face/lane axis to full _FC chunks (padding faces carry valid=0)
    f_pad = (-Fmax) % _FC
    if f_pad:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, f_pad)))
    N = B * T
    n_pad = (-N) % _TN
    if n_pad:
        planes = jnp.pad(planes, ((0, n_pad), (0, 0), (0, 0)))

    inv_s = 1.0 / (min(H, W) / 2.0)
    tp = tile * tile
    if K == 1:
        out = _tile_hard(
            planes, tile, inv_s, blur, settings.znear, settings.clip_bary
        )[:N]                                        # (N, 8, tp)
        per_tile = out.reshape(B, T, 1, 8, tp)
    else:
        out = _tile_topk_reinterp(
            planes, tile, inv_s, blur, settings.znear, settings.clip_bary, K
        )[:N]                                        # (N, K*8, tp)
        per_tile = out.reshape(B, T, K, 8, tp)

    return _bands_to_fragments(per_tile, bins, compact, settings, extra_bin,
                               extra_layout)


def _bands_to_fragments(per_tile, bins, compact, settings, extra_bin,
                        extra_layout):
    """Shared tail of the binned-Pallas paths: per-tile channel bands
    (B, T_or_A, K, 8, tp) -> Fragments (scatter back to the full grid under
    compaction, untile, split channels, attach BinnedAttributes)."""
    H, W = settings.image_size
    tile = settings.bin_size
    if compact:
        # back to the full tile grid; empty tiles carry the kernels' own
        # no-hit band (zbuf -1 / bary 0 / dists EMPTY_DIST / fid -1 /
        # live 0 / lane 0), selected exactly via the active indicator
        from .binning import scatter_active_bg

        bg = jnp.array(
            [-1.0, 0.0, 0.0, 0.0, EMPTY_DIST, -1.0, 0.0, 0.0], jnp.float32
        )[None, None, None, :, None]                 # broadcast (B,T,K,8,tp)
        per_tile = scatter_active_bg(per_tile, bins, bg)

    def img(row):  # (B, H, W, K)
        chan = per_tile[:, :, :, row, :].transpose(0, 1, 3, 2)  # (B,T,tp,K)
        return untile_image(chan, (H, W), tile, bins.n_tiles_hw)

    zbuf = img(0)                                    # (B, H, W, K)
    bary = jnp.stack([img(1), img(2), img(3)], axis=-1)  # (B, H, W, K, 3)
    dists = img(4)
    p2f = jnp.round(img(5)).astype(jnp.int32)

    binned = None
    if extra_bin is not None:
        from .fragments import BinnedAttributes

        lane = jnp.round(jax.lax.stop_gradient(img(7))).astype(jnp.int32)
        binned = BinnedAttributes(
            lane=lane, channels=extra_bin, tile=tile,
            n_tiles_hw=bins.n_tiles_hw, layout=tuple(extra_layout),
            # under compaction the channels' first axis is A; hand
            # interpolate_binned the rank maps so it runs compact too
            rank=bins.rank if compact else None,
            invrank=bins.invrank if compact else None,
        )
    return Fragments(
        pix_to_face=p2f, zbuf=zbuf, bary=bary, dists=dists, binned=binned
    )


def rasterize_packed_pallas(
    fd: FaceRasterData, settings, extra=None, extra_layout=(),
) -> Fragments:
    """K=1 rasterization through the group-packed selection kernel.

    Same Fragments interface as rasterize_binned_pallas; requires
    settings.active_tiles (the pack groups follow active-compaction order)
    and faces_per_pixel == 1. The Pallas kernel finds winners only (pure
    VPU selection, stop-gradient, on 9 packed channels); zbuf/bary/dists/
    fid are re-derived from the PER-TILE gathered channels by the exact
    one-hot re-interpolation einsum (_xla_reinterpolate) — the same math
    and formulas as the XLA tile path, differentiable through ordinary AD
    (the einsum transpose is the scatter back to candidate lanes; no
    custom_vjp anywhere on this path, and the pack contraction carries no
    gradient).

    extra: as rasterize_binned_pallas — per-tile attribute channels for
    bin-local interpolation. The kernel's packed winner lanes are converted
    back to per-tile lanes (lane - the tile's pack offset), so
    BinnedAttributes and fragments.interpolate_binned work unchanged."""
    from .binning import (
        bin_faces_active,
        group_offsets,
        pack_groups,
        packed_ev_row,
    )

    H, W = settings.image_size
    if settings.faces_per_pixel != 1:
        raise ValueError(
            "layout='packed' supports faces_per_pixel=1 only; got "
            f"{settings.faces_per_pixel} (use the per-tile _tile_topk_reinterp path)"
        )
    if settings.active_tiles is None:
        raise ValueError(
            "layout='packed' requires active_tiles (pack groups follow "
            "active-compaction order); size with "
            "binning.suggest_active_tiles_fd"
        )
    tile = settings.bin_size
    blur = settings.blur_radius
    pad_radius = math.sqrt(blur) if blur > 0 else 0.0
    B = fd.valid.shape[0]
    F = fd.num_faces

    fd_sel = jax.lax.stop_gradient(fd)
    bins = bin_faces_active(
        fd_sel, (H, W), tile, pad_radius, settings.active_tiles
    )
    A = bins.slot.shape[1]
    Fmax = min(settings.max_faces_per_bin, F)
    check_budget(
        "active_tiles", jnp.max(bins.n_active), settings.active_tiles,
        settings.check_budgets,
        hint="size with binning.suggest_active_tiles_fd",
    )
    check_budget(
        "max_faces_per_bin", jnp.max(bins.count), Fmax,
        settings.check_budgets,
        hint="size with pallas_soft.suggest_faces_per_tile / count_overflow",
    )

    # one gather serves both stages: the kernel's stop-grad selection
    # channels AND the differentiable re-interpolation planes
    fid = jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.float32, (1, F, 1), 1), (B, F, 1)
    )
    ex = fid if extra is None else jnp.concatenate([extra, fid], axis=-1)
    ch, exg, mask = gather_rank_planes(fd, bins, Fmax, extra=ex)
    extra_bin = exg[..., :-1] if extra is not None else None
    fidf = jax.lax.stop_gradient(exg[..., -1])          # (B, A, Fmax)

    # ---- selection stage (stop-grad): translate corners into their
    # tile's pixel frame (selection math is translation-invariant; invz
    # is untouched by xy shifts), pack the 8 tiles of each kernel program
    # into one shared lane axis, run the winner kernel
    ox = bins.origin[..., 0:1]
    oy = bins.origin[..., 1:2]
    slabs = jax.lax.stop_gradient(jnp.stack(
        [ch["qx0"] - ox, ch["qy0"] - oy, ch["qx1"] - ox, ch["qy1"] - oy,
         ch["qx2"] - ox, ch["qy2"] - oy,
         ch["invz0"], ch["invz1"], ch["invz2"]],
        axis=-1,
    ))                                                  # (B, A, Fmax, 9)

    capped = jnp.minimum(bins.count, Fmax)              # (B, A)
    a_pad = (-A) % _TN
    if a_pad:
        slabs = jnp.pad(slabs, ((0, 0), (0, a_pad), (0, 0), (0, 0)))
        capped = jnp.pad(capped, ((0, 0), (0, a_pad)))
    A8 = A + a_pad
    G = A8 // _TN

    S_g = 8 * Fmax if settings.group_lanes is None else settings.group_lanes
    S_g += (-S_g) % _FC

    packed, n_valid = pack_groups(slabs, capped, S_g)   # (B*G, S_g, 9)
    cg, off = group_offsets(capped, Fmax)               # (B, G, 8)
    check_budget(
        "group_lanes", jnp.max(jnp.sum(cg, axis=-1)), S_g,
        settings.check_budgets,
        hint="size with binning.suggest_group_lanes_fd",
    )
    ev = packed_ev_row(cg, n_valid, S_g).reshape(B * G, 1, S_g)
    n_chunks = -(-n_valid // _FC)                       # (B, G)
    meta = jnp.zeros((B * G, 1, S_g), jnp.float32)
    meta = meta.at[:, 0, 0].set(n_chunks.reshape(-1).astype(jnp.float32))
    zrows = jnp.zeros((B * G, 5, S_g), jnp.float32)     # sublane alignment
    planes_sel = jnp.concatenate(
        [jnp.swapaxes(packed, 1, 2), ev, meta, zrows], axis=1
    )                                                   # (B*G, 16, S_g)

    inv_s = 1.0 / (min(H, W) / 2.0)
    tp = tile * tile
    out = _tile_select_packed(
        planes_sel, tile, inv_s, blur, settings.znear
    )                                                   # (B*G, 16, tp)
    sel = out.reshape(B, A8, 2, tp)[:, :A]              # rows (2t, 2t+1)
    live = sel[:, :, 0]                                 # (B, A, tp)
    # packed winner lane -> per-tile lane (minus the tile's pack offset),
    # so the re-interpolation and BinnedAttributes index the per-tile
    # gather channels as usual
    off_t = off.reshape(B, A8)[:, :A].astype(jnp.float32)   # (B, A)
    lane_t = jnp.where(live > 0.0, sel[:, :, 1] - off_t[..., None], 0.0)

    # ---- interpolation stage (differentiable): exact one-hot winner
    # gather + fragment math on the per-tile channels, global coordinates
    valid = mask.astype(jnp.float32)
    origin_row = jnp.zeros((B, A, Fmax), jnp.float32)
    origin_row = origin_row.at[..., 0].set(bins.origin[..., 0])
    origin_row = origin_row.at[..., 1].set(bins.origin[..., 1])
    planes_t = jnp.stack(
        [
            ch["qx0"], ch["qy0"], ch["qx1"], ch["qy1"], ch["qx2"], ch["qy2"],
            ch["z0"], ch["z1"], ch["z2"],
            ch["invz0"], ch["invz1"], ch["invz2"],
            fidf, valid, origin_row, jnp.zeros_like(valid),
        ],
        axis=2,
    ).reshape(B * A, 16, Fmax)
    rows = _xla_reinterpolate(
        planes_t, lane_t.reshape(B * A, 1, tp), live.reshape(B * A, 1, tp),
        tile, inv_s, blur, settings.znear, settings.clip_bary, K=1,
        with_fid=True,
    ).reshape(B, A, 6, tp)

    livem = live > 0.0
    bands = jnp.stack(
        [
            jnp.where(livem, rows[:, :, 0], -1.0),
            jnp.where(livem, rows[:, :, 1], 0.0),
            jnp.where(livem, rows[:, :, 2], 0.0),
            jnp.where(livem, rows[:, :, 3], 0.0),
            jnp.where(livem, rows[:, :, 4], EMPTY_DIST),
            jnp.where(livem, rows[:, :, 5], -1.0),
            live,
            jax.lax.stop_gradient(lane_t),
        ],
        axis=2,
    )                                                   # (B, A, 8, tp)
    per_tile = bands[:, :, None]                        # (B, A, 1, 8, tp)
    return _bands_to_fragments(per_tile, bins, True, settings, extra_bin,
                               extra_layout)
