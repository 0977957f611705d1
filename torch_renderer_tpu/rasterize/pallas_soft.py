"""Fused Pallas TPU kernel for tile-binned soft-silhouette coverage.

The north-star hot loop (256^2 soft-silhouette render+backward, BASELINE.md).
The XLA tile-binned path (rasterize/soft.py) materializes (tiles, pixels,
faces) intermediates in HBM between fusions; this kernel keeps one tile's
whole pixel-x-face working set in VMEM and writes only the (tile_pixels,)
coverage sums — forward AND a hand-derived backward (custom_vjp).

Gradient convention matches the autodiff of rasterize/soft.signed_dist2 and
SoftRas/pytorch3d: the inside/outside decision and the barycentric edge test
are treated as non-differentiable selections; gradients flow through the
squared point-to-edge distances only, to the face corner positions q. The
clamped foot-of-perpendicular parameter t needs no chain term: d(dd)/dt = 0
at the interior optimum (envelope theorem) and t is constant where clamped.

Per (pixel p, face f): signed d2 = +min_e dist2(p, edge_e) outside,
-min_e inside; S(p) = sum_f softplus(-d2 / sigma); alpha = 1 - exp(-S).

Data layout (TPU tiling wants (8, 128)-aligned blocks): per flattened tile,
faces live in 'planes' (N, 8, F) float32 slabs along the face/lane axis:
rows 0-5 = qx0, qy0, qx1, qy1, qx2, qy2; row 6 = valid mask; row 7 packs the
tile origin in lanes 0-1 and the face-chunk trip count in lane 2. Programs
process TN=8 tiles each so every block is (8, 8, F) / (8, TP). The per-tile
count bounds each tile's face loop dynamically, so empty / sparsely
occupied tiles skip their face chunks entirely (exact: skipped chunks hold
only valid=0 faces, whose contribution is identically 0 in both passes).
The count rides in the planes array rather than a separate SMEM operand:
whole-array SMEM overflows at 720p tile counts, and SMEM BlockSpecs must
be (8,128)-tiled.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .binning import count_overflow, untile_image
from .geometry import FaceRasterData, setup_faces
from .soft import SOFT_CUTOFF

_BIG = 1e9
_TN = 8  # tiles per program (sublane alignment)


def _edge_terms(px, py, qxa, qya, qxb, qyb):
    """Squared distance to segment (a, b) + helpers, broadcast (TP, F).

    Returns (dd, t, wx, wy, gx, gy). The division happens on the per-FACE
    (1, F) row (inv_len2), never per (pixel, face) pair: an f32 divide is a
    multi-op Newton sequence on the VPU and this runs 3x per pair in both
    kernels — hoisting it was worth ~15% of the whole north-star step."""
    gx = qxb - qxa
    gy = qyb - qya
    len2 = jnp.maximum(gx * gx + gy * gy, 1e-12)
    inv_len2 = 1.0 / len2                       # (1, F): per-face divide
    wx = px - qxa
    wy = py - qya
    wg = wx * gx + wy * gy
    t = jnp.clip(wg * inv_len2, 0.0, 1.0)
    dd = wx * wx + wy * wy - 2.0 * t * wg + t * t * len2
    return jnp.maximum(dd, 0.0), t, wx, wy, gx, gy


def _signed_d2(px, py, q, valid):
    """Signed squared distance (TP, F) + per-edge terms for backward.

    q: tuple of 6 (1, F) rows (qx0, qy0, qx1, qy1, qx2, qy2)."""
    qx0, qy0, qx1, qy1, qx2, qy2 = q
    e0 = _edge_terms(px, py, qx0, qy0, qx1, qy1)
    e1 = _edge_terms(px, py, qx1, qy1, qx2, qy2)
    e2 = _edge_terms(px, py, qx2, qy2, qx0, qy0)
    d2 = jnp.minimum(jnp.minimum(e0[0], e1[0]), e2[0])

    # inside test: every edge cross product agrees with the face orientation
    area2 = (qx1 - qx0) * (qy2 - qy0) - (qy1 - qy0) * (qx2 - qx0)
    c0 = e0[4] * e0[3] - e0[5] * e0[2]  # gx*wy - gy*wx per edge
    c1 = e1[4] * e1[3] - e1[5] * e1[2]
    c2 = e2[4] * e2[3] - e2[5] * e2[2]
    inside = (c0 * area2 >= 0.0) & (c1 * area2 >= 0.0) & (c2 * area2 >= 0.0)

    signed = jnp.where(inside, -d2, d2)
    signed = jnp.where(valid > 0.0, signed, _BIG)
    return signed, d2, inside, (e0, e1, e2)


def _pixel_offsets(tile: int, inv_s: float):
    """Within-tile pixel-center offsets (TP, 1); computed ONCE per program —
    the int div/mod expansions are expensive enough to dominate sparsely
    occupied tiles if recomputed per face chunk."""
    tp = tile * tile
    idx = jax.lax.broadcasted_iota(jnp.int32, (tp, 1), 0)
    xoff = (idx % tile).astype(jnp.float32) * inv_s
    yoff = (idx // tile).astype(jnp.float32) * inv_s
    return xoff, yoff


# Face axis is processed in chunks of _FC lanes: bounds the VMEM working
# set (a (tile^2, _FC) slab per intermediate) independently of
# faces_per_tile. _FC must stay a 128-multiple: Mosaic rejects dynamic-
# slice vector loads with narrower lane extents on real TPUs.
_FC = 128


def _row_inputs(planes_ref, i, f0, fc, xoff, yoff):
    sl = pl.ds(pl.multiple_of(f0, fc), fc)
    q = tuple(planes_ref[i, c, sl][None, :] for c in range(6))
    valid = planes_ref[i, 6, sl][None, :]
    px = planes_ref[i, 7, 0] + xoff
    py = planes_ref[i, 7, 1] + yoff
    return q, valid, px, py


# Rows (tiles) are unrolled for small static chunk counts; the face-chunk
# loop is a DYNAMIC fori_loop bounded by the tile's real candidate count
# (scalar-read from the planes array), so empty / sparse tiles skip their face
# chunks entirely. The Pallas TPU grid executes sequentially per core, so
# every skipped chunk is pure wall-clock saving, and it is exact: skipped
# chunks hold only valid=0 faces whose contribution is identically 0
# (softplus(-_BIG/sigma) underflows; backward masks on valid). Large static
# counts also fall back to a fori over rows so Mosaic reuses one iteration's
# VMEM stack instead of keeping TN * n_fc live copies (scoped-vmem OOM at
# big faces_per_tile).
_ROW_UNROLL_LIMIT = 3


def _fwd_kernel(tile, inv_s, inv_sigma, fc, n_fc, planes_ref,
                out_ref):
    tp = tile * tile
    xoff, yoff = _pixel_offsets(tile, inv_s)

    def row_body(i):
        def face_chunk(c, S):
            q, valid, px, py = _row_inputs(planes_ref, i, c * fc, fc,
                                           xoff, yoff)
            signed, _, _, _ = _signed_d2(px, py, q, valid)
            return S + jnp.sum(jax.nn.softplus(-signed * inv_sigma), axis=-1)

        S = jax.lax.fori_loop(
            0, planes_ref[i, 7, 2].astype(jnp.int32), face_chunk,
            jnp.zeros((tp,), jnp.float32)
        )
        out_ref[i, :] = S

    if n_fc <= _ROW_UNROLL_LIMIT:
        for i in range(_TN):
            row_body(i)
    else:
        def row(i, _):
            row_body(i)
            return 0

        jax.lax.fori_loop(0, _TN, row, 0)


def _bwd_kernel(tile, inv_s, inv_sigma, fc, n_fc, planes_ref,
                g_ref, dq_ref):
    xoff, yoff = _pixel_offsets(tile, inv_s)

    def row_body(i):
        def face_chunk(c, _2):
            _bwd_row_chunk(inv_sigma, fc, xoff, yoff, planes_ref, g_ref,
                           dq_ref, i, c * fc)
            return 0

        def zero_chunk(c, _2):
            sl = pl.ds(pl.multiple_of(c * fc, fc), fc)
            z = jnp.zeros((fc,), jnp.float32)
            for r in range(8):
                dq_ref[i, r, sl] = z
            return 0

        nc = planes_ref[i, 7, 2].astype(jnp.int32)
        jax.lax.fori_loop(0, nc, face_chunk, 0)
        # skipped chunks still need their output slots zero-filled
        jax.lax.fori_loop(nc, n_fc, zero_chunk, 0)

    if n_fc <= _ROW_UNROLL_LIMIT:
        for i in range(_TN):
            row_body(i)
    else:
        def row(i, _):
            row_body(i)
            return 0

        jax.lax.fori_loop(0, _TN, row, 0)


def _moment_dq(inv_sigma, xoff, yoff, q, valid, signed, d2, inside, edges,
               gcot, ox, oy):
    """Shared moment-form backward core: 6 per-face gradient rows.

    gcot broadcasts against (TP, F) — (TP, 1) for the per-tile kernels
    (one cotangent row per tile), (TP, F) for the packed kernel (each
    face selects its own tile's cotangent).

    MEASURED NEGATIVE RESULT (kept as a note, code removed): running the
    7 pixel-axis moment reductions per edge as (3, TP) @ (TP, F)
    dot_generals on the MXU was NOT faster — 0.90 ms VPU sums vs 1.15 ms
    at f32 HIGHEST and 0.92 ms at DEFAULT precision (north-star packed
    backward, same-session A/B): M=3 leaves the MXU 2% utilized and the
    dots serialize against the VPU work instead of hiding behind it.

    dL/d(d2): softplus'(u) = sigmoid(u), u = -signed/sigma,
    d(signed)/d(d2) = -1 inside else +1. The factor 2 of d(dd)/dq is
    folded in once for the whole chunk."""
    sgn = jnp.where(inside, -1.0, 1.0)
    alpha = gcot * jax.nn.sigmoid(-signed * inv_sigma) * (
        -2.0 * inv_sigma) * sgn
    alpha = jnp.where(valid > 0.0, alpha, 0.0)

    # split min ties evenly (jnp.minimum's subgradient convention);
    # norm is only ever 1, 2 or 3 — a two-select reciprocal beats three
    # per-pair f32 divides
    m0 = (edges[0][0] <= d2).astype(jnp.float32)
    m1 = (edges[1][0] <= d2).astype(jnp.float32)
    m2 = (edges[2][0] <= d2).astype(jnp.float32)
    norm = m0 + m1 + m2
    inv_norm = jnp.where(
        norm <= 1.0, 1.0, jnp.where(norm <= 2.0, 0.5, 1.0 / 3.0)
    )
    an = alpha * inv_norm  # shared across the three edges

    def edge_grads(e, m, qxa, qya):
        # Moment-form gradient: dd = |r|^2 with r = w - t*g, so
        # d(dd)/da = -2(1-t) r and d(dd)/db = -2t r (t fixed by the
        # envelope theorem, as in the product form this replaces).
        # With u = 2*beta, s = u*t, r2 = s*t and wx = xoff - (qxa-ox):
        #   dqa_x = (Ssx - Sux) + (qxa-ox)(Su - Ss) + gx (Ss - Sr2)
        #   dqb_x = (qxa-ox) Ss - Ssx + gx Sr2
        # i.e. 7 pixel-axis reductions of 1-product integrands instead
        # of 12 reductions of 3-op integrands — ~40% fewer VPU ops per
        # (pixel, face) pair in this kernel's dominant block. Moments
        # are taken against the WITHIN-TILE offsets (xoff, not px) so
        # the nearly-cancelling pairs share the tile's small coordinate
        # scale instead of the global NDC scale.
        _, t, _, _, gx, gy = e
        u = an * m          # == 2*beta of the product form
        s = u * t
        r2 = s * t
        Su = jnp.sum(u, axis=0)
        Ss = jnp.sum(s, axis=0)
        Sr2 = jnp.sum(r2, axis=0)
        Sux = jnp.sum(u * xoff, axis=0)
        Suy = jnp.sum(u * yoff, axis=0)
        Ssx = jnp.sum(s * xoff, axis=0)
        Ssy = jnp.sum(s * yoff, axis=0)
        ax = qxa[0] - ox    # (F,) per-face epilogue, amortized over TP
        ay = qya[0] - oy
        dsu = Su - Ss
        dab = Ss - Sr2
        dqa_x = (Ssx - Sux) + ax * dsu + gx[0] * dab
        dqa_y = (Ssy - Suy) + ay * dsu + gy[0] * dab
        dqb_x = ax * Ss - Ssx + gx[0] * Sr2
        dqb_y = ay * Ss - Ssy + gy[0] * Sr2
        return dqa_x, dqa_y, dqb_x, dqb_y

    qx0, qy0, qx1, qy1, qx2, qy2 = q
    a0x, a0y, b0x, b0y = edge_grads(edges[0], m0, qx0, qy0)  # (q0, q1)
    a1x, a1y, b1x, b1y = edge_grads(edges[1], m1, qx1, qy1)  # (q1, q2)
    a2x, a2y, b2x, b2y = edge_grads(edges[2], m2, qx2, qy2)  # (q2, q0)
    return (a0x + b2x, a0y + b2y,    # q0
            b0x + a1x, b0y + a1y,    # q1
            b1x + a2x, b1y + a2y)    # q2


def _bwd_row_chunk(inv_sigma, fc, xoff, yoff, planes_ref, g_ref, dq_ref, i,
                   f0):
        q, valid, px, py = _row_inputs(planes_ref, i, f0, fc, xoff, yoff)
        ox = planes_ref[i, 7, 0]
        oy = planes_ref[i, 7, 1]
        signed, d2, inside, edges = _signed_d2(px, py, q, valid)

        g = g_ref[i, :][:, None]  # (TP, 1)
        rows = _moment_dq(inv_sigma, xoff, yoff, q, valid, signed, d2,
                          inside, edges, g, ox, oy)

        sl = pl.ds(pl.multiple_of(f0, fc), fc)
        for r in range(6):
            dq_ref[i, r, sl] = rows[r]
        dq_ref[i, 6, sl] = jnp.zeros_like(rows[0])
        dq_ref[i, 7, sl] = jnp.zeros_like(rows[0])


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Sublane-transposed kernels: faces on SUBLANES (granularity 8), pixels on
# LANES. The lane-layout kernels above pay ceil(count/128)*128 face lanes per
# tile — a tile with 27 candidates (the north-star mean) still burns a full
# 128-lane chunk, 4.7x its useful work. Transposing puts the dynamic face
# loop on the sublane axis where the hardware granule is 8, so a tile pays
# ceil(count/8)*8. Probe-verified Mosaic ops only: dynamic sublane-slice
# loads/stores, static single-lane column slices + lane broadcast, sublane
# and lane reductions.
#
# MEASURED NEGATIVE RESULT (north-star 256^2 scene, v5e): grad 9.1 ms vs
# 5.9 ms for the lane layout; isolated kernels fwd 2.8 vs 2.3, fwd+bwd 6.0
# vs 3.4. The mean non-empty tile holds ~61 candidates, so the granularity
# win is only ~2x, and the per-group overheads (lane-column extract +
# broadcast x6, lane reductions x12 in backward, fori bookkeeping) cost
# more than the saved math when a group is two (8, 128) vregs. The winning
# occupancy lever is tile COMPACTION instead (62.5% of tiles are empty and
# still paid DMA + gather one-hot work) — see active_tiles in
# soft_silhouette_pallas_fd.
#
# Layout: planes_t (N, S, 128) f32 — slot s's face in row s, lanes 0-5 =
# qx0, qy0, qx1, qy1, qx2, qy2, lane 6 = valid (exactly the slot-filled
# mask: a free ones-channel through the rank gather), lanes 7+ zero.
# meta (N, 128) f32 — lane 0/1 = tile origin x/y, lane 2 = group count
# ceil(min(count, S)/8). Output S_sum (N, tile^2) as before.
# ---------------------------------------------------------------------------

_GF = 8  # faces per group = sublane granule


def _group_inputs(planes_ref, i, g, xoff, yoff, ox, oy):
    blk = planes_ref[i, pl.ds(g * _GF, _GF), :]   # (8, 128)
    q = tuple(blk[:, c:c + 1] for c in range(6))  # 6x (8, 1)
    valid = blk[:, 6:7]                           # (8, 1)
    px = ox + xoff                                # (1, TP)
    py = oy + yoff
    return q, valid, px, py


def _pixel_offsets_t(tile: int, inv_s: float):
    """Within-tile pixel-center offsets as (1, TP) lane vectors."""
    tp = tile * tile
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    xoff = (idx % tile).astype(jnp.float32) * inv_s
    yoff = (idx // tile).astype(jnp.float32) * inv_s
    return xoff, yoff


def _fwd_kernel_t(tile, inv_s, inv_sigma, planes_ref, meta_ref, out_ref):
    tp = tile * tile
    xoff, yoff = _pixel_offsets_t(tile, inv_s)

    for i in range(_TN):
        ox = meta_ref[i, 0]
        oy = meta_ref[i, 1]
        ng = meta_ref[i, 2].astype(jnp.int32)

        def group(g, acc):
            q, valid, px, py = _group_inputs(planes_ref, i, g, xoff, yoff,
                                             ox, oy)
            signed, _, _, _ = _signed_d2(px, py, q, valid)   # (8, TP)
            return acc + jax.nn.softplus(-signed * inv_sigma)

        acc = jax.lax.fori_loop(0, ng, group, jnp.zeros((_GF, tp),
                                                        jnp.float32))
        out_ref[i, :] = jnp.sum(acc, axis=0)


def _bwd_kernel_t(tile, inv_s, inv_sigma, n_groups, planes_ref, meta_ref,
                  g_ref, dq_ref):
    xoff, yoff = _pixel_offsets_t(tile, inv_s)
    lane = jax.lax.broadcasted_iota(jnp.int32, (_GF, 128), 1)
    lane_oh = [
        (lane == c).astype(jnp.float32) for c in range(6)
    ]  # assemble dq rows as sum(col * lane-onehot): only probe-safe ops

    for i in range(_TN):
        ox = meta_ref[i, 0]
        oy = meta_ref[i, 1]
        ng = meta_ref[i, 2].astype(jnp.int32)
        gcot = g_ref[i, :][None, :]  # (1, TP)

        def group(g, _):
            q, valid, px, py = _group_inputs(planes_ref, i, g, xoff, yoff,
                                             ox, oy)
            signed, d2, inside, edges = _signed_d2(px, py, q, valid)

            sgn = jnp.where(inside, -1.0, 1.0)
            alpha = gcot * jax.nn.sigmoid(-signed * inv_sigma) * (
                -inv_sigma) * sgn
            alpha = jnp.where(valid > 0.0, alpha, 0.0)     # (8, TP)

            m0 = (edges[0][0] <= d2).astype(jnp.float32)
            m1 = (edges[1][0] <= d2).astype(jnp.float32)
            m2 = (edges[2][0] <= d2).astype(jnp.float32)
            norm = m0 + m1 + m2
            inv_norm = jnp.where(
                norm <= 1.0, 1.0, jnp.where(norm <= 2.0, 0.5, 1.0 / 3.0)
            )

            def edge_grads(e, m):
                _, t, wx, wy, gx, gy = e
                beta = alpha * (m * inv_norm)
                ca = 2.0 * beta * (t - 1.0)
                cg = 2.0 * beta * t * (1.0 - t)
                cb_w = -2.0 * beta * t
                cb_g = 2.0 * beta * t * t
                # reductions over the PIXEL (lane) axis -> (8, 1) per face
                dqa_x = jnp.sum(ca * wx + cg * gx, axis=1, keepdims=True)
                dqa_y = jnp.sum(ca * wy + cg * gy, axis=1, keepdims=True)
                dqb_x = jnp.sum(cb_w * wx + cb_g * gx, axis=1, keepdims=True)
                dqb_y = jnp.sum(cb_w * wy + cb_g * gy, axis=1, keepdims=True)
                return dqa_x, dqa_y, dqb_x, dqb_y

            a0x, a0y, b0x, b0y = edge_grads(edges[0], m0)  # edge (q0, q1)
            a1x, a1y, b1x, b1y = edge_grads(edges[1], m1)  # edge (q1, q2)
            a2x, a2y, b2x, b2y = edge_grads(edges[2], m2)  # edge (q2, q0)

            cols = (a0x + b2x, a0y + b2y, b0x + a1x, b0y + a1y,
                    b1x + a2x, b1y + a2y)
            blk = lane_oh[0] * cols[0]
            for c in range(1, 6):
                blk = blk + lane_oh[c] * cols[c]
            dq_ref[i, pl.ds(g * _GF, _GF), :] = blk
            return 0

        def zero_group(g, _):
            dq_ref[i, pl.ds(g * _GF, _GF), :] = jnp.zeros((_GF, 128),
                                                          jnp.float32)
            return 0

        jax.lax.fori_loop(0, ng, group, 0)
        jax.lax.fori_loop(ng, n_groups, zero_group, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _tile_coverage_t(planes_t, meta, tile, inv_s, sigma):
    """planes_t (N, S, 128) + meta (N, 128) -> S (N, tile^2), sublane
    layout (see block comment above)."""
    return _tile_coverage_t_fwd(planes_t, meta, tile, inv_s, sigma)[0]


def _tile_coverage_t_fwd(planes_t, meta, tile, inv_s, sigma):
    N, S, _ = planes_t.shape
    tp = tile * tile
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_t, tile, inv_s, 1.0 / sigma),
        grid=(N // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, tp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, tp), jnp.float32),
        interpret=_interpret(),
    )(planes_t, meta)
    return out, (planes_t, meta)


def _tile_coverage_t_bwd(tile, inv_s, sigma, res, g):
    planes_t, meta = res
    N, S, _ = planes_t.shape
    tp = tile * tile
    dplanes = pl.pallas_call(
        functools.partial(_bwd_kernel_t, tile, inv_s, 1.0 / sigma, S // _GF),
        grid=(N // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, S, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, S, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, S, 128), jnp.float32),
        interpret=_interpret(),
    )(planes_t, meta, g)
    return dplanes, jnp.zeros_like(meta)


_tile_coverage_t.defvjp(_tile_coverage_t_fwd, _tile_coverage_t_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _tile_coverage(planes, tile, inv_s, sigma):
    """planes (N, 8, F) [6 q rows, valid, packed origin] -> S (N, tile^2)."""
    return _tile_coverage_fwd(planes, tile, inv_s, sigma)[0]


def _face_chunk_width(F: int) -> int:
    """Chunk lane width for a padded face axis of F lanes. Always _FC:
    Mosaic rejects dynamic-slice vector loads whose lane extent is not a
    128-multiple (measured: vector<1x1x80xf32> loads fail TPU compile even
    though they pass in interpret mode), so narrower slabs are not an
    option — the face axis is padded to _FC multiples instead."""
    del F
    return _FC


def _tile_coverage_fwd(planes, tile, inv_s, sigma):
    N, _, F = planes.shape
    tp = tile * tile
    fc = _face_chunk_width(F)
    S = pl.pallas_call(
        functools.partial(_fwd_kernel, tile, inv_s, 1.0 / sigma, fc,
                          -(-F // fc)),
        grid=(N // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 8, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, tp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, tp), jnp.float32),
        interpret=_interpret(),
    )(planes)
    return S, (planes,)


def _tile_coverage_bwd(tile, inv_s, sigma, res, g):
    (planes,) = res
    N, _, F = planes.shape
    tp = tile * tile
    fc = _face_chunk_width(F)
    dplanes = pl.pallas_call(
        functools.partial(_bwd_kernel, tile, inv_s, 1.0 / sigma, fc,
                          -(-F // fc)),
        grid=(N // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 8, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, tp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, 8, F), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8, F), jnp.float32),
        interpret=_interpret(),
    )(planes, g)
    return (dplanes,)


_tile_coverage.defvjp(_tile_coverage_fwd, _tile_coverage_bwd)


# ---------------------------------------------------------------------------
# Group-packed kernels: the candidates of all 8 tiles a program owns share
# ONE lane axis. The per-tile layout pays ceil(count/128)*128 lanes per tile
# (north-star mean occupancy ~61/128 -> ~2x padding waste); packing the
# group's candidates contiguously pays ceil(group_total/128)*128 per GROUP
# (768 -> 432 chunk evaluations on the north-star scene). Two ingredients:
#
#   * translation invariance: the coverage math only uses px - qx
#     differences, so each face's corners are pre-translated into its own
#     tile's pixel frame (binning.pack_groups packs the translated
#     channels) and the kernel rasterizes every face against the SAME
#     within-tile pixel offsets (px = xoff, no origins).
#   * MXU segmentation: per-tile coverage sums come from a tiny one-hot
#     contraction. Row 6 carries ev = (tile_slot + 1) * valid (0 = padding);
#     oh = (ev == 1..8) is (8, FC) and S_rows = oh @ contrib^T — an NT
#     dot_general contracting the lane axes of both operands, f32
#     precision=HIGHEST (probe-verified on v5e: abs err ~1.5e-5; see
#     scripts/probe_packed_ops.py). The backward selects each face's
#     cotangent row the same way: g_sel = g_rows^T @ oh (TN dot_general).
#
# Layout: planes (N_g, 8, S) f32 — rows 0-5 tile-frame corner channels
# qx0..qy2, row 6 ev, row 7 meta (lane 0 = face-chunk trip count). Output
# (8 * N_g, tp): program i writes its 8 tiles' coverage rows — identical
# downstream interface to the per-tile kernel.
# ---------------------------------------------------------------------------


def _packed_oh(ev):
    """(1, FC) ev row -> (8, FC) f32 one-hot of the owning tile slot."""
    j = jax.lax.broadcasted_iota(jnp.int32, (_TN, 1), 0).astype(jnp.float32)
    return (ev == j + 1.0).astype(jnp.float32)


def _fwd_kernel_packed(tile, inv_s, inv_sigma, fc, planes_ref, out_ref):
    tp = tile * tile
    xoff, yoff = _pixel_offsets(tile, inv_s)

    def face_chunk(c, acc):
        sl = pl.ds(pl.multiple_of(c * fc, fc), fc)
        blk = planes_ref[0, :, sl]                           # (8, fc)
        q = tuple(blk[r][None, :] for r in range(6))
        ev = blk[6][None, :]
        valid = (ev > 0.0).astype(jnp.float32)
        signed, _, _, _ = _signed_d2(xoff, yoff, q, valid)
        contrib = jax.nn.softplus(-signed * inv_sigma)       # (TP, FC)
        oh = _packed_oh(ev)                                  # (8, FC)
        return acc + jax.lax.dot_general(
            oh, contrib, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    nc = planes_ref[0, 7, 0].astype(jnp.int32)
    acc = jax.lax.fori_loop(0, nc, face_chunk,
                            jnp.zeros((_TN, tp), jnp.float32))
    out_ref[...] = acc


def _bwd_kernel_packed(tile, inv_s, inv_sigma, fc, n_fc, planes_ref, g_ref,
                       dq_ref):
    xoff, yoff = _pixel_offsets(tile, inv_s)
    g_rows = g_ref[...]                                      # (8, TP)
    # Zero the whole output block once (one vectorized store): the face
    # chunks overwrite their slices and the slack beyond the trip count
    # stays zero — replaces a per-chunk zero loop plus per-chunk zero
    # stores of the ev/meta rows. Perf-neutral on the north-star (0.59 ->
    # 0.57 ms, within tunnel noise) but one loop and 3 stores simpler;
    # the kernel is VPU-bound on _signed_d2 + moments, not on stores.
    dq_ref[...] = jnp.zeros((1, 8, n_fc * fc), jnp.float32)

    def face_chunk(c, _):
        sl = pl.ds(pl.multiple_of(c * fc, fc), fc)
        blk = planes_ref[0, :, sl]                           # (8, fc)
        q = tuple(blk[r][None, :] for r in range(6))
        ev = blk[6][None, :]
        valid = (ev > 0.0).astype(jnp.float32)
        signed, d2, inside, edges = _signed_d2(xoff, yoff, q, valid)

        oh = _packed_oh(ev)                                  # (8, FC)
        g_sel = jax.lax.dot_general(                         # (TP, FC)
            g_rows, oh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        rows = _moment_dq(inv_sigma, xoff, yoff, q, valid, signed, d2,
                          inside, edges, g_sel, 0.0, 0.0)
        z = jnp.zeros_like(rows[0])
        dq_ref[0, :, sl] = jnp.stack(rows + (z, z))          # one (8, fc) store
        return 0

    nc = planes_ref[0, 7, 0].astype(jnp.int32)
    jax.lax.fori_loop(0, nc, face_chunk, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _tile_coverage_packed(planes, tile, inv_s, sigma):
    """Group-packed planes (N_g, 8, S) -> coverage sums (8 * N_g, tile^2)
    (see layout block comment above)."""
    return _tile_coverage_packed_fwd(planes, tile, inv_s, sigma)[0]


def _tile_coverage_packed_fwd(planes, tile, inv_s, sigma):
    Ng, _, S = planes.shape
    tp = tile * tile
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_packed, tile, inv_s, 1.0 / sigma, _FC),
        grid=(Ng,),
        in_specs=[
            pl.BlockSpec((1, 8, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, tp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ng * _TN, tp), jnp.float32),
        interpret=_interpret(),
    )(planes)
    return out, (planes,)


def _tile_coverage_packed_bwd(tile, inv_s, sigma, res, g):
    (planes,) = res
    Ng, _, S = planes.shape
    tp = tile * tile
    dplanes = pl.pallas_call(
        functools.partial(_bwd_kernel_packed, tile, inv_s, 1.0 / sigma, _FC,
                          S // _FC),
        grid=(Ng,),
        in_specs=[
            pl.BlockSpec((1, 8, S), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TN, tp), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 8, S), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Ng, 8, S), jnp.float32),
        interpret=_interpret(),
    )(planes, g)
    return (dplanes,)


_tile_coverage_packed.defvjp(_tile_coverage_packed_fwd,
                             _tile_coverage_packed_bwd)


def suggest_faces_per_tile(
    fd: FaceRasterData, image_size, tile: int = 16, sigma: float = 1e-4,
    margin: float = 1.3, multiple: int = 128,
) -> int:
    """Smallest safe (no-overflow) faces_per_tile for this scene, rounded up
    to a lane multiple (128: the kernels' chunk width — Mosaic requires
    128-multiple lane extents on dynamic-slice loads). Call OUTSIDE jit
    with concrete data (e.g. once at fit setup); the result is a static
    kernel parameter."""
    pad = math.sqrt(SOFT_CUTOFF * sigma)
    max_count, _ = count_overflow(fd, image_size, tile, 0, pad)
    want = int(math.ceil(float(max_count) * margin / multiple)) * multiple
    return max(multiple, min(want, fd.num_faces))


def soft_silhouette_pallas_fd(
    fd: FaceRasterData,
    image_size,
    sigma: float = 1e-4,
    tile: int = 16,
    faces_per_tile: int = 128,
    return_sum: bool = False,
    layout: str = "lane",
    active_tiles: int | None = None,
    group_lanes: int | None = None,
    hi_tiles: int | None = None,
    lo_lanes: int = 32,
    check_budgets: str | None = None,
) -> jax.Array:
    """Tile-binned soft coverage (B, H, W) through the fused Pallas kernel.

    fd: FaceRasterData (setup_faces) or geometry.FacePlanes
    (setup_face_planes — skips the tiny-trailing-dim corner tensors whose
    TPU tile padding costs ~40x; preferred when only this path consumes
    the projection).

    Exact (same sum as the streaming oracle) provided no bin overflows —
    size faces_per_tile with suggest_faces_per_tile().

    active_tiles: if set, the tile axis is COMPACTED to the non-empty tiles
    before the gather + kernel (binning.bin_ranks_active) and the coverage
    sums are scattered back afterwards — the measured win on the north-star
    scene, where 62.5% of tiles are empty but still paid gather one-hot
    work, planes DMA and grid steps. Size it with suggest_active_tiles()
    (tiles beyond the budget are dropped, like overflowing face bins).

    layout: "lane" (default) — faces on the lane axis, chunk granularity
    128. "packed" — group-packed kernels: the candidates of the 8 tiles a
    program owns share one lane axis (faces pre-translated into their tile
    frame; per-tile segmentation via a tiny one-hot MXU contraction), so a
    group pays ceil(group_total/128) chunks instead of 8 * ceil(count/128)
    — the measured occupancy lever (768 -> 432 chunk evaluations on the
    north-star scene). Requires active_tiles; size group_lanes with
    suggest_group_lanes() (default 8 * faces_per_tile is always safe — the
    kernel-math win is independent of group_lanes, which only trims the
    pack contraction + DMA). "sublane" runs the transposed kernels (faces
    on sublanes, granularity 8) — measured SLOWER at the north-star scale
    (grad 9.1 vs 5.9 ms): the per-group fixed costs (6 lane-column
    extracts + broadcasts, 12 lane reductions per 8-face group in the
    backward) outweigh the 2x occupancy win when each group is only two
    (8, 128) vregs of math. Kept (exact, tested) for documentation and for
    shapes where wide pixel rows might amortize the overheads."""
    from .binning import (
        bin_faces_active,
        bin_faces_ranked,
        gather_rank_planes,
        scatter_active,
    )

    B = fd.valid.shape[0]
    pad = math.sqrt(SOFT_CUTOFF * sigma)
    if layout == "sublane":
        return _soft_silhouette_pallas_t(
            fd, image_size, sigma, tile, faces_per_tile, return_sum, pad
        )
    if layout == "packed":
        if active_tiles is None:
            raise ValueError(
                "layout='packed' requires active_tiles (the pack groups "
                "follow active-compaction order); size it with "
                "suggest_active_tiles()"
            )
        return _soft_silhouette_pallas_packed(
            fd, image_size, sigma, tile, faces_per_tile, active_tiles,
            group_lanes, return_sum, pad,
            hi_tiles=hi_tiles, lo_lanes=lo_lanes,
            check_budgets=check_budgets,
        )
    # rank-binning: candidate slots come from a prefix count of the overlap
    # mask (no top_k sort) and the slot one-hot feeds the gather contraction
    # directly — see binning.bin_ranks. Replaced the bin_faces top_k path,
    # which was ~1.5 ms of the 7 ms north-star step.
    from .binning import check_budget

    if active_tiles is not None:
        bins = bin_faces_active(fd, image_size, tile, pad, active_tiles)
        T_run = bins.slot.shape[1]                          # = A
        origins = bins.origin                               # (B, A, 2)
        check_budget(
            "active_tiles", jnp.max(bins.n_active), active_tiles,
            check_budgets, hint="size with suggest_active_tiles",
        )
    else:
        bins = bin_faces_ranked(fd, image_size, tile, pad)
        T_run = bins.slot.shape[1]                          # = T
        origins = jnp.broadcast_to(bins.tile_origin[None], (B, T_run, 2))
    TH, TW = bins.n_tiles_hw
    T = TH * TW
    Fmax = min(faces_per_tile, fd.num_faces)
    check_budget(
        "faces_per_tile", jnp.max(bins.count), Fmax, check_budgets,
        hint="size with suggest_faces_per_tile",
    )

    # per-tile corner channels via the one-hot MXU gather (TPU arbitrary-
    # index gathers run nearly scalar; see binning.gather_rank_planes)
    ch, mask = gather_rank_planes(
        fd, bins, Fmax,
        channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
    )  # coverage needs only the corner coords — half the gather einsum
    valid = mask.astype(jnp.float32)                        # (B, T_run, Fmax)

    # the per-tile face-chunk trip count rides in row 7 lane 2 next to
    # the tile origin: a separate SMEM input would need a whole-array
    # (overflows SMEM at 720p tile counts) or (8,128)-tiled block, and the
    # kernels already do scalar VMEM reads for the origins. Valid slots
    # are contiguous at the front of the lane axis (slot = overlap rank),
    # so ceil(count/fc) chunks cover every valid face.
    fc = _face_chunk_width(Fmax + ((-Fmax) % _FC))
    n_chunks = -(-jnp.minimum(bins.count, Fmax) // fc)      # (B, T_run) int
    origin_row = jnp.zeros((B, T_run, Fmax), jnp.float32)
    origin_row = origin_row.at[..., 0].set(origins[..., 0])
    origin_row = origin_row.at[..., 1].set(origins[..., 1])
    origin_row = origin_row.at[..., 2].set(n_chunks.astype(jnp.float32))

    planes = jnp.stack(
        [
            ch["qx0"], ch["qy0"], ch["qx1"], ch["qy1"], ch["qx2"], ch["qy2"],
            valid, origin_row,
        ],
        axis=2,
    ).reshape(B * T_run, 8, Fmax)
    # pad the face/lane axis to full _FC chunks (padding faces carry
    # valid=0; jnp.pad's VJP slices the gradient back)
    f_pad = (-Fmax) % _FC
    if f_pad:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, f_pad)))

    N = B * T_run
    n_pad = (-N) % _TN
    if n_pad:
        planes = jnp.pad(planes, ((0, n_pad), (0, 0), (0, 0)))

    H, W = image_size
    inv_s = 1.0 / (min(H, W) / 2.0)
    S = _tile_coverage(planes, tile, inv_s, sigma)[:N]  # (B*T_run, tp)
    per_tile = S.reshape(B, T_run, tile * tile)
    if active_tiles is not None:
        # back to the full grid; empty tiles get exactly 0 coverage sum
        per_tile = scatter_active(per_tile, bins)           # (B, T, tp)
    if not return_sum:
        per_tile = 1.0 - jnp.exp(-per_tile)
    return untile_image(per_tile, image_size, tile, bins.n_tiles_hw)


def suggest_active_tiles(
    fd: FaceRasterData, image_size, tile: int = 16, sigma: float = 1e-4,
    margin: float = 1.3, multiple: int = 8,
) -> int:
    """Smallest safe active-tile budget for this scene (max non-empty tile
    count over the batch, with headroom). Call OUTSIDE jit with concrete
    data; pass the result as soft_silhouette_pallas_fd(active_tiles=...).
    Returns the full tile count when compaction would not help. Soft-path
    flavor of binning.suggest_active_tiles_fd (pad from sigma)."""
    from .binning import suggest_active_tiles_fd

    pad = math.sqrt(SOFT_CUTOFF * sigma)
    return suggest_active_tiles_fd(fd, image_size, tile, pad,
                                   margin=margin, multiple=multiple)


def suggest_layout(faces_per_tile: int) -> str:
    """Pick the kernel layout from the scene's bin budget (the output of
    suggest_faces_per_tile). Measured rule (same-session TPU A/Bs): the
    group-packed layout's win is the per-tile 128-lane quantization waste,
    so it pays when bins are THIN and the pack contraction is small —
    1.42x at fpt=128 (north-star), +5% at fpt=256, -8% at fpt=512 (the
    pack one-hot grows with group_lanes ~ 8*fpt while the quantization
    waste stays <= 127 lanes/tile)."""
    return "packed" if faces_per_tile <= 128 else "lane"


def suggest_group_lanes(
    fd: FaceRasterData, image_size, tile: int = 16, sigma: float = 1e-4,
    active_tiles: int = 128, faces_per_tile: int = 128,
    margin: float = 1.3, order: str = "tile",
) -> int:
    """Smallest safe packed-lane budget per 8-tile group for this scene
    (soft-path flavor of binning.suggest_group_lanes_fd: pad from sigma).
    Call OUTSIDE jit with concrete data; pass as
    soft_silhouette_pallas_fd(layout="packed", group_lanes=...). Pass
    order="count" when also using hi_tiles (the occupancy split sorts
    tiles by candidate count, which changes the group sums)."""
    from .binning import suggest_group_lanes_fd

    pad = math.sqrt(SOFT_CUTOFF * sigma)
    return suggest_group_lanes_fd(fd, image_size, tile, pad, active_tiles,
                                  faces_per_tile, margin=margin, order=order)


class SoftKernelConfig(NamedTuple):
    """Static sizing bundle for soft_silhouette_pallas_fd.

    Produced by suggest_soft_config(); splat into the call with
    ``soft_silhouette_pallas_fd(fd, image_size, sigma=sigma,
    **cfg.kwargs())``. All fields are static kernel parameters — compute
    them once per scene/fit setup, outside jit."""

    tile: int
    faces_per_tile: int
    active_tiles: int | None
    layout: str
    group_lanes: int | None
    hi_tiles: int | None = None
    lo_lanes: int = 32

    def kwargs(self) -> dict:
        return {
            "tile": self.tile,
            "faces_per_tile": self.faces_per_tile,
            "active_tiles": self.active_tiles,
            "layout": self.layout,
            "group_lanes": self.group_lanes,
            "hi_tiles": self.hi_tiles,
            "lo_lanes": self.lo_lanes,
        }


def suggest_soft_config(
    fds, image_size, tile: int = 16, sigma: float = 1e-4,
    margin: float = 1.3, layout: str = "auto", split: bool = False,
) -> SoftKernelConfig:
    """One-call scene sizing for the fused soft-silhouette kernel.

    Bundles the individual suggest_* helpers (faces_per_tile,
    active_tiles, layout, group_lanes, occupancy split) that every
    caller previously chained by hand (bench.py, the pose apps, the
    profilers).

    fds: a single FaceRasterData / FacePlanes, or an iterable of them —
    pass projections at several poses (e.g. a fit's start AND target)
    and every budget takes the max across them. Footprints that move
    during a fit need margin: candidates/tiles beyond a static budget
    are dropped like bin overflow (the pose apps use margin=2.0).

    layout: "auto" picks via suggest_layout (group-packed for thin bins);
    or force "lane" / "packed". split=True additionally sizes the
    packed layout's occupancy split (suggest_occupancy_split) — only
    worthwhile for static scenes with a skewed tile-occupancy histogram;
    leave off for fits (the split drops overflow candidates count-sorted,
    which interacts badly with moving footprints).

    Call OUTSIDE jit with concrete data; the result is a static bundle.
    """
    if hasattr(fds, "valid"):
        fds = (fds,)
    fds = tuple(fds)
    if not fds:
        raise ValueError("suggest_soft_config needs at least one projection")

    fpt = max(
        suggest_faces_per_tile(fd, image_size, tile, sigma, margin=margin)
        for fd in fds
    )
    act = max(
        suggest_active_tiles(fd, image_size, tile, sigma, margin=margin)
        for fd in fds
    )
    if layout == "auto":
        layout = suggest_layout(fpt)
    if layout == "lane":
        return SoftKernelConfig(tile, fpt, act, "lane", None)

    hi = None
    lo = 32
    if split:
        his = [
            suggest_occupancy_split(fd, image_size, tile, sigma,
                                    active_tiles=act, lo_lanes=lo,
                                    margin=margin)
            for fd in fds
        ]
        hi = None if any(h is None for h in his) else max(his)
    gl = max(
        suggest_group_lanes(fd, image_size, tile, sigma, active_tiles=act,
                            faces_per_tile=fpt, margin=margin,
                            order="count" if hi else "tile")
        for fd in fds
    )
    return SoftKernelConfig(tile, fpt, act, "packed", gl, hi, lo)


def suggest_occupancy_split(
    fd: FaceRasterData, image_size, tile: int = 16, sigma: float = 1e-4,
    active_tiles: int = 128, lo_lanes: int = 32,
    margin: float = 1.3,
) -> int | None:
    """Static hi-tile budget for the packed layout's occupancy split
    (soft_silhouette_pallas_fd(hi_tiles=..., lo_lanes=...)): the number of
    count-sorted tile slots that need more than lo_lanes gather lanes, with
    headroom, 8-aligned. Returns None when the split would not help (most
    tiles exceed lo_lanes, or nothing does). Call OUTSIDE jit with concrete
    data; like all bin budgets, footprints that move during a fit need
    margin (candidates beyond a tile's lane budget are dropped)."""
    from .binning import bin_faces_active

    pad = math.sqrt(SOFT_CUTOFF * sigma)
    bins = bin_faces_active(fd, image_size, tile, pad, active_tiles,
                            order="count")
    n_hi = int(jnp.max(jnp.sum(bins.count > lo_lanes, axis=1)))
    A = bins.slot.shape[1]
    want = int(math.ceil(n_hi * margin / _TN)) * _TN
    if want <= 0 or want >= A:
        return None
    return want


def _soft_silhouette_pallas_packed(
    fd: FaceRasterData, image_size, sigma, tile, faces_per_tile,
    active_tiles, group_lanes, return_sum, pad,
    hi_tiles=None, lo_lanes: int = 32, check_budgets: str | None = None,
) -> jax.Array:
    """Group-packed assembly: active-compact, gather per-tile corner
    channels (the usual one-hot MXU gather), translate each tile's
    candidates into its own pixel frame, pack the 8 tiles of every kernel
    program into one shared lane axis (binning.pack_groups), run the
    packed kernels, scatter coverage back to the full tile grid.

    hi_tiles (occupancy split): with the mean tile occupancy far below
    faces_per_tile (north-star: ~27/128), the (A, Fmax) gather wastes
    most of its one-hot dot on empty lanes. With hi_tiles set, tiles are
    compacted in DESCENDING candidate-count order and only the first
    hi_tiles get Fmax gather lanes; the rest get lo_lanes. Size with
    suggest_occupancy_split(); tiles past hi_tiles with count > lo_lanes
    lose the excess candidates (overflow semantics, like faces_per_tile).
    """
    from .binning import bin_faces_active, gather_rank_planes, pack_groups, \
        scatter_active

    B = fd.valid.shape[0]
    Fmax = min(faces_per_tile, fd.num_faces)
    split = hi_tiles is not None and 0 < hi_tiles
    bins = bin_faces_active(fd, image_size, tile, pad, active_tiles,
                            order="count" if split else "tile")
    A = bins.slot.shape[1]
    from .binning import check_budget

    check_budget(
        "active_tiles", jnp.max(bins.n_active), active_tiles,
        check_budgets, hint="size with suggest_active_tiles",
    )
    check_budget(
        "faces_per_tile", jnp.max(bins.count), Fmax, check_budgets,
        hint="size with suggest_faces_per_tile",
    )
    if split and (hi_tiles % _TN or hi_tiles >= A):
        raise ValueError(
            f"hi_tiles must be a multiple of {_TN} and < active tiles "
            f"({A}); got {hi_tiles}")
    if split:  # after validation: hi_tiles < A, so the tail is non-empty
        check_budget(
            "occupancy_split lo_lanes", jnp.max(bins.count[:, hi_tiles:]),
            min(lo_lanes, Fmax), check_budgets,
            hint="size with suggest_occupancy_split",
        )

    def gather_slabs(b, per_tile):
        ch, _ = gather_rank_planes(
            fd, b, per_tile,
            channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
        )
        ox = b.origin[..., 0:1]                         # (B, A_part, 1)
        oy = b.origin[..., 1:2]
        return jnp.stack(
            [ch["qx0"] - ox, ch["qy0"] - oy, ch["qx1"] - ox, ch["qy1"] - oy,
             ch["qx2"] - ox, ch["qy2"] - oy],
            axis=-1,
        )                                               # (B, A_part, K, 6)

    def part_bins(lo, hi):
        return bins._replace(slot=bins.slot[:, lo:hi],
                             count=bins.count[:, lo:hi],
                             origin=bins.origin[:, lo:hi])

    if split:
        K_lo = min(lo_lanes, Fmax)
        parts = [(part_bins(0, hi_tiles), Fmax),
                 (part_bins(hi_tiles, A), K_lo)]
    else:
        parts = [(bins, Fmax)]

    a_pad = (-A) % _TN
    A8 = A + a_pad
    G = A8 // _TN

    S_g = 8 * Fmax if group_lanes is None else group_lanes
    S_g += (-S_g) % _FC

    packed_parts, n_valid_parts, capped_parts = [], [], []
    for i, (pb, K) in enumerate(parts):
        slabs = gather_slabs(pb, K)
        capped = jnp.minimum(pb.count, K)               # (B, A_part)
        if i == len(parts) - 1 and a_pad:
            slabs = jnp.pad(slabs, ((0, 0), (0, a_pad), (0, 0), (0, 0)))
            capped = jnp.pad(capped, ((0, 0), (0, a_pad)))
        pk, nv = pack_groups(slabs, capped, S_g)        # (B*G_p, S_g, 6)
        G_p = capped.shape[1] // _TN
        packed_parts.append(pk.reshape(B, G_p, S_g, 6))
        n_valid_parts.append(nv)
        capped_parts.append(capped)

    packed = jnp.concatenate(packed_parts, axis=1).reshape(B * G, S_g, 6)
    n_valid = jnp.concatenate(n_valid_parts, axis=1)    # (B, G)
    capped = jnp.concatenate(capped_parts, axis=1)      # (B, A8)
    n_chunks = -(-n_valid // _FC)                       # (B, G)

    # ev row (tile slot + 1 per packed lane, 0 = padding) built from the
    # pack offsets directly instead of riding the pack contraction
    # (binning.packed_ev_row): saves 1/7 of the pack dot + its transpose,
    # and ev never carried gradient anyway.
    from .binning import packed_ev_row

    cg = jnp.minimum(capped, Fmax).reshape(B, G, _TN)
    check_budget(
        "group_lanes", jnp.max(jnp.sum(cg, axis=-1)), S_g, check_budgets,
        hint="size with suggest_group_lanes",
    )
    ev = packed_ev_row(cg, n_valid, S_g).reshape(B * G, 1, S_g)

    meta = jnp.zeros((B * G, 1, S_g), jnp.float32)
    meta = meta.at[:, 0, 0].set(
        n_chunks.reshape(-1).astype(jnp.float32))
    planes = jnp.concatenate(
        [jnp.swapaxes(packed, 1, 2), ev, meta], axis=1)  # (B*G, 8, S_g)

    H, W = image_size
    inv_s = 1.0 / (min(H, W) / 2.0)
    S = _tile_coverage_packed(planes, tile, inv_s, sigma)  # (8*B*G, tp)
    per_tile = S.reshape(B, A8, tile * tile)[:, :A]
    per_tile = scatter_active(per_tile, bins)           # (B, T, tp)
    if not return_sum:
        per_tile = 1.0 - jnp.exp(-per_tile)
    return untile_image(per_tile, image_size, tile, bins.n_tiles_hw)


def _soft_silhouette_pallas_t(
    fd: FaceRasterData, image_size, sigma, tile, faces_per_tile,
    return_sum, pad,
) -> jax.Array:
    """Sublane-layout assembly: rank-bin, gather corner channels + a free
    ones-channel (the slot-filled mask) into (N, S, 128) planes, build the
    (N, 128) per-tile meta array, run the transposed kernels."""
    from .binning import bin_faces_ranked, gather_rank_channels

    B = fd.valid.shape[0]
    bins = bin_faces_ranked(fd, image_size, tile, pad)
    TH, TW = bins.n_tiles_hw
    T = TH * TW
    S = min(faces_per_tile, fd.num_faces)
    S += (-S) % _GF  # sublane granule

    from .binning import _channel_sources

    src = _channel_sources(fd)
    ones = jnp.ones_like(src["qx0"])
    planes7 = jnp.stack(
        [
            src["qx0"], src["qy0"], src["qx1"], src["qy1"],
            src["qx2"], src["qy2"],
            ones,  # lane 6: gathers to 1 exactly where the slot is filled
        ],
        axis=-1,
    )  # (B, F, 7)
    gathered = gather_rank_channels(planes7, bins, S)     # (B, T, S, 7)
    planes_t = jnp.pad(gathered, ((0, 0), (0, 0), (0, 0), (0, 128 - 7)))
    planes_t = planes_t.reshape(B * T, S, 128)

    capped = jnp.minimum(bins.count, S)                   # (B, T)
    ng = -(-capped // _GF)
    meta = jnp.zeros((B, T, 128), jnp.float32)
    meta = meta.at[..., 0].set(
        jnp.broadcast_to(bins.tile_origin[None, :, 0], (B, T)))
    meta = meta.at[..., 1].set(
        jnp.broadcast_to(bins.tile_origin[None, :, 1], (B, T)))
    meta = meta.at[..., 2].set(ng.astype(jnp.float32))
    meta = meta.reshape(B * T, 128)

    N = B * T
    n_pad = (-N) % _TN
    if n_pad:
        planes_t = jnp.pad(planes_t, ((0, n_pad), (0, 0), (0, 0)))
        meta = jnp.pad(meta, ((0, n_pad), (0, 0)))

    H, W = image_size
    inv_s = 1.0 / (min(H, W) / 2.0)
    out = _tile_coverage_t(planes_t, meta, tile, inv_s, sigma)[:N]
    per_tile = out.reshape(B, T, tile * tile)
    if not return_sum:
        per_tile = 1.0 - jnp.exp(-per_tile)
    return untile_image(per_tile, image_size, tile, bins.n_tiles_hw)


def soft_silhouette_pallas(
    meshes, camera, sigma: float = 1e-4, tile: int = 16,
    faces_per_tile: int = 128, active_tiles: int | None = None,
    layout: str = "lane", group_lanes: int | None = None,
    hi_tiles: int | None = None, lo_lanes: int = 32,
) -> jax.Array:
    """Public entry: meshes + camera -> soft silhouette via the Pallas path."""
    from .geometry import setup_face_planes

    fp = setup_face_planes(meshes, camera)
    return soft_silhouette_pallas_fd(
        fp, camera.image_size, sigma=sigma, tile=tile,
        faces_per_tile=faces_per_tile, active_tiles=active_tiles,
        layout=layout, group_lanes=group_lanes,
        hi_tiles=hi_tiles, lo_lanes=lo_lanes,
    )
