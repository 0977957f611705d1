"""Fused scatter+untile: compacted tile rows -> final image in ONE pass.

The XLA binned path's epilogue (binning.scatter_active_bg +
binning.untile_image) costs ~2.0 ms of the 12.5 ms 720p 12-view depth call
(op profile 2026-08-20): ONE f32 zbuf channel is dragged through ~6
materializations — the active-scatter one-hot dot (0.22 + 0.18 ms), the
(B, T, tp) -> (B, TH, TW, t, t) reshape relayout (0.23 + copy 0.18), the
moveaxis+live-select fusion (0.46), an XLA layout-assignment copy (0.50),
the final reshape (0.24) and the crop (0.07). That is ~270 MB of HBM
traffic for a 45 MB image.

This kernel assembles each (tile x W) image row-strip directly from the
compacted rows: grid (B, TH); the program loads its strip's TW tile rows
with dynamic-sublane loads (lane extents tp*C are 128-multiples), indexed
by a per-tile slot table, transposes (TW, t, t*C) -> (t, TW, t*C) in VMEM,
and stores the strip once. Empty tiles load a BACKGROUND row appended at
slot A — no masks, no indicator select. Traffic: read ~45 MB + write
~45 MB, one pass. The same trick the selection stage cannot use (its
reductions need the lane axis) works here because untiling is pure data
movement. (VERDICT r2 task #1: "consider fusing only the FORMATTING, not
the selection".)

Differentiable: custom_vjp whose backward is the exact XLA inverse
(tile_image + compact_rows — the cotangent of a gather is the one-hot
scatter those helpers already implement). Gradients only flow here in fit
loops (128^2-class images) where the epilogue is not the bottleneck; the
720p bench path is forward-only (grad DCE'd).

Off-TPU the kernel runs in interpret mode (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _untile_kernel(TW: int, TWpad: int, tile: int, lane_c: int, tileof_ref,
                   rows_ref, out_ref):
    """One (tile, TW*tile*C) image row-strip from TW dynamically-indexed
    tile rows. lane_c = tile*C (the per-pixel-row lane extent).

    The strip's slot table rides as one (B*TH, TWpad) f32 array: Mosaic
    rejects dynamic scalar (1x1) VMEM loads outright, so the kernel loads
    the strip's WHOLE slot row with a dynamic-SUBLANE load (full 128-
    multiple lane extent — the load pattern every kernel here uses) and
    extracts each slot at a STATIC lane position."""
    b = pl.program_id(0)
    th = pl.program_id(1)
    srow = tileof_ref[pl.ds(b * pl.num_programs(1) + th, 1), :]  # (1, TWpad)
    parts = []
    for j in range(TW):
        s = srow[0, j].astype(jnp.int32)
        parts.append(rows_ref[0, pl.ds(s, 1), :])   # (1, tp*C)
    x = jnp.concatenate(parts, axis=0)              # (TW, tp*C)
    x = x.reshape(TW, tile, lane_c)
    x = jnp.swapaxes(x, 0, 1)                       # (tile, TW, lane_c)
    out_ref[0] = x.reshape(tile, TW * lane_c)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def untile_scatter_pallas(rows, tileof, bg, image_size, tile, n_tiles_hw):
    """Compacted per-tile pixel rows -> full image, one fused pass.

    rows:    (B, A, tp, C) f32 — pixel-major, channel-minor per tile
             (A = T for the uncompacted grid).
    tileof:  (B, Tpad) f32 (small exact ints) — for each full-grid tile (row-major over
             (TH, TW); padded to a 128-multiple), its source row in
             [0, A], where slot A selects the appended background row.
             Build with `tile_slot_table`.
    bg:      static scalar or length-C tuple — background pixel value.
    Returns (B, H, W, C) f32, bit-identical on live tiles to
    scatter_active_bg + untile_image.
    """
    import math as _math

    B, A, tp, C = rows.shape
    H, W = image_size
    TH, TW = n_tiles_hw
    # channel padding: every value in the in-kernel (TW, tile, tile*C)
    # transpose must keep 128-multiple lane extents (a tile*C of 32
    # deterministically kills the Mosaic compile — probed 2026-08-20), so
    # C pads up to the smallest multiple of 128/gcd(128, tile). The padded
    # channels are zeros and are sliced off the output; for C=1 at tile 32
    # this writes 4x the image — still ~2x cheaper than the XLA epilogue's
    # ~6 materializations.
    creq = 128 // _math.gcd(128, tile)
    C_out = C
    Cp = -(-C // creq) * creq
    if Cp != C:
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
    bg_vals = tuple(bg) if isinstance(bg, (tuple, list)) else (bg,) * C
    bg_vals = bg_vals + (0.0,) * (Cp - C)
    bg_row = jnp.tile(
        jnp.asarray(bg_vals, jnp.float32).reshape(1, 1, 1, Cp), (B, 1, tp, 1)
    )
    rows_ext = jnp.concatenate([rows, bg_row], axis=1)  # (B, A+1, tp, Cp)
    C = Cp
    rows_flat = rows_ext.reshape(B, A + 1, tp * C)

    # (B, Tpad) -> (B*TH, TWpad): one 128-padded lane row per strip
    TWpad = TW + ((-TW) % 128)
    strip_rows = tileof[:, : TH * TW].reshape(B * TH, TW)
    strip_rows = jnp.pad(strip_rows, ((0, 0), (0, TWpad - TW)))
    out = pl.pallas_call(
        functools.partial(_untile_kernel, TW, TWpad, tile, tile * C),
        grid=(B, TH),
        in_specs=[
            pl.BlockSpec(strip_rows.shape, lambda b, th: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, A + 1, tp * C), lambda b, th: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile, TW * tile * C),
                               lambda b, th: (b, th, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, TH * tile, TW * tile * C),
                                       jnp.float32),
        interpret=_interpret(),
    )(strip_rows, rows_flat)
    img = out.reshape(B, TH * tile, TW * tile, C)
    return img[:, :H, :W, :C_out]


def _untile_fwd(rows, tileof, bg, image_size, tile, n_tiles_hw):
    out = untile_scatter_pallas(rows, tileof, bg, image_size, tile,
                                n_tiles_hw)
    return out, (tileof, rows.shape)


def _untile_bwd(bg, image_size, tile, n_tiles_hw, res, g):
    """Exact inverse of the strip gather: tile the cotangent image and
    compact the tile rows back to their source slots (one-hot contraction;
    the appended background row's cotangent is dropped)."""
    from .binning import compact_rows
    from .fragments import tile_image

    tileof, rows_shape = res
    B, A, tp, C = rows_shape
    gt = tile_image(g, tile, n_tiles_hw)            # (B, T, tp, C)
    T = gt.shape[1]
    d_rows = compact_rows(
        gt, tileof[:, :T].astype(jnp.int32), A
    )  # slot A (bg) out of the one-hot range: its cotangent is dropped
    return d_rows, None


untile_scatter_pallas.defvjp(_untile_fwd, _untile_bwd)


def tile_slot_table(rank, A: int, n_tiles_hw, batch: int = 1) -> jax.Array:
    """(B, Tpad) float32 slot table (small exact ints — the kernel's
    dynamic-sublane VMEM load needs f32 lanes) for untile_scatter_pallas from
    ActiveBins.rank ((B, T), >= A meaning 'no active slot'): clips empties
    to the background slot A and pads the lane axis to a 128-multiple.
    For the uncompacted grid pass `rank=None` (identity table; `batch`
    sizes the leading axis)."""
    TH, TW = n_tiles_hw
    T = TH * TW
    if rank is None:
        table = jnp.broadcast_to(
            jnp.arange(T, dtype=jnp.int32)[None], (batch, T)
        )
        A = T
    else:
        table = jnp.minimum(rank, A)
    pad = (-table.shape[1]) % 128
    if pad:
        table = jnp.pad(table, ((0, 0), (0, pad)), constant_values=A)
    return table.astype(jnp.float32)
