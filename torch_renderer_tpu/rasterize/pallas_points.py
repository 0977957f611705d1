"""Fused Pallas TPU kernel for tile-binned top-K point selection.

The binned point rasterizer's XLA K-extraction loop (points.py per_chunk:
K iota-argmin passes, each materializing (c, tp, Pmax) reduction fusions in
HBM) measured 16.9 ms of the 27.8 ms forward at the 4x20k/256^2/K=8 bench
(scripts/profile_trace.py --workload points). This kernel is the mesh
path's cure (pallas_hard._topk_select_kernel) ported to point splats: keep
one tile's (tp, Pmax) priority slab in VMEM, run the K extraction passes
as register/VMEM math, and emit ONLY the winner lanes + live masks.
Everything differentiable (z, d2, features) is re-derived outside by the
same winner one-hot MXU einsum the XLA path already used (points.py) — so
selection parity with the XLA path is exact (same min + first-lane-of-min
tie-break), and gradients never touch the kernel.

Replaces the per-pixel loop of pytorch3d's CUDA RasterizePoints kernel
(consumed by the reference's point renderers, torch_renderer.py:163-230)
with a TPU-shaped two-phase design.

Layout rules honored (CLAUDE.md): lane axis padded to 128-multiples,
dynamic stores at 8-sublane granularity, one (tp, Pmax) slab live per
program, K extraction as a fori_loop (unrolled extraction crashes the
Mosaic compiler past K~4).

planes (N, 8, P) f32 slab per flattened tile (P a 128-multiple):
  row 0-3  x, y, z, r2      (screen center, camera z, squared NDC radius)
  row 4    valid mask       (slot < capped count; pad lanes 0)
  row 5    unused
  row 6    tile origin in lanes 0, 1
  row 7    point-chunk trip count in lane 0

offs (2, tp, 128): the tile's local pixel offsets (binning.tile_pixel_coords
values — THE SAME array the XLA epilogue adds to the origin), broadcast
across the 128 point-chunk lanes; using the epilogue's own offsets (rather
than re-deriving idx * (1/s) in-kernel) keeps the kernel's d2 <= r2
coverage decision bit-identical to the epilogue's recomputed d2, so
impl='pallas' vs impl='xla' selection can never flip on exact-boundary
splat pixels.

out (N, K*8, tp) bands: row k*8 = winner local lane (f32, -1 = no hit),
row k*8+1 = live; rows k*8+2..7 zero (dynamic sublane stores need 8-row
alignment, as pallas_hard).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = 3.0e38
_TN = 8    # tiles per program (sublane alignment)
_PC = 128  # point-chunk lanes


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _points_select_kernel(tile, znear, K, P,
                          planes_ref, offs_ref, out_ref, prio_ref):
    tp = tile * tile
    lane_iota = jax.lax.broadcasted_iota(jnp.int32, (tp, P), 1)
    xoff = offs_ref[0]                                       # (tp, 128)
    yoff = offs_ref[1]
    zero = jnp.zeros((tp,), jnp.float32)
    neg1 = -1.0 * jnp.ones((tp,), jnp.float32)
    empty_band = jnp.stack([neg1] + [zero] * 7, axis=0)      # (8, tp)

    def row_body(i):
        count = planes_ref[i, 7, 0].astype(jnp.int32)

        @pl.when(count == 0)
        def _empty():
            def k_body(k, _):
                out_ref[i, pl.ds(pl.multiple_of(k * 8, 8), 8), :] = empty_band
                return 0

            jax.lax.fori_loop(0, K, k_body, 0)

        @pl.when(count > 0)
        def _full():
            px = planes_ref[i, 6, 0] + xoff                  # (tp, 128)
            py = planes_ref[i, 6, 1] + yoff

            # phase 1: coverage priority slab, chunk by chunk
            prio_ref[...] = jnp.full((tp, P), _INF, jnp.float32)

            def chunk_body(c, _):
                sl = pl.ds(pl.multiple_of(c * _PC, _PC), _PC)
                x = planes_ref[i, 0, sl][None, :]            # (1, PC)
                y = planes_ref[i, 1, sl][None, :]
                z = planes_ref[i, 2, sl][None, :]
                r2 = planes_ref[i, 3, sl][None, :]
                valid = planes_ref[i, 4, sl][None, :]
                dx = px - x                                  # (tp, PC)
                dy = py - y
                cover = (dx * dx + dy * dy <= r2) & (valid > 0.0) \
                    & (z > znear)
                prio_ref[:, sl] = jnp.where(
                    cover, z * jnp.ones_like(dx), _INF
                )
                return 0

            jax.lax.fori_loop(0, count, chunk_body, 0)

            # phase 2: K nearest-z extraction passes (min + first lane
            # attaining it — jnp.argmin's tie-break, matching the XLA path)
            def k_body(k, prio):
                zmin = jnp.min(prio, axis=-1)                # (tp,)
                amin = jnp.min(
                    jnp.where(prio == zmin[:, None], lane_iota, P), axis=-1
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


SUPPORTED_TILES = (16, 32)


def points_select_pallas(planes: jax.Array, tile: int, local_offs: jax.Array,
                         znear: float, K: int):
    """planes (N, 8, P) -> (lane (N, K, tp) int32 local winner lane
    (-1 = empty), live (N, K, tp) bool). N must be a _TN multiple and P a
    128-multiple; tile must be in SUPPORTED_TILES (the out/offset blocks
    need tp = tile*tile to be a 128-lane multiple — Mosaic rejects
    non-128-granule lane extents, and interpret mode would hide the
    compile failure; points.py falls back to the XLA impl for other bin
    sizes under impl='auto'). local_offs: the (tp, 2) local pixel offsets
    from binning.tile_pixel_coords — passed through verbatim so coverage
    is bit-identical to the XLA epilogue (module docstring). Selection
    only — no gradients flow (consume the output in a winner one-hot
    einsum over differentiable candidate channels). Falls back to
    interpret mode off-TPU."""
    N, rows, P = planes.shape
    if rows != 8:
        raise ValueError(f"planes must have 8 rows, got {rows}")
    if N % _TN or P % _PC:
        raise ValueError(f"N ({N}) must be a multiple of {_TN} and P ({P}) "
                         f"of {_PC}")
    if tile not in SUPPORTED_TILES:
        raise ValueError(
            f"points_select_pallas supports tile in {SUPPORTED_TILES}, got "
            f"{tile} (tp must be a 128-lane multiple)"
        )
    tp = tile * tile
    if local_offs.shape != (tp, 2):
        raise ValueError(
            f"local_offs must be (tp, 2) = ({tp}, 2), got {local_offs.shape}"
        )
    offs = jnp.broadcast_to(
        jnp.moveaxis(local_offs, -1, 0)[:, :, None], (2, tp, _PC)
    ).astype(jnp.float32)
    out = pl.pallas_call(
        functools.partial(
            _points_select_kernel, tile, znear, K, P
        ),
        grid=(N // _TN,),
        in_specs=[
            pl.BlockSpec((_TN, 8, P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tp, _PC), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_TN, K * 8, tp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, K * 8, tp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tp, P), jnp.float32)],
        interpret=_interpret(),
    )(planes, offs)
    bands = out.reshape(N, K, 8, tp)
    lane = jnp.round(bands[:, :, 0, :]).astype(jnp.int32)    # -1 = empty
    live = bands[:, :, 1, :] > 0.5
    return lane, live
