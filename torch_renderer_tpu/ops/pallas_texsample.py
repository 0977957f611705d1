"""Fused Pallas bilinear texture sampling.

The XLA separable 2-hot formulation (textures._sample_matmul) is exact
and beats TPU gathers ~10x, but it materializes a (points, Wm*C) rows
slab to HBM between the row dot and the column contraction — ~100 MB
per joint-fit view at 128^2 / 256^2 maps, profiled at ~6 ms of a
14.5 ms step (dots + layout copies + multiply-reduce fusions).

This kernel fuses both contractions in VMEM. Layout: points on LANES
(pb per block), texture rows/columns on SUBLANES, the map resident in
VMEM as (Hm, C*Wm) channel-major lanes:

    oyT (Hm, pb) = (iota==y0)*(1-wy) + (iota==y0+1)*wy     # weighted 2-hot
    rows_c (Wm, pb) = maps[:, cWm:(c+1)Wm]^T-dot-oyT        # TN, sublanes
    out[c] (1, pb) = sum_sublanes(oxT * rows_c)

Backward (custom_vjp, nothing saved but the inputs):
    d_maps_c (Hm, Wm) = oyT NT-dot (oxT * g_c)              # contract lanes
    d_wy = sum_c g_c . sum_x oxT * (maps_c TN (h1y - h0y))
    d_wx = sum_c g_c . sum_x (h1x - h0x) * rows_c

TN / NT dot_general orientations are probe-verified on v5e
(scripts/probe_packed_ops.py); sublane reductions are cheap relative to
lane reductions (docs/ROUND2_NOTES.md). Everything per block stays
<= (Wm, pb) f32, so VMEM holds the map + a few 0.25 MB slabs.

Serves TexturesUV.sample (reference deform_mesh_with_color.py:269-306,
the texture-map optimization target). Off-TPU the kernel runs in
interpret mode (tests) but TexturesUV routes to the gather path there.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PB = 512  # points per block (lanes)
_HIGH = jax.lax.Precision.HIGHEST


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_up(n: int, m: int) -> int:
    return -(-n // m) * m


def supported(Hm: int, Wm: int, C: int, vmem_budget: int = 10 << 20) -> bool:
    """Whether the fused kernel applies: the BACKWARD's whole working set
    must fit VMEM — the map block and its gradient accumulator
    (Hmp, C*Wmp) f32, three (C*Wmp, pb) slabs (rows / difference-rows /
    scratch cotangent product), and four 2-hot slabs. A 256^2 RGB map is
    ~8 MB and compiles; 512^2 RGB pencils to ~19 MB and must fall back
    to the chunked matmul path."""
    Hmp, Wmp = _pad_up(Hm, 8), _pad_up(Wm, 128)
    Z = C * Wmp
    working_set = 4 * (
        2 * Hmp * Z            # map block + d_maps accumulator
        + 3 * Z * _PB          # rowsT, drowT, tmp scratch
        + 2 * (Hmp + Wmp) * _PB  # the 2-hot and difference 2-hot slabs
    )
    return C <= 8 and working_set <= vmem_budget


def _onehot_pair(idx, w, n, pb):
    """Weighted 2-hot (n, pb): row idx gets 1-w, row idx+1 gets w.
    idx arrives as f32 (exact small ints); Mosaic iota must be integer."""
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, pb), 0)
    ii = idx.astype(jnp.int32)
    return (
        jnp.where(iota == ii, 1.0 - w, 0.0)
        + jnp.where(iota == ii + 1, w, 0.0)
    )


def _fwd_kernel(C, Wmp, maps_ref, q_ref, out_ref):
    Hmp = maps_ref.shape[1]
    pb = q_ref.shape[-1]
    q = q_ref[0, 0]  # (4, pb): y0, x0, wy, wx
    oyT = _onehot_pair(q[0:1], q[2:3], Hmp, pb)  # (Hmp, pb)
    oxT = _onehot_pair(q[1:2], q[3:4], Wmp, pb)  # (Wmp, pb)
    # one TN dot over the full channel-major Z axis (fewer, larger dots
    # compile and run faster than a dot per channel)
    rowsT = jax.lax.dot_general(
        maps_ref[0], oyT, (((0,), (0,)), ((), ())), precision=_HIGH,
    )  # (C*Wmp, pb)
    for c in range(8):
        if c < C:
            seg = rowsT[c * Wmp:(c + 1) * Wmp]  # sublane slice
            out_ref[0, 0, c, :] = jnp.sum(oxT * seg, axis=0)
        else:
            out_ref[0, 0, c, :] = jnp.zeros((pb,), jnp.float32)


def _bwd_kernel(C, Wmp, maps_ref, q_ref, g_ref, dmaps_ref, dq_ref, tmp_ref):
    Hmp = maps_ref.shape[1]
    pb = q_ref.shape[-1]
    j = pl.program_id(1)
    q = q_ref[0, 0]
    y0, x0, wy, wx = q[0:1], q[1:2], q[2:3], q[3:4]
    oyT = _onehot_pair(y0, wy, Hmp, pb)
    oxT = _onehot_pair(x0, wx, Wmp, pb)
    y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
    ioty = jax.lax.broadcasted_iota(jnp.int32, (Hmp, pb), 0)
    droyT = jnp.where(ioty == y0i + 1, 1.0, 0.0) - jnp.where(
        ioty == y0i, 1.0, 0.0
    )
    iotx = jax.lax.broadcasted_iota(jnp.int32, (Wmp, pb), 0)
    droxT = jnp.where(iotx == x0i + 1, 1.0, 0.0) - jnp.where(
        iotx == x0i, 1.0, 0.0
    )
    g = g_ref[0, 0]  # (8, pb)

    # three full-Z dots total (per-channel dots compile ~3x slower and
    # leave the MXU underfed): recomputed rows, the wy-difference rows,
    # and the d_maps outer contraction against the scratch-assembled
    # (Z, pb) per-channel cotangent product.
    rowsT = jax.lax.dot_general(
        maps_ref[0], oyT, (((0,), (0,)), ((), ())), precision=_HIGH)
    drowT = jax.lax.dot_general(
        maps_ref[0], droyT, (((0,), (0,)), ((), ())), precision=_HIGH)
    dwy = jnp.zeros((1, pb), jnp.float32)
    dwx = jnp.zeros((1, pb), jnp.float32)
    for c in range(C):
        gc = g[c:c + 1]  # (1, pb)
        sl = slice(c * Wmp, (c + 1) * Wmp)
        dwy = dwy + jnp.sum(oxT * drowT[sl], axis=0, keepdims=True) * gc
        dwx = dwx + jnp.sum(droxT * rowsT[sl], axis=0, keepdims=True) * gc
        tmp_ref[sl] = oxT * gc
    dmaps = jax.lax.dot_general(
        oyT, tmp_ref[...], (((1,), (1,)), ((), ())), precision=_HIGH
    )  # (Hmp, Z), contract point lanes

    @pl.when(j == 0)
    def _zero():
        dmaps_ref[0] = jnp.zeros_like(dmaps_ref[0])

    dmaps_ref[0] += dmaps
    zero = jnp.zeros((1, pb), jnp.float32)
    dq_ref[0, 0, 0, :] = zero[0]
    dq_ref[0, 0, 1, :] = zero[0]
    dq_ref[0, 0, 2, :] = dwy[0]
    dq_ref[0, 0, 3, :] = dwx[0]


def _prep(maps, q):
    """Pad the channel-major map and the q bundle to kernel geometry."""
    B, Hm, Wm, C = maps.shape
    Hmp, Wmp = _pad_up(Hm, 8), _pad_up(Wm, 128)
    # (B, Hm, Wm, C) -> (B, Hm, C, Wm) -> channel-major lanes (B, Hmp, C*Wmp)
    mcm = jnp.swapaxes(maps, 2, 3)
    mcm = jnp.pad(mcm, ((0, 0), (0, Hmp - Hm), (0, 0), (0, Wmp - Wm)))
    mcm = mcm.reshape(B, Hmp, C * Wmp)
    P = q.shape[-1]
    Pp = _pad_up(max(P, 1), _PB)
    q = jnp.pad(q, ((0, 0), (0, 0), (0, Pp - P)))
    nblk = Pp // _PB
    q = q.reshape(B, 4, nblk, _PB).swapaxes(1, 2)  # (B, nblk, 4, PB)
    return mcm, q, nblk


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sample_core(maps, q, C):
    """maps (B, Hm, Wm, C) f32, q (B, 4, P) [y0, x0, wy, wx] ->
    (B, P, C) bilinear samples. y0/x0 pre-clipped to [0, Hm-2]/[0, Wm-2]."""
    return _sample_core_fwd(maps, q, C)[0]


def _sample_core_fwd(maps, q, C):
    B, Hm, Wm, _ = maps.shape
    Wmp = _pad_up(Wm, 128)
    P = q.shape[-1]
    mcm, qb, nblk = _prep(maps, q)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, C, Wmp),
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, mcm.shape[1], mcm.shape[2]),
                         lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, _PB), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, _PB), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, nblk, 8, _PB), jnp.float32),
        interpret=_interpret(),
    )(mcm, qb)
    out = out.swapaxes(2, 3).reshape(B, nblk * _PB, 8)[:, :P, :C]
    return out, (maps, q)


def _sample_core_bwd(C, res, g):
    maps, q = res
    B, Hm, Wm, _ = maps.shape
    Hmp, Wmp = _pad_up(Hm, 8), _pad_up(Wm, 128)
    P = q.shape[-1]
    mcm, qb, nblk = _prep(maps, q)
    gp = jnp.pad(g, ((0, 0), (0, nblk * _PB - P), (0, 8 - C)))
    gp = gp.reshape(B, nblk, _PB, 8).swapaxes(2, 3)  # (B, nblk, 8, PB)
    dmaps_cm, dqb = pl.pallas_call(
        functools.partial(_bwd_kernel, C, Wmp),
        grid=(B, nblk),
        in_specs=[
            pl.BlockSpec((1, Hmp, C * Wmp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, _PB), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, _PB), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hmp, C * Wmp), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 4, _PB), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, Hmp, C * Wmp), jnp.float32),
            jax.ShapeDtypeStruct((B, nblk, 4, _PB), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((C * Wmp, _PB), jnp.float32)],
        interpret=_interpret(),
    )(mcm, qb, gp)
    # channel-major (B, Hmp, C*Wmp) -> (B, Hm, Wm, C)
    dmaps = dmaps_cm.reshape(B, Hmp, C, Wmp)[:, :Hm, :, :Wm]
    dmaps = jnp.swapaxes(dmaps, 2, 3)
    dq = dqb.swapaxes(1, 2).reshape(B, 4, nblk * _PB)[..., :P]
    return dmaps, dq


_sample_core.defvjp(_sample_core_fwd, _sample_core_bwd)


def sample_bilinear_pallas(maps, y0, x0, wy, wx):
    """Bilinear sample maps (B, Hm, Wm, C) at integer corners y0/x0 with
    weights wy/wx, each (B, P) -> (B, P, C). Differentiable wrt maps and
    the weights (the corner indices carry no gradient)."""
    q = jnp.stack(
        [y0.astype(jnp.float32), x0.astype(jnp.float32), wy, wx], axis=1
    )  # (B, 4, P)
    return _sample_core(maps.astype(jnp.float32), q, maps.shape[-1])
