"""Fused Pallas TPU kernel for the tile-bin one-hot gather.

EXPERIMENT, NOT DISPATCHED (recorded negative result): built to replace
gather_bin_channels' XLA one-hot einsum, whose (tiles, slots, faces)
one-hot stages ~0.5 GB through HBM per north-star step. This kernel keeps
the one-hot in VMEM (per-program (TG*Fmax, F) stacked compare + one MXU
dot; backward is the transposed dot accumulated across a batch element's
sequential tile programs) — but it measured SLOWER than the XLA path at
the north-star scale (3.3 vs 2.0 ms forward; full grad step 10.3 vs
7.6 ms): the binding cost is the one-hot CONSTRUCTION (VPU compares, ~335M
per step), which both paths pay, and Mosaic's f32 matmul pipeline loses to
XLA's fused HIGHEST-precision einsum. Kept with tests because the balance
may flip for wider channel counts (C >> 12) or larger Fmax, where the
einsum's HBM staging grows but the compare count per gathered value
shrinks.

Reference surface: the CUDA gather feeding pytorch3d's fine rasterization
stage, SURVEY.md §2c.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TG = 8       # tiles per program
_FCH = 2048   # face-table lanes per one-hot chunk (bounds VMEM)


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _fwd_kernel(n_fch, fch, idx_ref, table_ref, out_ref):
    """idx (1, TG, Fmax) int32 (-1 = empty slot); table (1, F, C);
    out (1, TG, Fmax, C).

    All TG tiles' slots are stacked into ONE (TG*Fmax, fch) one-hot per
    face chunk so the MXU sees one large dot per program — per-tile
    (Fmax, F) dots measured 1.7x SLOWER than the XLA one-hot einsum."""
    Fmax = idx_ref.shape[2]
    C = table_ref.shape[2]
    S = _TG * Fmax

    idx3 = idx_ref[0][..., None]                     # (TG, Fmax, 1)
    acc = jnp.zeros((S, C), jnp.float32)

    def fchunk(c, acc):
        f0 = pl.multiple_of(c * fch, fch)
        # 3-D one-hot, then collapse the LEADING dims only: (TG, Fmax)
        # sublanes merge to S sublanes without touching the lane dim —
        # a (TG, Fmax) -> (S, 1) reshape would move lanes into sublanes,
        # which Mosaic rejects.
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (_TG, Fmax, fch), 2
        ) + f0
        onehot = (idx3 == iota).astype(jnp.float32).reshape(S, fch)
        chunk = table_ref[0, pl.ds(f0, fch), :]      # (fch, C)
        return acc + jnp.dot(
            onehot, chunk, preferred_element_type=jnp.float32
        )

    acc = jax.lax.fori_loop(0, n_fch, fchunk, acc)
    out_ref[0] = acc.reshape(_TG, Fmax, C)


def _bwd_kernel(n_fch, fch, idx_ref, dout_ref, dtable_ref):
    """Transpose scatter: dtable (1, F, C) += onehot^T @ dout, stacked
    over the program's TG tiles, accumulated across one batch element's
    sequential tile programs."""
    Fmax = idx_ref.shape[2]
    C = dout_ref.shape[3]
    S = _TG * Fmax

    @pl.when(pl.program_id(1) == 0)
    def _zero():
        dtable_ref[...] = jnp.zeros_like(dtable_ref)

    idx3 = idx_ref[0][..., None]                     # (TG, Fmax, 1)
    dout = dout_ref[0].reshape(S, C)                 # leading-dim merge

    def fchunk(c, _):
        f0 = pl.multiple_of(c * fch, fch)
        iota = jax.lax.broadcasted_iota(
            jnp.int32, (_TG, Fmax, fch), 2
        ) + f0
        onehot = (idx3 == iota).astype(jnp.float32).reshape(S, fch)
        sl = pl.ds(f0, fch)
        dtable_ref[0, sl, :] += jnp.dot(
            onehot.T, dout, preferred_element_type=jnp.float32
        )
        return 0

    jax.lax.fori_loop(0, n_fch, fchunk, 0)


@jax.custom_vjp
def gather_tiles(idx: jax.Array, table: jax.Array) -> jax.Array:
    """(B, T, Fmax) int32 slot ids (-1 empty) x (B, F, C) f32 channel
    table -> (B, T, Fmax, C) gathered channels (empty slots zero).
    Differentiable w.r.t. table (the transpose is the scatter back)."""
    return _gather_fwd(idx, table)[0]


def _pad_axes(idx, table):
    B, T, Fmax = idx.shape
    F = table.shape[1]
    t_pad = (-T) % _TG
    if t_pad:
        idx = jnp.pad(idx, ((0, 0), (0, t_pad), (0, 0)),
                      constant_values=-1)
    fch = min(_FCH, F + ((-F) % 128))
    f_pad = (-F) % fch
    if f_pad:
        table = jnp.pad(table, ((0, 0), (0, f_pad), (0, 0)))
    return idx, table, T, F, fch


def _gather_fwd(idx, table):
    B, T, Fmax = idx.shape
    C = table.shape[2]
    idx_p, table_p, T0, F0, fch = _pad_axes(idx, table)
    Tp = idx_p.shape[1]
    Fp = table_p.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, Fp // fch, fch),
        grid=(B, Tp // _TG),
        in_specs=[
            pl.BlockSpec((1, _TG, Fmax), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Fp, C), lambda b, j: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _TG, Fmax, C), lambda b, j: (b, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Tp, Fmax, C), jnp.float32),
        interpret=_interpret(),
    )(idx_p, table_p)
    return out[:, :T0], (idx, table.shape)


def _gather_bwd(res, g):
    idx, table_shape = res
    B, F, C = table_shape
    idx_p, _, T0, F0, fch = _pad_axes(idx, jnp.zeros(table_shape))
    Tp = idx_p.shape[1]
    Fmax = idx.shape[2]
    Fp = F0 + ((-F0) % fch)
    g_p = jnp.pad(g, ((0, 0), (0, Tp - T0), (0, 0), (0, 0)))
    dtable = pl.pallas_call(
        functools.partial(_bwd_kernel, Fp // fch, fch),
        grid=(B, Tp // _TG),
        in_specs=[
            pl.BlockSpec((1, _TG, Fmax), lambda b, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TG, Fmax, C), lambda b, j: (b, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Fp, C), lambda b, j: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Fp, C), jnp.float32),
        interpret=_interpret(),
    )(idx_p, g_p)[:, :F0]
    zero_idx = jnp.zeros(idx.shape, jax.dtypes.float0)
    return zero_idx, dtable


gather_tiles.defvjp(_gather_fwd, _gather_bwd)
