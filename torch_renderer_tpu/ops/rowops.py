"""Row gather / scatter-add as one-hot MXU contractions.

TPU arbitrary-index gathers of tiny-trailing-dim arrays (verts (V, 3),
face normals (F, 3)) run nearly scalar, and scatter-adds lower to a
serializing sort — the same trade rasterize/binning makes for per-face
channels. These helpers express both as one-hot matmuls whose autodiff is
the transposed matmul (no scatter in the backward). Exact: each output
row's dot has a single nonzero term, and the scatter sums the identical
terms the sort-based lowering sums.

Used by structures.Meshes (face_verts / vertex_normals) and
ops.mesh_losses; profiled on the joint shape+texture fit where the
gather/scatter fusions were ~2.2 ms of a 15 ms step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# One-hot threshold: past this many (N, V) compare cells the one-hot
# construction outweighs the scalar-gather cost it replaces.
ONEHOT_MAX_CELLS = 256_000_000


def use_onehot(n: int, v: int, method: str = "auto") -> bool:
    if method == "onehot":
        return True
    if method == "gather":
        return False
    return jax.default_backend() == "tpu" and n * v <= ONEHOT_MAX_CELLS


def take_rows(x: jax.Array, idx: jax.Array, method: str = "auto") -> jax.Array:
    """Row gather x (V, C)[idx (N,)] -> (N, C); one-hot matmul on TPU."""
    if not use_onehot(idx.shape[0], x.shape[0], method):
        return x[idx]
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, x.shape[0]), 1)
    onehot = (idx[:, None] == iota).astype(x.dtype)
    return jnp.einsum(
        "nv,vc->nc", onehot, x, precision=jax.lax.Precision.HIGHEST
    )


def add_rows(
    vals: jax.Array, idx: jax.Array, V: int, method: str = "auto"
) -> jax.Array:
    """Scatter-add vals (N, C) into rows idx of a zero (V, C) array;
    transposed one-hot matmul on TPU."""
    if not use_onehot(idx.shape[0], V, method):
        return jnp.zeros((V, vals.shape[-1]), vals.dtype).at[idx].add(vals)
    iota = jax.lax.broadcasted_iota(jnp.int32, (1, V), 1)
    onehot = (idx[:, None] == iota).astype(vals.dtype)
    return jnp.einsum(
        "nv,nc->vc", onehot, vals, precision=jax.lax.Precision.HIGHEST
    )
