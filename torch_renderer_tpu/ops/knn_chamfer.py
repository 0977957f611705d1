"""Batched nearest-neighbor and chamfer distance — XLA/MXU-native.

Replaces the CUDA knn/chamfer kernels the reference consumes:
  * pytorch3d.loss.chamfer_distance (pytorch3d_icp_registeration.py:165,
    chamfer_loss_evaluation.py:126, deform_mesh_from_pcd.py:172,
    mesh_deformer.py:311)
  * kaolin.metrics.pointcloud.chamfer_distance (pytorch3d_icp_evaluation.py:199)

Design: for the cloud sizes these workloads use (500-2000 points), a dense
(B, N, M) squared-distance matrix built from one batched matmul
(|x|^2 + |y|^2 - 2<x,y>) followed by a masked min/top_k is the TPU-optimal
shape — the MXU does the O(N*M*3) work and there is no irregular memory
traffic. Ragged clouds are handled with +inf masking of padded rows/cols.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..structures.pointclouds import Pointclouds

_BIG = 1e30


def square_distance_matrix(
    x: jax.Array, y: jax.Array, precision=jax.lax.Precision.HIGHEST
) -> jax.Array:
    """Pairwise squared distances: x (B, N, 3), y (B, M, 3) -> (B, N, M).

    Clamped at 0 (the matmul expansion can go slightly negative in f32).
    """
    xx = jnp.sum(x * x, axis=-1)  # (B, N)
    yy = jnp.sum(y * y, axis=-1)  # (B, M)
    xy = jnp.einsum("bnc,bmc->bnm", x, y, precision=precision)
    return jnp.maximum(xx[..., :, None] + yy[..., None, :] - 2.0 * xy, 0.0)


def _mask_cols(d2: jax.Array, y_mask: Optional[jax.Array]) -> jax.Array:
    if y_mask is None:
        return d2
    return jnp.where(y_mask[:, None, :] > 0, d2, _BIG)


def nn_points(
    x: jax.Array, y: jax.Array,
    x_mask: Optional[jax.Array] = None, y_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Nearest neighbor in y for each x: returns (dists2 (B,N), idx (B,N)).

    Padded y points never match; padded x rows return 0 distance (masked by
    callers via x_mask).
    """
    d2 = _mask_cols(square_distance_matrix(x, y), y_mask)
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    dmin = jnp.min(d2, axis=-1)
    if x_mask is not None:
        dmin = dmin * x_mask
    return dmin, idx


def knn_points(
    x: jax.Array, y: jax.Array, k: int,
    x_mask: Optional[jax.Array] = None, y_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """K nearest neighbors in y per x point (pytorch3d knn_points parity).

    Returns (dists2 (B, N, K) ascending, idx (B, N, K)).
    """
    d2 = _mask_cols(square_distance_matrix(x, y), y_mask)
    neg, idx = jax.lax.top_k(-d2, k)
    d = -neg
    if x_mask is not None:
        d = d * x_mask[..., None]
    return d, idx.astype(jnp.int32)


def chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    x_mask: Optional[jax.Array] = None,
    y_mask: Optional[jax.Array] = None,
    batch_reduction: Optional[str] = "mean",
    point_reduction: str = "mean",
    single_directional: bool = False,
):
    """Symmetric chamfer distance with pytorch3d semantics.

    cham(x, y) = point_reduce_n min_m |x_n - y_m|^2 (+ same for y->x).
    Returns (loss, None) like pytorch3d (the second slot is the normals term,
    not used by any reference workload). batch_reduction None returns the
    per-cloud (B,) vector (chamfer_loss_evaluation.py:126 uses this).
    """
    dx, _ = nn_points(x, y, x_mask, y_mask)
    nx = jnp.sum(x_mask, axis=-1) if x_mask is not None else x.shape[1]
    nx = jnp.clip(nx, 1, None)
    if point_reduction == "mean":
        cham_x = jnp.sum(dx, axis=-1) / nx
    else:
        cham_x = jnp.sum(dx, axis=-1)

    if single_directional:
        cham = cham_x
    else:
        dy, _ = nn_points(y, x, y_mask, x_mask)
        ny = jnp.sum(y_mask, axis=-1) if y_mask is not None else y.shape[1]
        ny = jnp.clip(ny, 1, None)
        cham_y = jnp.sum(dy, axis=-1) / ny if point_reduction == "mean" else jnp.sum(dy, axis=-1)
        cham = cham_x + cham_y

    if batch_reduction == "mean":
        return jnp.mean(cham), None
    if batch_reduction == "sum":
        return jnp.sum(cham), None
    return cham, None


def chamfer_pointclouds(
    a: Pointclouds, b: Pointclouds, batch_reduction: Optional[str] = "mean"
):
    """Chamfer between Pointclouds structures (masks handled)."""
    return chamfer_distance(
        a.points, b.points, a.mask(), b.mask(), batch_reduction=batch_reduction
    )


def nn_points_chunked(
    x: jax.Array, y: jax.Array,
    x_mask: Optional[jax.Array] = None, y_mask: Optional[jax.Array] = None,
    chunk: int = 4096,
) -> Tuple[jax.Array, jax.Array]:
    """nn_points with the (B, N, M) distance matrix never materialized:
    scans x in chunks of `chunk` rows, carrying running (min d2, argmin).

    For the reference's cloud sizes (<=2k) the dense path is faster; this is
    the production path for scan-scale clouds (100k+ points) where O(N*M)
    memory would not fit. Peak memory O(B * chunk * M).
    """
    B, N, _ = x.shape
    n_chunks = -(-N // chunk)
    pad = n_chunks * chunk - N
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0))).reshape(B, n_chunks, chunk, 3)

    def body(_, xc):
        d2 = square_distance_matrix(xc, y)  # (B, chunk, M)
        d2 = _mask_cols(d2, y_mask)
        return None, (jnp.min(d2, axis=-1), jnp.argmin(d2, axis=-1).astype(jnp.int32))

    _, (dmin, idx) = jax.lax.scan(body, None, jnp.swapaxes(xp, 0, 1))
    dmin = jnp.swapaxes(dmin, 0, 1).reshape(B, n_chunks * chunk)[:, :N]
    idx = jnp.swapaxes(idx, 0, 1).reshape(B, n_chunks * chunk)[:, :N]
    if x_mask is not None:
        dmin = dmin * x_mask
    return dmin, idx


def chamfer_distance_chunked(
    x: jax.Array, y: jax.Array,
    x_mask: Optional[jax.Array] = None, y_mask: Optional[jax.Array] = None,
    batch_reduction: Optional[str] = "mean",
    chunk: int = 4096,
):
    """Memory-bounded symmetric chamfer for large clouds (same semantics as
    chamfer_distance with point_reduction='mean')."""
    dx, _ = nn_points_chunked(x, y, x_mask, y_mask, chunk)
    nx = jnp.clip(
        jnp.sum(x_mask, axis=-1) if x_mask is not None else x.shape[1], 1, None
    )
    dy, _ = nn_points_chunked(y, x, y_mask, x_mask, chunk)
    ny = jnp.clip(
        jnp.sum(y_mask, axis=-1) if y_mask is not None else y.shape[1], 1, None
    )
    cham = jnp.sum(dx, axis=-1) / nx + jnp.sum(dy, axis=-1) / ny
    if batch_reduction == "mean":
        return jnp.mean(cham), None
    if batch_reduction == "sum":
        return jnp.sum(cham), None
    return cham, None
