"""Batched point-cloud registration: Umeyama alignment + iterative closest
point, fully on-device.

Replaces pytorch3d.ops.iterative_closest_point (CUDA knn + Umeyama; reference
pytorch3d_icp_registeration.py:169 runs it batched over 300 clouds) with a
jittable lax.scan: each iteration is one dense NN query (MXU matmul, see
ops/knn_chamfer) plus a batched 3x3 SVD. No host round-trips; the whole
300-cloud registration is ONE compiled program.

Convention: column vectors, Xt = s * R @ x + t (OpenCV-style), unlike
pytorch3d's row-vector X @ R + T. `ICPSolution` mirrors pytorch3d's output
fields (converged, rmse, Xt, RTs, t_history).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .knn_chamfer import nn_points


class SimilarityTransform(NamedTuple):
    R: jax.Array  # (B, 3, 3)
    t: jax.Array  # (B, 3)
    s: jax.Array  # (B,)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ICPSolution:
    converged: jax.Array    # (B,) bool
    rmse: jax.Array         # (B,) final RMSE
    Xt: jax.Array           # (B, N, 3) transformed source
    RTs: SimilarityTransform
    t_history: jax.Array    # (iters, B, 3) translation per iteration
    rmse_history: jax.Array # (iters, B)


def umeyama(
    X: jax.Array,
    Y: jax.Array,
    weights: Optional[jax.Array] = None,
    estimate_scale: bool = False,
) -> SimilarityTransform:
    """Weighted least-squares rigid/similarity alignment of paired points.

    Solves min sum_i w_i |s R x_i + t - y_i|^2 (Umeyama 1991) with batched
    3x3 SVD. X, Y: (B, N, 3); weights: (B, N) or None.
    """
    B, N, _ = X.shape
    w = jnp.ones((B, N), X.dtype) if weights is None else weights
    sw = jnp.clip(jnp.sum(w, axis=-1, keepdims=True), 1e-12, None)  # (B, 1)
    wn = (w / sw)[..., None]  # (B, N, 1)

    mx = jnp.sum(X * wn, axis=1)  # (B, 3)
    my = jnp.sum(Y * wn, axis=1)
    Xc = X - mx[:, None]
    Yc = Y - my[:, None]

    # Weighted covariance: cov = sum_i w_i y_i x_i^T  -> (B, 3, 3)
    cov = jnp.einsum(
        "bnc,bnd->bcd", Yc * wn, Xc, precision=jax.lax.Precision.HIGHEST
    )
    U, S, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(jnp.einsum("bij,bjk->bik", U, Vt))
    D = jnp.stack(
        [jnp.ones_like(det), jnp.ones_like(det), jnp.sign(det)], axis=-1
    )  # (B, 3)
    R = jnp.einsum("bij,bj,bjk->bik", U, D, Vt)

    if estimate_scale:
        var_x = jnp.sum(jnp.sum(Xc * Xc, axis=-1) * wn[..., 0], axis=-1)
        s = jnp.sum(S * D, axis=-1) / jnp.clip(var_x, 1e-12, None)
    else:
        s = jnp.ones((B,), X.dtype)

    t = my - s[:, None] * jnp.einsum("bij,bj->bi", R, mx)
    return SimilarityTransform(R=R, t=t, s=s)


def iterative_closest_point(
    X: jax.Array,
    Y: jax.Array,
    x_mask: Optional[jax.Array] = None,
    y_mask: Optional[jax.Array] = None,
    init_transform: Optional[SimilarityTransform] = None,
    max_iterations: int = 100,
    relative_rmse_thr: float = 1e-6,
    estimate_scale: bool = False,
) -> ICPSolution:
    """Batched ICP aligning X onto Y (pytorch3d iterative_closest_point parity).

    Runs exactly max_iterations scan steps (static shape); `converged` reports
    whether the relative RMSE improvement dropped below relative_rmse_thr at
    any point (pytorch3d's stopping criterion, without the early exit that
    XLA's static control flow would forbid — the converged iterations are
    fixed-point no-ops).
    """
    B, N, _ = X.shape
    w = jnp.ones((B, N), X.dtype) if x_mask is None else x_mask

    if init_transform is None:
        RTs = SimilarityTransform(
            R=jnp.broadcast_to(jnp.eye(3, dtype=X.dtype), (B, 3, 3)),
            t=jnp.zeros((B, 3), X.dtype),
            s=jnp.ones((B,), X.dtype),
        )
    else:
        RTs = init_transform

    def apply(RTs: SimilarityTransform, pts: jax.Array) -> jax.Array:
        return RTs.s[:, None, None] * jnp.einsum(
            "bij,bnj->bni", RTs.R, pts
        ) + RTs.t[:, None]

    def step(carry, _):
        RTs, prev_rmse = carry
        Xt = apply(RTs, X)
        d2, idx = nn_points(Xt, Y, x_mask, y_mask)
        matched = jnp.take_along_axis(Y, idx[..., None], axis=1)  # (B, N, 3)
        new_RTs = umeyama(X, matched, weights=w, estimate_scale=estimate_scale)
        sw = jnp.clip(jnp.sum(w, axis=-1), 1.0, None)
        rmse = jnp.sqrt(jnp.sum(d2 * w, axis=-1) / sw)
        rel = jnp.abs(prev_rmse - rmse) / jnp.clip(prev_rmse, 1e-12, None)
        return (new_RTs, rmse), (new_RTs.t, rmse, rel < relative_rmse_thr)

    init = (RTs, jnp.full((B,), jnp.inf, X.dtype))
    (RTs, rmse), (t_hist, rmse_hist, conv_hist) = jax.lax.scan(
        step, init, None, length=max_iterations
    )
    Xt = apply(RTs, X)
    return ICPSolution(
        converged=jnp.any(conv_hist, axis=0),
        rmse=rmse,
        Xt=Xt,
        RTs=RTs,
        t_history=t_hist,
        rmse_history=rmse_hist,
    )
