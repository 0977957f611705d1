"""Point-splat compositing — alpha, norm-weighted and Pulsar-style blending.

Pure-jax equivalents of pytorch3d.renderer.compositor (AlphaCompositor /
NormWeightedCompositor, consumed by the reference's point renderers at
torch_renderer.py:163-207) plus a softmax depth-blending variant standing in
for the Pulsar sphere renderer (torch_renderer.py:209-230; see PAPERS.md on
Pulsar). All operate on PointFragments + per-splat features over the small
static K axis — XLA fuses them into the gather epilogue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..rasterize.points import PointFragments
from ..structures.pointclouds import Pointclouds


def gather_point_features(
    pcls: Pointclouds, fragments: PointFragments, default: float = 1.0
) -> jax.Array:
    """Per-splat features (B, H, W, K, C) gathered from pcls.features
    (white if the cloud has no features)."""
    B, H, W, K = fragments.idx.shape
    if pcls.features is None:
        feats = jnp.ones((B, pcls.max_points, 3), jnp.float32) * default
    else:
        feats = pcls.features
    safe = jnp.maximum(fragments.idx, 0).reshape(B, H * W * K)
    g = jax.vmap(lambda f, i: f[i])(feats, safe)
    g = g.reshape(B, H, W, K, feats.shape[-1])
    return jnp.where(fragments.mask[..., None], g, 0.0)


def splat_weights(fragments: PointFragments, radius: float) -> jax.Array:
    """pytorch3d splat weight: w = 1 - d^2 / r^2, clipped to [0, 1]."""
    w = 1.0 - fragments.dists2 / (radius * radius)
    return jnp.where(fragments.mask, jnp.clip(w, 0.0, 1.0), 0.0)


def alpha_composite(
    weights: jax.Array, features: jax.Array
) -> jax.Array:
    """Front-to-back over-compositing (AlphaCompositor parity).

    weights (B, H, W, K) sorted near-to-far; features (B, H, W, K, C).
    out_c = sum_k w_k * prod_{j<k} (1 - w_j) * c_k; returns (B, H, W, C+1)
    with accumulated alpha in the last channel.
    """
    one_minus = 1.0 - weights
    # prod_{j<k}: exclusive cumprod along K.
    cum = jnp.cumprod(one_minus, axis=-1)
    excl = jnp.concatenate([jnp.ones_like(cum[..., :1]), cum[..., :-1]], axis=-1)
    contrib = weights * excl  # (B, H, W, K)
    rgb = jnp.einsum("...k,...kc->...c", contrib, features)
    alpha = jnp.sum(contrib, axis=-1, keepdims=True)
    return jnp.concatenate([rgb, alpha], axis=-1)


def norm_weighted_composite(
    weights: jax.Array, features: jax.Array, eps: float = 1e-10
) -> jax.Array:
    """Normalized weighted sum (NormWeightedCompositor parity) -> (B,H,W,C+1)."""
    denom = jnp.sum(weights, axis=-1, keepdims=True)
    rgb = jnp.einsum("...k,...kc->...c", weights, features) / jnp.clip(
        denom, eps, None
    )
    alpha = jnp.clip(denom, 0.0, 1.0)
    return jnp.concatenate([rgb, alpha], axis=-1)


def pulsar_composite(
    fragments: PointFragments,
    weights: jax.Array,
    features: jax.Array,
    gamma: float = 1e-3,
    background: float = 0.0,
    eps: float = 1e-10,
) -> jax.Array:
    """Sphere-splat blending in the spirit of Pulsar: per-splat coverage
    weights sharpened by a softmax over inverse depth with temperature gamma
    (small gamma -> hard nearest-sphere wins; large gamma -> translucent mix).
    Returns (B, H, W, C+1)."""
    z = jnp.where(fragments.mask, fragments.zbuf, INF_Z)
    zmin = jnp.min(z, axis=-1, keepdims=True)
    depth_w = jnp.exp(-(z - zmin) / gamma) * fragments.mask
    w = weights * depth_w
    denom = jnp.sum(w, axis=-1, keepdims=True)
    rgb = (
        jnp.einsum("...k,...kc->...c", w, features)
        + background * jnp.exp(-jnp.sum(weights, axis=-1, keepdims=True))
    ) / jnp.clip(denom, eps, None)
    alpha = 1.0 - jnp.exp(-jnp.sum(weights, axis=-1, keepdims=True))
    return jnp.concatenate([rgb, alpha], axis=-1)


INF_Z = 1e10
