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


def splat_weights(fragments: PointFragments, radius) -> jax.Array:
    """pytorch3d splat weight: w = 1 - d^2 / r^2, clipped to [0, 1].

    radius: scalar, or an array broadcastable to fragments.dists2 (the
    per-HIT rasterization radius when a per-point override was used —
    weights must follow the radius the splats were selected with)."""
    radius = jnp.asarray(radius, jnp.float32)
    if radius.ndim:  # guard dead slots (0-filled per-hit radius)
        radius = jnp.where(fragments.mask, radius, 1.0)
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


def pulsar_sphere_composite(
    fragments: PointFragments,
    centers_cam: jax.Array,
    radius_world: jax.Array,
    opacity: jax.Array,
    features: jax.Array,
    fx: jax.Array,
    fy: jax.Array,
    cx: jax.Array,
    cy: jax.Array,
    image_size,
    gamma: float = 1e-2,
    znear: float = 0.1,
    zfar: float = 10.0,
    background: float = 0.0,
    eps: float = 1e-3,
    packed_hit_channels=None,
) -> jax.Array:
    """True sphere-based Pulsar blending (Lassner & Zollhoefer, CVPR 2021;
    arXiv 2004.07484) — the model the reference's PulsarPointRender wraps
    via pytorch3d.renderer.points.pulsar (torch_renderer.py:209-230).

    Each splat is a 3D sphere (camera-space center, WORLD-space radius,
    opacity in [0, 1]). Per pixel ray the K rasterizer-selected spheres are
    intersected analytically; each hit blends with weight

        w_i  ∝  o_i · d_i · exp(o_i · zhat_i / gamma)

    normalized against the other hits plus the background's exp(eps/gamma)
    term, where zhat_i in [0, 1] is the RAY-SPHERE INTERSECTION depth
    normalized over [znear, zfar] (1 = nearest — spheres occlude by their
    surface, not their center) and d_i is the soft sphere-boundary coverage:
    a one-pixel-footprint linear ramp in the orthogonal ray-to-center
    distance, which is what carries silhouette gradients to sphere
    positions/radii. gamma -> 0 recovers hard z-order; gamma ~ 1 is fully
    translucent (the paper's usable range, 1e-5..1).

    centers_cam (B, N, 3); radius_world, opacity (B, N); features (B, N, C);
    fx, fy, cx, cy (B,). Returns (B, H, W, C+1) with alpha = 1 - w_bg.
    """
    H, W = image_size
    B, _, _, K = fragments.idx.shape

    if packed_hit_channels is not None:
        # binned path: all per-hit channels rode the candidate gather +
        # winner one-hot einsum (packed [center xyz, radius, opacity,
        # features] by PulsarRenderer.render — an EXPLICIT argument, not
        # sniffed from fragments, so a plain feature ride can never be
        # misread as this layout) — no near-scalar per-pixel gathers
        hc = packed_hit_channels
        c = hc[..., :3]
        r = hc[..., 3]
        o = hc[..., 4]
        f = hc[..., 5:]
    else:
        safe = jnp.maximum(fragments.idx, 0).reshape(B, -1)
        gat = lambda arr: jax.vmap(lambda a, i: a[i])(arr, safe)
        c = gat(centers_cam).reshape(B, H, W, K, 3)
        r = gat(radius_world[..., None]).reshape(B, H, W, K)
        o = gat(opacity[..., None]).reshape(B, H, W, K)
        f = gat(features).reshape(B, H, W, K, features.shape[-1])

    # unit pixel rays in camera space (pixel centers at index + 0.5)
    u = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, None, :]
    v = (jnp.arange(H, dtype=jnp.float32) + 0.5)[None, :, None]
    dx = jnp.broadcast_to(
        (u - cx[:, None, None]) / fx[:, None, None], (B, H, W)
    )
    dy = jnp.broadcast_to(
        (v - cy[:, None, None]) / fy[:, None, None], (B, H, W)
    )
    dn = jnp.sqrt(dx * dx + dy * dy + 1.0)
    d = jnp.stack([dx, dy, jnp.ones_like(dx)], axis=-1) / dn[..., None]

    # ray-sphere geometry: t_c = closest approach, b = orthogonal distance
    t_c = jnp.sum(c * d[:, :, :, None, :], axis=-1)          # (B, H, W, K)
    b2 = jnp.maximum(jnp.sum(c * c, axis=-1) - t_c * t_c, 0.0)
    disc = r * r - b2
    hit = fragments.mask & (disc > 0.0) & (t_c > 0.0)
    # double-where safe sqrts: sqrt'(0) = inf and 0 * inf = nan would poison
    # gradients for non-hit lanes (disc clamped at 0) and on-axis spheres
    # (b2 == 0, coverage saturated)
    sq_disc = jnp.where(
        disc > 0.0, jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0)), 0.0
    )
    b = jnp.where(b2 > 1e-12, jnp.sqrt(jnp.where(b2 > 1e-12, b2, 1.0)), 0.0)
    t_int = t_c - sq_disc
    z_int = t_int * d[:, :, :, None, 2]                      # camera depth

    zhat = jnp.clip((zfar - z_int) / (zfar - znear), 0.0, 1.0)
    # soft boundary: linear ramp one pixel footprint wide at the sphere's
    # depth (world units per pixel = z / f) — interior pixels saturate at 1
    fpx = jnp.maximum(z_int, znear) / jnp.maximum(fx, fy)[:, None, None, None]
    d_cov = jnp.clip((r - b) / jnp.maximum(fpx, 1e-12), 0.0, 1.0)

    l = jnp.where(hit, o * zhat / gamma, -INF_Z)
    l_bg = jnp.float32(eps / gamma)
    m = jnp.maximum(jnp.max(l, axis=-1), l_bg)               # (B, H, W)
    e = jnp.where(hit, o * d_cov * jnp.exp(l - m[..., None]), 0.0)
    e_bg = jnp.exp(l_bg - m)
    denom = jnp.sum(e, axis=-1) + e_bg
    rgb = (
        jnp.einsum("...k,...kc->...c", e, f) + e_bg[..., None] * background
    ) / denom[..., None]
    alpha = 1.0 - e_bg / denom
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)


INF_Z = 1e10
