"""Fragment blending: hard z-buffer and SoftRas sigmoid/softmax blending.

Pure-jax equivalents of pytorch3d.renderer.blending (BlendParams /
hard_rgb_blend / softmax_rgb_blend / the SoftSilhouetteShader product rule),
consumed at reference torch_renderer.py:87,102-108 and
camera_pose_optimizer.py:109,131-158. These run as XLA-fused epilogues over
the fragment buffers — no separate kernel launches.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from ..rasterize.fragments import Fragments


@dataclasses.dataclass(frozen=True)
class BlendParams:
    """pytorch3d BlendParams: sigma controls edge softness (sigmoid of the
    signed squared distance), gamma the z-softmax temperature."""

    sigma: float = 1e-4
    gamma: float = 1e-4
    background_color: Tuple[float, float, float] = (1.0, 1.0, 1.0)


def sigmoid_alpha(fragments: Fragments, sigma: float) -> jax.Array:
    """SoftRas coverage: alpha = 1 - prod_k (1 - sigmoid(-dist_k / sigma)).

    Computed in log space for stability: log(1 - sigmoid(-d/s)) =
    -softplus(-d/s), so alpha = 1 - exp(-sum_k softplus(-d_k/s)).
    Returns (B, H, W).
    """
    d = fragments.dists / sigma
    terms = jax.nn.softplus(-d) * fragments.mask
    return 1.0 - jnp.exp(-jnp.sum(terms, axis=-1))


def hard_rgb_blend(
    colors: jax.Array, fragments: Fragments, blend: BlendParams
) -> jax.Array:
    """Nearest-fragment color with background fill: (B, H, W, K, 3) -> RGBA."""
    bg = jnp.asarray(blend.background_color, colors.dtype)
    m = fragments.mask[..., 0:1]
    rgb = jnp.where(m, colors[..., 0, :], bg)
    alpha = m.astype(colors.dtype)
    return jnp.concatenate([rgb, alpha], axis=-1)


def softmax_rgb_blend(
    colors: jax.Array,
    fragments: Fragments,
    blend: BlendParams,
    znear: float = 1.0,
    zfar: float = 100.0,
) -> jax.Array:
    """SoftRas aggregation (pytorch3d softmax_rgb_blend semantics).

    colors: (B, H, W, Kc, 3) per-fragment shaded colors. Kc may be SMALLER
    than the fragments' K (shade_k shading): the color softmax then runs
    over the nearest Kc slots (the dropped slots' weights are ~exp(-dz/
    gamma) — negligible at the default gamma) while alpha keeps all K.
    Returns (B, H, W, 4) RGBA; alpha is the sigmoid coverage product.
    """
    eps = 1e-10
    kc = colors.shape[-2]
    mask = fragments.mask[..., :kc]
    prob = jax.nn.sigmoid(-fragments.dists[..., :kc] / blend.sigma) * mask

    # Normalized inverse depth in [0, 1]; far/empty -> 0.
    zinv = (zfar - fragments.zbuf[..., :kc]) / (zfar - znear) * mask
    zmax = jnp.max(zinv, axis=-1, keepdims=True)  # stabilizer
    w = prob * jnp.exp((zinv - zmax) / blend.gamma)
    delta = jnp.exp((eps - zmax[..., 0]) / blend.gamma)

    denom = jnp.sum(w, axis=-1) + delta
    bg = jnp.asarray(blend.background_color, colors.dtype)
    rgb = (
        jnp.einsum("...k,...kc->...c", w, colors) + delta[..., None] * bg
    ) / denom[..., None]

    alpha = 1.0 - jnp.exp(
        -jnp.sum(
            jax.nn.softplus(-fragments.dists / blend.sigma) * fragments.mask,
            axis=-1,
        )
    )
    return jnp.concatenate([rgb, alpha[..., None]], axis=-1)
