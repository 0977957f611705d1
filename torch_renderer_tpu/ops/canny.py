"""Differentiable Canny edge extraction — fixed-weight convs, pure JAX.

TPU rebuild of the reference's net_canny.py (component 15, SURVEY.md §2a):
an nn.Module with frozen conv weights — 5-tap separable Gaussian blur
(reference :14-22), Sobel filters (:24-33), directional non-max suppression
(:36-72) — whose forward returns (blurred, grad_mag, grad_orientation,
thin_edges, thresholded, early_threshold) (:74-143). Used to build edge-map
training targets for the synthetic dataset generator (BASELINE.json configs).

Here the whole pipeline is one jittable function of (B, H, W, C) images; the
directional NMS uses jnp.roll comparisons instead of 8 one-hot conv filters
(same result, no 8x conv cost), and everything stays differentiable where the
reference was (gradients flow through the retained magnitudes).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CannyOutputs:
    """Field-for-field mirror of the reference Net.forward tuple (:74-143)."""

    blurred: jax.Array          # (B, H, W, C)
    grad_magnitude: jax.Array   # (B, H, W)
    grad_orientation: jax.Array # (B, H, W) degrees in [0, 360)
    thin_edges: jax.Array       # (B, H, W) NMS-suppressed magnitudes
    thresholded: jax.Array      # (B, H, W) thin edges after threshold
    early_threshold: jax.Array  # (B, H, W) raw magnitude after threshold


def gaussian_kernel_1d(size: int = 5, sigma: float = 1.0) -> jax.Array:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def _conv2d_same(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 'same' conv of (B, H, W, C) with (kh, kw) kernel."""
    B, H, W, C = img.shape
    kh, kw = kernel.shape
    k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, C))
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def gaussian_blur(img: jax.Array, size: int = 5, sigma: float = 1.0) -> jax.Array:
    """Separable Gaussian blur (the reference's two 1D convs, :14-22)."""
    k = gaussian_kernel_1d(size, sigma)
    img = _conv2d_same(img, k[None, :])
    return _conv2d_same(img, k[:, None])


SOBEL_X = jnp.asarray(
    [[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]], jnp.float32
)


def canny_edges(
    images: jax.Array,
    low_threshold: float = 10.0,
    blur_size: int = 5,
    blur_sigma: float = 1.0,
    eps: float = 1e-12,
) -> CannyOutputs:
    """Run the fixed-weight Canny pipeline on (B, H, W, C) or (B, H, W) images
    (values in any range; the reference feeds 0-255)."""
    if images.ndim == 3:
        images = images[..., None]
    B, H, W, C = images.shape

    blurred = gaussian_blur(images, blur_size, blur_sigma)
    gray = jnp.mean(blurred, axis=-1, keepdims=True)

    gx = _conv2d_same(gray, SOBEL_X)[..., 0]
    gy = _conv2d_same(gray, SOBEL_X.T)[..., 0]

    mag = jnp.sqrt(gx * gx + gy * gy + eps)
    orient_deg = (jnp.degrees(jnp.arctan2(gy, gx + eps)) + 360.0) % 360.0

    # Non-max suppression: quantize orientation to 4 axes and compare the
    # magnitude against the two neighbors along that axis (the reference's 8
    # directional filters :36-72 compute exactly these differences).
    sector = jnp.round(orient_deg / 45.0).astype(jnp.int32) % 4  # 0:E,1:NE,2:N,3:NW
    shifts = [  # (dy, dx) neighbor offsets per sector
        (0, 1),   # horizontal gradient -> compare left/right
        (1, 1),   # diagonal
        (1, 0),   # vertical
        (1, -1),  # anti-diagonal
    ]
    is_max = jnp.zeros_like(mag, dtype=bool)
    for s, (dy, dx) in enumerate(shifts):
        fwd = jnp.roll(mag, (-dy, -dx), axis=(1, 2))
        bwd = jnp.roll(mag, (dy, dx), axis=(1, 2))
        keep = (mag >= fwd) & (mag >= bwd)
        is_max = jnp.where(sector == s, keep, is_max)

    thin = jnp.where(is_max, mag, 0.0)
    # Border pixels are unreliable (roll wraps) — zero them as the reference's
    # padding does implicitly.
    border = jnp.zeros((H, W), bool).at[1:-1, 1:-1].set(True)
    thin = thin * border[None]

    thresholded = jnp.where(thin > low_threshold, thin, 0.0)
    early = jnp.where(mag > low_threshold, mag, 0.0)

    return CannyOutputs(
        blurred=blurred,
        grad_magnitude=mag,
        grad_orientation=orient_deg,
        thin_edges=thin,
        thresholded=thresholded,
        early_threshold=early,
    )
