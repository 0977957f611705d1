"""Differentiable Canny edge extraction — fixed-weight convs, pure JAX.

TPU rebuild of the reference's net_canny.py (component 15, SURVEY.md §2a):
an nn.Module with frozen conv weights — 5-tap separable Gaussian blur
(reference :14-22), Sobel filters (:24-33), directional non-max suppression
via 8 difference filters (:36-72) — whose forward returns
(blurred, grad_mag, grad_orientation, thin_edges, thresholded,
early_threshold) (:74-143).

Semantics-parity notes (each matches the reference exactly; a torch oracle
test asserts it):
  * the Gaussian taps are scipy.signal.gaussian(5, 1) UNNORMALIZED (sum
    ~2.48 per axis), so the blur amplifies — reference :15-22;
  * Sobel runs per color channel and grad_mag is the SUM of per-channel
    magnitudes — reference :98-100;
  * orientation is atan2(sum gy, sum gx)*(180/3.14159) + 180, rounded to
    45-degree multiples (so values lie in {0, 45, ..., 360}) — :101-103;
  * NMS keeps a pixel iff grad_mag STRICTLY exceeds both neighbors along
    the quantized orientation axis (min of the two directional differences
    > 0), with zero-padded borders — :107-131. Expressed here as one-hot
    sector selection over 8 zero-padded shifts instead of 8 conv filters
    (identical arithmetic, no 8x conv cost).

Everything is one jittable function of (B, H, W, C) images and stays
differentiable where the reference was (gradients flow through the
retained magnitudes).
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
    grad_magnitude: jax.Array   # (B, H, W) sum of per-channel magnitudes
    grad_orientation: jax.Array # (B, H, W) degrees in {0, 45, ..., 360}
    thin_edges: jax.Array       # (B, H, W) NMS-suppressed magnitudes
    thresholded: jax.Array      # (B, H, W) thin edges after threshold
    early_threshold: jax.Array  # (B, H, W) raw magnitude after threshold


def gaussian_kernel_1d(
    size: int = 5, sigma: float = 1.0, normalize: bool = True
) -> jax.Array:
    """1D Gaussian taps. normalize=False reproduces scipy.signal.gaussian
    (peak 1, sum > 1) as the reference's conv weights use (:15)."""
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k) if normalize else k


def _conv2d_same(img: jax.Array, kernel: jax.Array) -> jax.Array:
    """Depthwise 'same' cross-correlation of (B, H, W, C) with (kh, kw)."""
    B, H, W, C = img.shape
    kh, kw = kernel.shape
    k = jnp.broadcast_to(kernel[:, :, None, None], (kh, kw, 1, C))
    return jax.lax.conv_general_dilated(
        img, k, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def gaussian_blur(
    img: jax.Array, size: int = 5, sigma: float = 1.0,
    normalize: bool = True,
) -> jax.Array:
    """Separable Gaussian blur (the reference's two 1D convs, :14-22, which
    use UNNORMALIZED taps — pass normalize=False for parity)."""
    k = gaussian_kernel_1d(size, sigma, normalize)
    img = _conv2d_same(img, k[None, :])
    return _conv2d_same(img, k[:, None])


# The reference's Sobel weights (:24-26); torch Conv2d cross-correlates and
# so does XLA, so the taps carry over unflipped.
SOBEL_X = jnp.asarray(
    [[1.0, 0.0, -1.0], [2.0, 0.0, -2.0], [1.0, 0.0, -1.0]], jnp.float32
)

# Neighbor offset (dy, dx) selected by directional filter k (:38-66):
# filter k subtracts the neighbor 45k degrees from east, y down.
_NEIGHBOR_SHIFTS = (
    (0, 1), (1, 1), (1, 0), (1, -1), (0, -1), (-1, -1), (-1, 0), (-1, 1),
)


def _neighbor(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """out[y, x] = img[y+dy, x+dx] with zeros outside the image."""
    H, W = img.shape[1:3]
    p = jnp.pad(img, [(0, 0), (1, 1), (1, 1)])
    return p[:, 1 + dy : 1 + dy + H, 1 + dx : 1 + dx + W]


def canny_edges(
    images: jax.Array,
    low_threshold: float = 10.0,
    blur_size: int = 5,
    blur_sigma: float = 1.0,
    eps: float = 1e-12,
) -> CannyOutputs:
    """Run the fixed-weight Canny pipeline on (B, H, W, C) or (B, H, W)
    images (values in any range; the reference feeds 0-255 RGB)."""
    if images.ndim == 3:
        images = images[..., None]

    blurred = gaussian_blur(images, blur_size, blur_sigma, normalize=False)

    gx = _conv2d_same(blurred, SOBEL_X)    # (B, H, W, C) per-channel
    gy = _conv2d_same(blurred, SOBEL_X.T)

    # Sum of per-channel magnitudes (:98-100); orientation from the summed
    # gradients with the reference's +180 shift and 45-degree rounding
    # (:101-103, including its 3.14159 pi).
    mag = jnp.sum(jnp.sqrt(gx * gx + gy * gy + eps), axis=-1)
    orient = (
        jnp.arctan2(jnp.sum(gy, axis=-1), jnp.sum(gx, axis=-1))
        * (180.0 / 3.14159)
        + 180.0
    )
    orient = jnp.round(orient / 45.0) * 45.0

    # NMS: keep iff mag strictly exceeds both neighbors along the
    # orientation axis (min of the two directional differences > 0, :129).
    sector = (jnp.round(orient / 45.0).astype(jnp.int32)) % 8
    is_max = jnp.zeros(mag.shape, bool)
    for s, (dy, dx) in enumerate(_NEIGHBOR_SHIFTS):
        nb_pos = _neighbor(mag, dy, dx)
        nb_neg = _neighbor(mag, -dy, -dx)
        keep = (mag - nb_pos > 0.0) & (mag - nb_neg > 0.0)
        is_max = jnp.where(sector == s, keep, is_max)

    thin = jnp.where(is_max, mag, 0.0)
    thresholded = jnp.where(thin < low_threshold, 0.0, thin)
    early = jnp.where(mag < low_threshold, 0.0, mag)

    return CannyOutputs(
        blurred=blurred,
        grad_magnitude=mag,
        grad_orientation=orient,
        thin_edges=thin,
        thresholded=thresholded,
        early_threshold=early,
    )
