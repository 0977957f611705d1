"""Fragment buffers produced by mesh rasterization.

Mirrors pytorch3d's Fragments (pix_to_face / zbuf / bary_coords / dists, the
surface consumed at reference torch_renderer.py:113, camera_pose_optimizer.py:
244-246, batch_rendering_test.py:274) so every shader in the reference has a
direct equivalent here — but produced by a TPU-shaped tiled rasterizer.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

EMPTY_DIST = 1e10  # sentinel squared-distance for empty fragment slots


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Fragments:
    """Per-pixel top-K face hits.

    pix_to_face: (B, H, W, K) int32 face index into the mesh's padded face
        axis, -1 for empty slots. Slots are sorted by increasing z.
    zbuf:        (B, H, W, K) float32 camera-space z of the hit (perspective-
        correct, clipped-barycentric), -1.0 for empty slots (pytorch3d
        sentinel, so `relu(zbuf)` / `zbuf[zbuf==-1]=0` idioms carry over).
    bary:        (B, H, W, K, 3) float32 perspective-correct barycentrics
        (clipped to the simplex when blur_radius > 0), 0 for empty slots.
    dists:       (B, H, W, K) float32 signed squared pixel-to-face-boundary
        distance in NDC units (negative inside), EMPTY_DIST for empty slots.
    """

    pix_to_face: jax.Array
    zbuf: jax.Array
    bary: jax.Array
    dists: jax.Array

    @property
    def mask(self) -> jax.Array:
        """(B, H, W, K) bool: slot has a real face."""
        return self.pix_to_face >= 0

    def hard_mask(self) -> jax.Array:
        """(B, H, W) bool hard coverage from the nearest slot."""
        return self.pix_to_face[..., 0] >= 0

    def depth(self) -> jax.Array:
        """(B, H, W) nearest-hit depth with background 0 (the reference's
        `relu(zbuf[..., 0])`, torch_renderer.py:113-114)."""
        return jax.nn.relu(self.zbuf[..., 0])


def interpolate_face_attributes(
    pix_to_face: jax.Array, bary: jax.Array, face_attrs: jax.Array
) -> jax.Array:
    """Barycentric interpolation of per-face-corner attributes.

    Args:
      pix_to_face: (B, ..., K) indices (-1 empty).
      bary: (B, ..., K, 3).
      face_attrs: (B, F, 3, C) per-corner attributes.
    Returns:
      (B, ..., K, C), zeros at empty slots.
    """
    safe_idx = jnp.maximum(pix_to_face, 0)

    def gather_b(attrs_b, idx_b):
        return attrs_b[idx_b]  # (..., K, 3, C)

    corners = jax.vmap(gather_b)(face_attrs, safe_idx)
    out = jnp.einsum("...kv,...kvc->...kc", bary, corners)
    return jnp.where((pix_to_face >= 0)[..., None], out, 0.0)
