"""G-buffer decodes from fragments: normals, instance ids, visibility.

The reference gets these for free from Blender's render passes
(coco_data_generator.py:352-358 renders RGB + depth + normals + instance
segmentation). Here they are pure gathers over the shared Fragments — one
rasterization feeds every pass.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..cameras.perspective import PerspectiveCamera
from ..rasterize.fragments import Fragments, interpolate_face_attributes
from ..structures.meshes import Meshes


def render_normals(
    meshes: Meshes,
    fragments: Fragments,
    camera: Optional[PerspectiveCamera] = None,
    space: str = "world",
) -> jax.Array:
    """Smooth-shaded normal map (B, H, W, 3) of the nearest hit; zeros on
    background. space='camera' rotates into the camera frame (the normals
    pass convention of the reference's BlenderProc pipeline)."""
    fv_normals = jax.vmap(lambda n, f: n[f])(meshes.vertex_normals(), meshes.faces)
    n = interpolate_face_attributes(
        fragments.pix_to_face[..., :1], fragments.bary[..., :1, :], fv_normals
    )[..., 0, :]
    n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12, None)
    if space == "camera":
        if camera is None:
            raise ValueError("camera required for camera-space normals")
        n = jnp.einsum("bij,bhwj->bhwi", camera.R, n)
    return jnp.where(fragments.hard_mask()[..., None], n, 0.0)


def instance_segmentation(
    fragments: Fragments, face_to_object: jax.Array
) -> jax.Array:
    """Instance-id map (B, H, W) int32 from the nearest fragment; -1 =
    background. face_to_object: (F,) object index per face (scenes.py)."""
    p2f = fragments.pix_to_face[..., 0]
    safe = jnp.maximum(p2f, 0)
    ids = face_to_object[safe]
    return jnp.where(p2f >= 0, ids, -1).astype(jnp.int32)


def instance_masks(
    fragments: Fragments, face_to_object: jax.Array, n_objects: int
) -> jax.Array:
    """Per-object boolean masks (B, N, H, W)."""
    seg = instance_segmentation(fragments, face_to_object)
    return seg[:, None, :, :] == jnp.arange(n_objects)[None, :, None, None]


def visibility_fraction(
    fragments: Fragments, face_to_object: jax.Array, n_objects: int
) -> jax.Array:
    """Fraction of image pixels covered per object (B, N) — used to filter
    barely-visible annotations like the reference's COCO writer does."""
    masks = instance_masks(fragments, face_to_object, n_objects)
    return jnp.mean(masks.astype(jnp.float32), axis=(-2, -1))
