"""Nearest-neighbor vertex attribute transfer.

Rebuild of the reference's open3d color-reattach step
(query_vertex_color_from_o3d_triMesh, deform_mesh_from_pcd.py:24-33: after
deforming a blank mesh toward a colored target, look up each result vertex's
color from the nearest target vertex). One batched NN query on device.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .knn_chamfer import knn_points, nn_points


def query_vertex_colors(
    query_verts: jax.Array,
    ref_verts: jax.Array,
    ref_colors: jax.Array,
    ref_mask: Optional[jax.Array] = None,
    k: int = 1,
) -> jax.Array:
    """Transfer per-vertex colors from a reference mesh/cloud.

    query_verts (B, V, 3); ref_verts (B, M, 3); ref_colors (B, M, C).
    k > 1 averages the k nearest reference colors with inverse-distance
    weights. Returns (B, V, C).
    """
    if query_verts.ndim == 2:
        query_verts = query_verts[None]
    if ref_verts.ndim == 2:
        ref_verts = ref_verts[None]
    if ref_colors.ndim == 2:
        ref_colors = ref_colors[None]

    if k == 1:
        _, idx = nn_points(query_verts, ref_verts, y_mask=ref_mask)
        return jax.vmap(lambda c, i: c[i])(ref_colors, idx)

    d2, idx = knn_points(query_verts, ref_verts, k, y_mask=ref_mask)
    w = 1.0 / jnp.clip(d2, 1e-12, None)  # (B, V, k)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    gathered = jax.vmap(lambda c, i: c[i])(ref_colors, idx)  # (B, V, k, C)
    return jnp.einsum("bvk,bvkc->bvc", w, gathered)
