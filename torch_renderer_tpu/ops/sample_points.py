"""Differentiable surface point sampling from meshes.

Replaces pytorch3d.ops.sample_points_from_meshes (reference
deform_mesh_from_pcd.py:168-169 — called twice per optimization step — and
pytorch3d_icp_evaluation.py:145). Area-weighted face choice via
jax.random.categorical over log-areas (padded faces get -inf logits), uniform
barycentric placement via the sqrt trick. Gradients flow to vertices through
the sampled positions (the chamfer deformation loop depends on this).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.meshes import Meshes


def sample_points_from_meshes(
    meshes: Meshes,
    num_samples: int,
    key: jax.Array,
    return_normals: bool = False,
):
    """Sample (B, num_samples, 3) points uniformly over each mesh surface.

    The categorical face choice is a function of stop-gradient areas (discrete
    choice, as in pytorch3d); positions are differentiable in verts.
    """
    areas = jax.lax.stop_gradient(meshes.face_areas())  # (B, F)
    logits = jnp.where(
        (meshes.face_mask() > 0) & (areas > 0), jnp.log(jnp.clip(areas, 1e-30, None)), -jnp.inf
    )
    k_face, k_bary = jax.random.split(key)
    face_idx = jax.random.categorical(
        k_face, logits[:, None, :], axis=-1, shape=(meshes.batch_size, num_samples)
    )  # (B, S)

    from .rowops import take_rows

    F = meshes.faces.shape[1]
    fv = meshes.face_verts()  # (B, F, 3, 3)
    # one-hot MXU row gather on TPU: (S, F) choice of (F, 9) corner rows
    # (arbitrary-index gathers of tiny-trailing-dim arrays run nearly
    # scalar there — ops/rowops.py)
    corners = jax.vmap(
        lambda f, i: take_rows(f.reshape(F, 9), i).reshape(-1, 3, 3)
    )(fv, face_idx)  # (B, S, 3, 3)

    # Uniform barycentric: u = 1 - sqrt(r1), v = r2 * sqrt(r1).
    r = jax.random.uniform(k_bary, (meshes.batch_size, num_samples, 2))
    s = jnp.sqrt(r[..., 0])
    w0 = 1.0 - s
    w1 = r[..., 1] * s
    w2 = 1.0 - w0 - w1
    bary = jnp.stack([w0, w1, w2], axis=-1)  # (B, S, 3)
    points = jnp.einsum("bsk,bskc->bsc", bary, corners)

    if not return_normals:
        return points
    fn = meshes.face_normals()
    normals = jax.vmap(take_rows)(fn, face_idx)
    return points, normals
