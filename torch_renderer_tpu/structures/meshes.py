"""Padded batched triangle meshes — the TPU-native Meshes structure.

Replaces pytorch3d.structures.Meshes (verts/faces ragged lists, extend,
offset_verts, verts_packed — reference deform_mesh_from_pcd.py:66,165,
mesh_deformer.py:304, batch_rendering_test.py:325-327). TPU/XLA wants static
shapes, so ragged per-mesh lists become padded (B, V, 3)/(B, F, 3) arrays with
valid counts; every op masks padding explicitly.

Padding invariants:
  * verts rows >= num_verts[b] are zeros;
  * faces rows >= num_faces[b] are (0, 0, 0) — they reference a real vertex so
    gathers stay in-bounds, and are excluded via the face mask everywhere.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from .textures import TexturesUV, TexturesVertex

Textures = Union[TexturesVertex, TexturesUV]


def _pad_to(a: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + a.shape[1:], dtype=a.dtype)
    out[: a.shape[0]] = a
    return out


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Meshes:
    verts: jax.Array  # (B, V, 3) float32, zero-padded
    faces: jax.Array  # (B, F, 3) int32, zero-padded
    num_verts: jax.Array  # (B,) int32
    num_faces: jax.Array  # (B,) int32
    textures: Optional[Textures] = None

    # -- constructors ------------------------------------------------------
    @staticmethod
    def from_lists(
        verts_list: Sequence, faces_list: Sequence, textures: Optional[Textures] = None,
        pad_verts_to: Optional[int] = None, pad_faces_to: Optional[int] = None,
    ) -> "Meshes":
        """Build a padded batch from ragged per-mesh (Vi, 3)/(Fi, 3) arrays."""
        verts_np = [np.asarray(v, np.float32) for v in verts_list]
        faces_np = [np.asarray(f, np.int32) for f in faces_list]
        V = pad_verts_to or max(v.shape[0] for v in verts_np)
        F = pad_faces_to or max(f.shape[0] for f in faces_np)
        return Meshes(
            verts=jnp.asarray(np.stack([_pad_to(v, V) for v in verts_np])),
            faces=jnp.asarray(np.stack([_pad_to(f, F) for f in faces_np])),
            num_verts=jnp.asarray([v.shape[0] for v in verts_np], jnp.int32),
            num_faces=jnp.asarray([f.shape[0] for f in faces_np], jnp.int32),
            textures=textures,
        )

    @staticmethod
    def from_single(verts, faces, textures: Optional[Textures] = None) -> "Meshes":
        return Meshes.from_lists([verts], [faces], textures)

    # -- basic properties ---------------------------------------------------
    @property
    def batch_size(self) -> int:
        return self.verts.shape[0]

    @property
    def max_verts(self) -> int:
        return self.verts.shape[1]

    @property
    def max_faces(self) -> int:
        return self.faces.shape[1]

    def vert_mask(self) -> jax.Array:
        """(B, V) float mask of valid vertices."""
        return (jnp.arange(self.max_verts)[None, :] < self.num_verts[:, None]).astype(
            self.verts.dtype
        )

    def face_mask(self) -> jax.Array:
        """(B, F) float mask of valid faces."""
        return (jnp.arange(self.max_faces)[None, :] < self.num_faces[:, None]).astype(
            self.verts.dtype
        )

    # -- batch ops (pytorch3d Meshes API parity) -----------------------------
    def __getitem__(self, idx) -> "Meshes":
        """Batch indexing (pytorch3d Meshes[i]); int keeps a batch dim of 1.

        Slices every pytree leaf (verts/faces/counts and any attached
        textures) along the leading batch axis."""
        if isinstance(idx, (int, np.integer)):
            idx = slice(idx, idx + 1)
        return jax.tree_util.tree_map(lambda x: x[idx], self)

    def extend(self, n: int) -> "Meshes":
        """Repeat each mesh n times along the batch dim
        (pytorch3d Meshes.extend, reference batch_rendering_test.py:325)."""
        rep = lambda a: jnp.repeat(a, n, axis=0)
        return Meshes(
            verts=rep(self.verts), faces=rep(self.faces),
            num_verts=rep(self.num_verts), num_faces=rep(self.num_faces),
            textures=self.textures.extend(n) if self.textures is not None else None,
        )

    def offset_verts(self, deform: jax.Array) -> "Meshes":
        """New mesh with verts + deform (pytorch3d offset_verts,
        reference deform_mesh_from_pcd.py:165). deform: (B, V, 3) or (V, 3)."""
        if deform.ndim == 2:
            deform = deform[None]
        mask = self.vert_mask()[..., None]
        return dataclasses.replace(self, verts=self.verts + deform * mask)

    def update_padded(self, new_verts: jax.Array) -> "Meshes":
        return dataclasses.replace(self, verts=new_verts)

    def scale(self, s, center=None) -> "Meshes":
        v = self.verts
        if center is not None:
            v = (v - center) * s + center
        else:
            v = v * s
        return dataclasses.replace(self, verts=v * self.vert_mask()[..., None])

    def detach_to_lists(self) -> List:
        """Host-side ragged views (numpy) for IO/debug."""
        nv = np.asarray(self.num_verts)
        nf = np.asarray(self.num_faces)
        verts = np.asarray(self.verts)
        faces = np.asarray(self.faces)
        return [
            (verts[b, : nv[b]], faces[b, : nf[b]]) for b in range(self.batch_size)
        ]

    # -- pytorch3d-style accessors (API familiarity for reference users) -----
    def verts_padded(self) -> jax.Array:
        return self.verts

    def faces_padded(self) -> jax.Array:
        return self.faces

    def verts_list(self) -> List[np.ndarray]:
        return [v for v, _ in self.detach_to_lists()]

    def faces_list(self) -> List[np.ndarray]:
        return [f for _, f in self.detach_to_lists()]

    def verts_packed(self) -> jax.Array:
        """All valid vertices concatenated (host-side shapes; for device-side
        math prefer the padded arrays + masks)."""
        return jnp.concatenate(
            [jnp.asarray(v) for v, _ in self.detach_to_lists()], axis=0
        )

    def get_mesh_verts_faces(self, index: int):
        """(verts (Vi, 3), faces (Fi, 3)) of one mesh (pytorch3d parity,
        reference deform_mesh_from_pcd.py:231)."""
        return self.detach_to_lists()[index]

    def num_verts_per_mesh(self) -> jax.Array:
        return self.num_verts

    def num_faces_per_mesh(self) -> jax.Array:
        return self.num_faces

    # -- geometry -----------------------------------------------------------
    def face_verts(self) -> jax.Array:
        """Gather per-face corner positions: (B, F, 3, 3).

        One-hot MXU gather on TPU (ops.rowops): the (V, 3) row gather and
        its scatter-add transpose run nearly scalar there."""
        from ..ops.rowops import take_rows

        F = self.faces.shape[1]
        return jax.vmap(
            lambda v, f: take_rows(v, f.reshape(-1)).reshape(F, 3, 3)
        )(self.verts, self.faces)

    def face_normals(self, normalize: bool = True) -> jax.Array:
        """(B, F, 3) face normals (zero for padded faces)."""
        fv = self.face_verts()
        n = jnp.cross(fv[..., 1, :] - fv[..., 0, :], fv[..., 2, :] - fv[..., 0, :])
        if normalize:
            n = n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12, None)
        return n * self.face_mask()[..., None]

    def face_areas(self) -> jax.Array:
        """(B, F) triangle areas (zero for padded faces)."""
        fv = self.face_verts()
        n = jnp.cross(fv[..., 1, :] - fv[..., 0, :], fv[..., 2, :] - fv[..., 0, :])
        return 0.5 * jnp.linalg.norm(n, axis=-1) * self.face_mask()

    def vertex_normals(self) -> jax.Array:
        """(B, V, 3) area-weighted vertex normals via scatter-add."""
        fv = self.face_verts()
        fn = jnp.cross(fv[..., 1, :] - fv[..., 0, :], fv[..., 2, :] - fv[..., 0, :])
        fn = fn * self.face_mask()[..., None]  # area-weighted (unnormalized)

        from ..ops.rowops import add_rows

        def scatter(faces_b, fn_b):
            # one combined scatter: each face normal adds at all 3 corners
            return add_rows(
                jnp.tile(fn_b, (3, 1)), faces_b.T.reshape(-1), self.max_verts
            )

        vn = jax.vmap(scatter)(self.faces, fn)
        vn = vn / jnp.clip(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-12, None)
        return vn * self.vert_mask()[..., None]

    def bounding_boxes(self) -> jax.Array:
        """(B, 3, 2) per-mesh (min, max) over valid verts."""
        m = self.vert_mask()[..., None]
        big = jnp.asarray(1e30, self.verts.dtype)
        vmin = jnp.min(jnp.where(m > 0, self.verts, big), axis=1)
        vmax = jnp.max(jnp.where(m > 0, self.verts, -big), axis=1)
        return jnp.stack([vmin, vmax], axis=-1)

    def center_and_scale_to_unit_sphere(self):
        """Normalize each mesh to fit the unit sphere; returns
        (meshes, center (B,3), scale (B,)) — the load_and_scale_mesh recipe at
        reference mesh_deformer.py:256-274 / deform_mesh_from_pcd.py:56-63."""
        m = self.vert_mask()[..., None]
        nv = jnp.clip(self.num_verts.astype(self.verts.dtype), 1, None)[:, None]
        center = jnp.sum(self.verts * m, axis=1) / nv
        centered = (self.verts - center[:, None, :]) * m
        scale = jnp.max(jnp.linalg.norm(centered, axis=-1), axis=1)
        scale = jnp.clip(scale, 1e-12, None)
        out = dataclasses.replace(self, verts=centered / scale[:, None, None])
        return out, center, scale
