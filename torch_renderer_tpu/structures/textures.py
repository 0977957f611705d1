"""Texture containers — TPU-native equivalents of pytorch3d TexturesVertex /
TexturesUV (consumed at reference camera_pose_optimizer.py:92-93,
deform_mesh_with_color.py:269-271,329, mesh_deformer.py:171-173).

Both are plain padded pytrees; sampling happens in shading (gather +
barycentric interpolation for vertex colors, bilinear map lookup for UV).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def _texsample_supported(Hm: int, Wm: int, C: int) -> bool:
    from ..ops.pallas_texsample import supported

    return supported(Hm, Wm, C)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TexturesVertex:
    """Per-vertex features (usually RGB): (B, V, C)."""

    verts_features: jax.Array

    def extend(self, n: int) -> "TexturesVertex":
        return TexturesVertex(jnp.repeat(self.verts_features, n, axis=0))

    def face_features(self, faces: jax.Array) -> jax.Array:
        """Gather per-face-vertex features: faces (B, F, 3) -> (B, F, 3, C).

        One-hot MXU gather on TPU (ops.rowops) — (V, C) row gathers run
        nearly scalar there and their backward is a serializing scatter."""
        from ..ops.rowops import take_rows

        F, C = faces.shape[1], self.verts_features.shape[-1]
        return jax.vmap(
            lambda feats, f: take_rows(feats, f.reshape(-1)).reshape(F, 3, C)
        )(self.verts_features, faces)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TexturesUV:
    """UV-mapped texture: maps (B, Hm, Wm, C) in [0,1], verts_uvs (B, VT, 2)
    with pytorch3d convention (u right, v up, origin bottom-left of the map),
    faces_uvs (B, F, 3) indexing verts_uvs."""

    maps: jax.Array
    faces_uvs: jax.Array
    verts_uvs: jax.Array

    def extend(self, n: int) -> "TexturesUV":
        return TexturesUV(
            jnp.repeat(self.maps, n, axis=0),
            jnp.repeat(self.faces_uvs, n, axis=0),
            jnp.repeat(self.verts_uvs, n, axis=0),
        )

    def face_uvs(self, _faces_unused: Optional[jax.Array] = None) -> jax.Array:
        """Per-face-corner UVs: (B, F, 3, 2); one-hot MXU gather on TPU."""
        from ..ops.rowops import take_rows

        F = self.faces_uvs.shape[1]
        return jax.vmap(
            lambda uvs, f: take_rows(uvs, f.reshape(-1)).reshape(F, 3, 2)
        )(self.verts_uvs, self.faces_uvs)

    def sample(self, uv: jax.Array, method: str = "auto") -> jax.Array:
        """Bilinear sample of the map at uv (B, ..., 2) -> (B, ..., C).

        Differentiable wrt both `maps` and `uv` (needed by the joint
        shape+texture optimizer, reference deform_mesh_with_color.py:269-306).

        On TPU the sample is a separable 2-hot matmul (row weights @ map,
        then a column-weight contraction): its autodiff emits transposed
        MATMULS for d(maps) instead of the scatter-add that the gather
        formulation produces — TPU scatters serialize and dominated the
        joint-fit step (~60 of 87 ms). Off-TPU the cheap gather is used.
        Both paths compute identical values and gradients (tested)."""
        Hm, Wm = self.maps.shape[1], self.maps.shape[2]
        u = jnp.clip(uv[..., 0], 0.0, 1.0)
        v = jnp.clip(uv[..., 1], 0.0, 1.0)
        # pytorch3d convention: v=0 is the bottom row of the image.
        x = u * (Wm - 1)
        y = (1.0 - v) * (Hm - 1)
        x0 = jnp.clip(jnp.floor(x), 0, Wm - 2).astype(jnp.int32)
        y0 = jnp.clip(jnp.floor(y), 0, Hm - 2).astype(jnp.int32)
        wx = x - x0
        wy = y - y0

        if method == "pallas" or (
            method == "auto" and jax.default_backend() == "tpu"
            and _texsample_supported(Hm, Wm, self.maps.shape[-1])
        ):
            return self._sample_pallas(y0, x0, wy, wx)
        use_matmul = method == "matmul" or (
            method == "auto" and jax.default_backend() == "tpu"
        )
        if use_matmul:
            return self._sample_matmul(y0, x0, wy, wx)

        def gather(maps_b, y0b, x0b):
            c00 = maps_b[y0b, x0b]
            c01 = maps_b[y0b, x0b + 1]
            c10 = maps_b[y0b + 1, x0b]
            c11 = maps_b[y0b + 1, x0b + 1]
            return c00, c01, c10, c11

        c00, c01, c10, c11 = jax.vmap(gather)(self.maps, y0, x0)
        wxe = wx[..., None]
        wye = wy[..., None]
        top = c00 * (1 - wxe) + c01 * wxe
        bot = c10 * (1 - wxe) + c11 * wxe
        return top * (1 - wye) + bot * wye

    def _sample_pallas(self, y0, x0, wy, wx):
        """Fused Pallas bilinear sampler (ops.pallas_texsample): both 2-hot
        contractions stay in VMEM, so the (points, Wm*C) rows slab the
        matmul path writes to HBM (~6 ms of the 14.5 ms joint-fit step)
        never materializes. Exact same math as _sample_matmul."""
        from ..ops.pallas_texsample import sample_bilinear_pallas

        B = self.maps.shape[0]
        shape = y0.shape
        P = int(np.prod(shape[1:])) if len(shape) > 1 else 1
        out = sample_bilinear_pallas(
            self.maps,
            y0.reshape(B, P), x0.reshape(B, P),
            wy.reshape(B, P), wx.reshape(B, P),
        )
        return out.reshape(shape + (self.maps.shape[-1],))

    def _sample_matmul(self, y0, x0, wy, wx, point_chunk: int = 16384):
        """Separable bilinear sampling via weighted 2-hot contractions.

        sampled[p, c] = sum_yx oy[p, y] ox[p, x] map[y, x, c] with
        oy = (1-wy)*onehot(y0) + wy*onehot(y0+1) (same for ox): one MXU
        matmul over rows then an elementwise column contraction. The 2-hot
        weights carry the bilinear derivative, so gradients wrt uv flow
        through wy/wx and gradients wrt maps are the transposed matmuls."""
        B = self.maps.shape[0]
        Hm, Wm, C = self.maps.shape[1], self.maps.shape[2], self.maps.shape[3]
        shape = y0.shape  # (B, ...)
        P = int(np.prod(shape[1:])) if len(shape) > 1 else 1

        y0f = y0.reshape(B, P)
        x0f = x0.reshape(B, P)
        wyf = wy.reshape(B, P)
        wxf = wx.reshape(B, P)

        n_chunks = -(-P // point_chunk)
        padp = n_chunks * point_chunk - P
        padc = lambda a: jnp.pad(a, ((0, 0), (0, padp))).reshape(
            B, n_chunks, point_chunk
        ).swapaxes(0, 1)  # (n_chunks, B, pc)

        iota_y = jnp.arange(Hm, dtype=jnp.int32)[None, None, :]
        iota_x = jnp.arange(Wm, dtype=jnp.int32)[None, None, :]
        maps = self.maps.reshape(B, Hm, Wm * C)

        @jax.checkpoint  # recompute the 2-hots in backward, never store
        def chunk_sample(args):
            y0c, x0c, wyc, wxc = args             # (B, pc) each
            h0y = (y0c[..., None] == iota_y).astype(jnp.float32)
            h1y = (y0c[..., None] + 1 == iota_y).astype(jnp.float32)
            oy = h0y * (1.0 - wyc[..., None]) + h1y * wyc[..., None]
            h0x = (x0c[..., None] == iota_x).astype(jnp.float32)
            h1x = (x0c[..., None] + 1 == iota_x).astype(jnp.float32)
            ox = h0x * (1.0 - wxc[..., None]) + h1x * wxc[..., None]
            rows = jnp.einsum(
                "bph,bhz->bpz", oy, maps,
                precision=jax.lax.Precision.HIGHEST,
            ).reshape(oy.shape[0], oy.shape[1], Wm, C)
            return jnp.sum(rows * ox[..., None], axis=2)   # (B, pc, C)

        out = jax.lax.map(
            chunk_sample, (padc(y0f), padc(x0f), padc(wyf), padc(wxf))
        )  # (n_chunks, B, pc, C)
        out = out.swapaxes(0, 1).reshape(B, n_chunks * point_chunk, C)[:, :P]
        return out.reshape(shape + (C,))


def sphere_uv_mapping(verts) -> "jax.Array":
    """Spherical UV coordinates for a star-shaped mesh: (V, 2) in [0, 1].

    u = azimuth / 2pi, v = 0.5 + asin(y/r)/pi. Used to give generated
    primitives (ops.icosphere) a TexturesUV parameterization for the joint
    shape+texture optimizer (reference deform_mesh_with_color.py:269-271
    loads UVs from the cow OBJ; generated meshes need a synthetic chart).
    The seam at u=0/1 is shared by a few faces — harmless when the map itself
    is the optimization variable."""
    import numpy as np

    v = np.asarray(verts, np.float64)
    r = np.clip(np.linalg.norm(v, axis=-1), 1e-12, None)
    u = (np.arctan2(v[:, 0], v[:, 2]) / (2.0 * np.pi)) % 1.0
    w = 0.5 + np.arcsin(np.clip(v[:, 1] / r, -1.0, 1.0)) / np.pi
    return jnp.asarray(np.stack([u, w], axis=-1), jnp.float32)
