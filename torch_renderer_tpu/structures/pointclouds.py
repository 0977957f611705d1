"""Padded batched point clouds — TPU-native pytorch3d.structures.Pointclouds.

The reference builds ragged Pointclouds lists (points_padded/points_list at
pytorch3d_icp_registeration.py:93,142,165); here clouds are always padded
(B, P, 3) with valid counts, which is what batched chamfer/ICP kernels want.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Pointclouds:
    points: jax.Array  # (B, P, 3) float32, zero-padded
    num_points: jax.Array  # (B,) int32
    features: Optional[jax.Array] = None  # (B, P, C) or None

    @staticmethod
    def from_lists(
        points_list: Sequence, features_list: Optional[Sequence] = None,
        pad_to: Optional[int] = None,
    ) -> "Pointclouds":
        pts = [np.asarray(p, np.float32) for p in points_list]
        P = pad_to or max(p.shape[0] for p in pts)

        def pad(a):
            out = np.zeros((P,) + a.shape[1:], dtype=a.dtype)
            out[: a.shape[0]] = a
            return out

        feats = None
        if features_list is not None:
            feats = jnp.asarray(
                np.stack([pad(np.asarray(f, np.float32)) for f in features_list])
            )
        return Pointclouds(
            points=jnp.asarray(np.stack([pad(p) for p in pts])),
            num_points=jnp.asarray([p.shape[0] for p in pts], jnp.int32),
            features=feats,
        )

    @staticmethod
    def from_padded(points: jax.Array, num_points=None, features=None) -> "Pointclouds":
        if points.ndim == 2:
            points = points[None]
        if num_points is None:
            num_points = jnp.full((points.shape[0],), points.shape[1], jnp.int32)
        return Pointclouds(points=points, num_points=num_points, features=features)

    @property
    def batch_size(self) -> int:
        return self.points.shape[0]

    @property
    def max_points(self) -> int:
        return self.points.shape[1]

    def mask(self) -> jax.Array:
        """(B, P) float validity mask."""
        return (
            jnp.arange(self.max_points)[None, :] < self.num_points[:, None]
        ).astype(self.points.dtype)

    def extend(self, n: int) -> "Pointclouds":
        rep = lambda a: None if a is None else jnp.repeat(a, n, axis=0)
        return Pointclouds(rep(self.points), rep(self.num_points), rep(self.features))

    def transform(self, R: jax.Array, t: jax.Array) -> "Pointclouds":
        """Apply batched rigid transform x' = R x + t (masked)."""
        p = jnp.einsum("bij,bpj->bpi", R, self.points) + t[:, None, :]
        return dataclasses.replace(self, points=p * self.mask()[..., None])

    def centroids(self) -> jax.Array:
        """(B, 3) masked means."""
        m = self.mask()[..., None]
        n = jnp.clip(self.num_points.astype(self.points.dtype), 1, None)[:, None]
        return jnp.sum(self.points * m, axis=1) / n

    def detach_to_lists(self) -> List[np.ndarray]:
        n = np.asarray(self.num_points)
        pts = np.asarray(self.points)
        return [pts[b, : n[b]] for b in range(self.batch_size)]

    # -- pytorch3d-style accessors (reference pytorch3d_icp_registeration.py
    # :93,142 uses points_padded/points_list) ---------------------------------
    def points_padded(self) -> jax.Array:
        return self.points

    def points_list(self) -> List[np.ndarray]:
        return self.detach_to_lists()

    def num_points_per_cloud(self) -> jax.Array:
        return self.num_points
