"""Light and material models (pytorch3d-compatible defaults).

Replaces pytorch3d PointLights / DirectionalLights / Materials (reference
torch_renderer.py:132, camera_pose_optimizer.py:144) as plain pytrees consumed
by pure shading functions.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def _c3(x) -> jax.Array:
    a = jnp.asarray(x, jnp.float32)
    if a.ndim == 1:
        a = a[None]
    return a


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PointLights:
    """Point lights; colors/locations broadcast over the batch: (B|1, 3).

    Defaults match pytorch3d (ambient 0.5, diffuse 0.3, specular 0.2)."""

    location: jax.Array
    ambient_color: jax.Array
    diffuse_color: jax.Array
    specular_color: jax.Array

    @staticmethod
    def make(location=((0.0, 0.0, -3.0),), ambient=((0.5,) * 3,),
             diffuse=((0.3,) * 3,), specular=((0.2,) * 3,)) -> "PointLights":
        return PointLights(_c3(location), _c3(ambient), _c3(diffuse), _c3(specular))

    def direction_to(self, points: jax.Array) -> jax.Array:
        """Unit vector from surface points (B, ..., 3) toward the light."""
        loc = self.location.reshape((self.location.shape[0],) + (1,) * (points.ndim - 2) + (3,))
        d = loc - points
        return d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12, None)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DirectionalLights:
    """Directional lights (direction points FROM the light, pytorch3d style)."""

    direction: jax.Array
    ambient_color: jax.Array
    diffuse_color: jax.Array
    specular_color: jax.Array

    @staticmethod
    def make(direction=((0.0, 1.0, 0.0),), ambient=((0.5,) * 3,),
             diffuse=((0.3,) * 3,), specular=((0.2,) * 3,)) -> "DirectionalLights":
        return DirectionalLights(_c3(direction), _c3(ambient), _c3(diffuse), _c3(specular))

    def direction_to(self, points: jax.Array) -> jax.Array:
        d = self.direction.reshape(
            (self.direction.shape[0],) + (1,) * (points.ndim - 2) + (3,)
        )
        d = -d  # toward the light
        return jnp.broadcast_to(
            d / jnp.clip(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12, None),
            points.shape,
        )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Materials:
    """Phong material (pytorch3d defaults: all-ones colors, shininess 64)."""

    ambient_color: jax.Array
    diffuse_color: jax.Array
    specular_color: jax.Array
    shininess: jax.Array

    @staticmethod
    def make(ambient=((1.0,) * 3,), diffuse=((1.0,) * 3,), specular=((1.0,) * 3,),
             shininess=64.0) -> "Materials":
        return Materials(
            _c3(ambient), _c3(diffuse), _c3(specular),
            jnp.asarray([shininess], jnp.float32),
        )
