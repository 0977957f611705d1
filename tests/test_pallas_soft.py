"""Pallas fused soft-silhouette kernel vs the streaming oracle (values+grads).

Runs in pallas interpret mode on the CPU backend (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.rasterize.geometry import setup_faces
from torch_renderer_tpu.rasterize.pallas_soft import (
    soft_silhouette_pallas,
    suggest_faces_per_tile,
)
from torch_renderer_tpu.rasterize.soft import soft_silhouette_streaming
from torch_renderer_tpu.structures.meshes import Meshes

IMG = 32
B = 2


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(1)  # 80 faces
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * IMG
    K = np.array([[f, 0, IMG / 2], [0, f, IMG / 2], [0, 0, 1]], np.float32)
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
    t = np.stack([
        np.array([0.0, 0.0, 3.0], np.float32),
        np.array([0.15, -0.1, 2.6], np.float32),
    ])
    cam = PerspectiveCamera.from_K(K, (IMG, IMG), R=R, t=t)
    return meshes, cam


def test_suggest_faces_per_tile(scene):
    meshes, cam = scene
    fd = setup_faces(meshes, cam)
    fpt = suggest_faces_per_tile(fd, (IMG, IMG), tile=16, multiple=8)
    assert 8 <= fpt <= 80


def test_values_match_streaming(scene):
    meshes, cam = scene
    want = np.asarray(soft_silhouette_streaming(meshes, cam))
    got = np.asarray(
        soft_silhouette_pallas(meshes, cam, tile=16, faces_per_tile=80)
    )
    assert got.shape == want.shape == (B, IMG, IMG)
    np.testing.assert_allclose(got, want, atol=1e-4)
    assert want.max() > 0.9  # scene actually covers pixels


def test_gradients_match_streaming(scene):
    meshes, cam = scene

    def loss_pallas(v):
        return jnp.sum(
            soft_silhouette_pallas(
                meshes.update_padded(v), cam, tile=16, faces_per_tile=80
            )
        )

    def loss_ref(v):
        return jnp.sum(soft_silhouette_streaming(meshes.update_padded(v), cam))

    g1 = np.asarray(jax.grad(loss_pallas)(meshes.verts))
    g2 = np.asarray(jax.grad(loss_ref)(meshes.verts))
    assert np.all(np.isfinite(g1))
    assert np.abs(g1).sum() > 0
    np.testing.assert_allclose(g1, g2, atol=5e-3, rtol=5e-3)


def test_gradients_under_jit_and_scan(scene):
    """The kernel must be usable inside the jitted pose-fit scan."""
    meshes, cam = scene

    @jax.jit
    def two_steps(v):
        def body(v, _):
            g = jax.grad(
                lambda vv: jnp.sum(
                    soft_silhouette_pallas(
                        meshes.update_padded(vv), cam, faces_per_tile=80
                    )
                )
            )(v)
            return v - 1e-3 * g, jnp.sum(jnp.abs(g))
        return jax.lax.scan(body, v, None, length=2)

    v, gs = two_steps(meshes.verts)
    assert np.all(np.isfinite(np.asarray(v)))
    assert float(gs[0]) > 0
