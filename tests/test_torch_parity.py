"""Independent-oracle parity: our soft silhouette vs torch autograd.

The north-star requires pixel- AND gradient-parity against the reference
stack (BASELINE.md). PyTorch3D itself is not in this image, so the oracle is
a torch (CPU) implementation of the same SoftRas math with *autograd*
gradients — independent of both our XLA autodiff path and the hand-derived
Pallas custom-VJP backward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
from torch_renderer_tpu.ops.icosphere import icosphere
from torch_renderer_tpu.rasterize.pallas_soft import soft_silhouette_pallas
from torch_renderer_tpu.rasterize.soft import soft_silhouette_streaming
from torch_renderer_tpu.structures.meshes import Meshes

IMG = 32
SIGMA = 1e-4
F_PIX = 0.8 * IMG
TVEC = np.array([0.05, -0.03, 2.8], np.float32)


@pytest.fixture(scope="module")
def scene():
    verts, faces = icosphere(1)
    return verts, faces


def torch_soft_silhouette(verts_np, faces_np, requires_grad=False):
    """SoftRas coverage in torch: same projection/edge-distance math as the
    framework, evaluated with torch ops so autograd provides the oracle
    gradient."""
    verts = torch.tensor(verts_np, requires_grad=requires_grad)
    faces = torch.tensor(faces_np, dtype=torch.long)
    s = IMG / 2.0

    cam = verts + torch.tensor(TVEC)
    z = cam[:, 2].clamp_min(1e-5)
    u = (F_PIX * cam[:, 0] / z + IMG / 2.0 - IMG / 2.0) / s
    v = (F_PIX * cam[:, 1] / z + IMG / 2.0 - IMG / 2.0) / s
    pts = torch.stack([u, v], -1)
    tri = pts[faces]  # (F, 3, 2)

    ys = (torch.arange(IMG, dtype=torch.float32) + 0.5 - IMG / 2.0) / s
    yy, xx = torch.meshgrid(ys, ys, indexing="ij")
    pix = torch.stack([xx.reshape(-1), yy.reshape(-1)], -1)  # (P, 2)

    p = pix[:, None, :]
    q0, q1, q2 = tri[:, 0], tri[:, 1], tri[:, 2]
    area2 = (q1[:, 0] - q0[:, 0]) * (q2[:, 1] - q0[:, 1]) - (
        q1[:, 1] - q0[:, 1]
    ) * (q2[:, 0] - q0[:, 0])

    d2 = None
    inside = torch.ones(pix.shape[0], tri.shape[0], dtype=torch.bool)
    for qa, qb in ((q0, q1), (q1, q2), (q2, q0)):
        g = (qb - qa)[None]
        w = p - qa[None]
        cross = g[..., 0] * w[..., 1] - g[..., 1] * w[..., 0]
        inside = inside & ((cross * torch.sign(area2)[None]) >= 0)
        len2 = (g * g).sum(-1).clamp_min(1e-12)
        t = ((w * g).sum(-1) / len2).clamp(0.0, 1.0)
        dd = (w * w).sum(-1) - 2 * t * (w * g).sum(-1) + t * t * len2
        dd = dd.clamp_min(0.0)
        d2 = dd if d2 is None else torch.minimum(d2, dd)

    signed = torch.where(inside, -d2, d2)
    S = torch.nn.functional.softplus(-signed / SIGMA).sum(-1)
    alpha = 1.0 - torch.exp(-S)
    return verts, alpha.reshape(IMG, IMG)


def _ours(verts_np, faces_np, impl):
    meshes = Meshes.from_single(verts_np, faces_np)
    K = np.array(
        [[F_PIX, 0, IMG / 2], [0, F_PIX, IMG / 2], [0, 0, 1]], np.float32
    )
    cam = PerspectiveCamera.from_K(K, (IMG, IMG), t=TVEC)

    def render(v):
        m = meshes.update_padded(v)
        if impl == "pallas":
            return soft_silhouette_pallas(m, cam, sigma=SIGMA, faces_per_tile=80)
        return soft_silhouette_streaming(m, cam, sigma=SIGMA)

    return meshes, render


@pytest.mark.parametrize("impl", ["streaming", "pallas"])
def test_pixel_parity_vs_torch(scene, impl):
    verts, faces = scene
    _, alpha_t = torch_soft_silhouette(verts, faces)
    meshes, render = _ours(verts, faces, impl)
    ours = np.asarray(render(meshes.verts))[0]
    np.testing.assert_allclose(ours, alpha_t.detach().numpy(), atol=2e-4)
    assert ours.max() > 0.9


@pytest.mark.parametrize("impl", ["streaming", "pallas"])
def test_gradient_parity_vs_torch_autograd(scene, impl):
    verts, faces = scene
    tverts, alpha_t = torch_soft_silhouette(verts, faces, requires_grad=True)
    alpha_t.sum().backward()
    g_torch = tverts.grad.numpy()

    meshes, render = _ours(verts, faces, impl)
    g_ours = np.asarray(
        jax.grad(lambda v: jnp.sum(render(v)))(meshes.verts)
    )[0]

    assert np.all(np.isfinite(g_ours))
    scale = np.abs(g_torch).max()
    np.testing.assert_allclose(g_ours / scale, g_torch / scale, atol=2e-3)
