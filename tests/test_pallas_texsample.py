"""Fused Pallas bilinear texture sampler vs the gather oracle.

The kernel (ops/pallas_texsample.py) must match TexturesUV's gather
formulation exactly in values and in gradients wrt the map AND the uv
coordinates (the joint shape+texture fit differentiates through both —
reference deform_mesh_with_color.py:269-306). Runs in interpret mode on
the CPU conftest platform; the same code compiles on TPU."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from torch_renderer_tpu.ops.pallas_texsample import supported
from torch_renderer_tpu.structures.textures import TexturesUV


def _mk(B, Hm, Wm, C, P, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    maps = jax.random.uniform(k1, (B, Hm, Wm, C), jnp.float32)
    uv = jax.random.uniform(k2, (B, P, 2), jnp.float32)
    faces_uvs = jnp.zeros((B, 1, 3), jnp.int32)
    verts_uvs = jnp.zeros((B, 3, 2), jnp.float32)
    return TexturesUV(maps, faces_uvs, verts_uvs), uv


@pytest.mark.parametrize(
    "Hm,Wm,C,P",
    [
        (64, 64, 3, 1000),   # typical RGB map, non-block-multiple points
        (32, 100, 4, 257),   # Wm not a 128-multiple, RGBA
        (20, 16, 1, 64),     # Hm not an 8-multiple, single channel
    ],
)
def test_pallas_matches_gather_values_and_grads(Hm, Wm, C, P):
    tex, uv = _mk(2, Hm, Wm, C, P)

    def run(method):
        def loss(maps, uv):
            t = TexturesUV(maps, tex.faces_uvs, tex.verts_uvs)
            s = t.sample(uv, method=method)
            # weighted sum so every output element gets a distinct cotangent
            w = jnp.arange(s.size, dtype=jnp.float32).reshape(s.shape)
            return jnp.sum(s * jnp.sin(w)), s

        (val, s), grads = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(tex.maps, uv)
        return s, grads

    s_ref, (gm_ref, gu_ref) = run("gather")
    s_pl, (gm_pl, gu_pl) = run("pallas")
    np.testing.assert_allclose(s_pl, s_ref, atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(gm_pl, gm_ref, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(gu_pl, gu_ref, atol=1e-3, rtol=1e-3)


def test_pallas_matches_matmul_path():
    tex, uv = _mk(1, 48, 48, 3, 512, seed=3)
    s_mm = tex.sample(uv, method="matmul")
    s_pl = tex.sample(uv, method="pallas")
    np.testing.assert_allclose(s_pl, s_mm, atol=1e-5, rtol=1e-5)


def test_supported_gate():
    assert supported(256, 256, 3)
    assert not supported(1024, 1024, 3)  # 12.6 MB map exceeds VMEM budget
    assert not supported(8, 8, 16)       # C > 8


def test_pallas_multidim_points_shape():
    tex, _ = _mk(2, 16, 16, 3, 8)
    uv = jax.random.uniform(jax.random.PRNGKey(9), (2, 5, 7, 2))
    s = tex.sample(uv, method="pallas")
    assert s.shape == (2, 5, 7, 3)
    np.testing.assert_allclose(
        s, tex.sample(uv, method="gather"), atol=1e-5, rtol=1e-5
    )
