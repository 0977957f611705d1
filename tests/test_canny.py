"""Differentiable Canny edge net tests (net_canny.py parity)."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_renderer_tpu.ops.canny import canny_edges, gaussian_blur, gaussian_kernel_1d


def test_gaussian_kernel_normalized():
    k = np.asarray(gaussian_kernel_1d(5, 1.0))
    assert abs(k.sum() - 1.0) < 1e-6
    assert k[2] == k.max()  # centered


def test_blur_preserves_constant():
    img = jnp.full((1, 16, 16, 3), 7.0)
    out = np.asarray(gaussian_blur(img))
    np.testing.assert_allclose(out[0, 4:-4, 4:-4], 7.0, atol=1e-4)


def make_square_image(size=48, lo=0.0, hi=255.0):
    img = np.full((size, size), lo, np.float32)
    img[12:36, 12:36] = hi
    return jnp.asarray(img)[None, :, :, None]


def test_canny_finds_square_edges():
    out = canny_edges(make_square_image(), low_threshold=10.0)
    thr = np.asarray(out.thresholded[0])
    assert thr.shape == (48, 48)
    # edges near the square boundary, none in flat interior/exterior
    assert thr[12, 12:36].max() > 0 or thr[11, 12:36].max() > 0
    assert thr[20:28, 20:28].max() == 0.0
    assert thr[:6, :6].max() == 0.0
    # thin edges are a subset of raw magnitude response
    assert (np.asarray(out.thin_edges) <= np.asarray(out.grad_magnitude) + 1e-5).all()


def test_nms_thins_edges():
    out = canny_edges(make_square_image(), low_threshold=10.0)
    early = (np.asarray(out.early_threshold[0]) > 0).sum()
    thin = (np.asarray(out.thresholded[0]) > 0).sum()
    assert 0 < thin < early  # suppression removed non-maxima


def test_orientation_range_and_shapes():
    img = jnp.asarray(np.random.default_rng(0).uniform(0, 255, (2, 32, 32, 3)).astype(np.float32))
    out = canny_edges(img)
    assert out.blurred.shape == (2, 32, 32, 3)
    assert out.grad_magnitude.shape == (2, 32, 32)
    o = np.asarray(out.grad_orientation)
    assert o.min() >= 0.0 and o.max() < 360.0


def test_canny_differentiable():
    img = make_square_image(32)

    def loss(x):
        return jnp.sum(canny_edges(x, low_threshold=5.0).grad_magnitude)

    g = np.asarray(jax.grad(loss)(img))
    assert np.all(np.isfinite(g))
    assert np.abs(g).sum() > 0
