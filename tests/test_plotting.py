"""Plot helper smoke tests (Agg backend)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import numpy as np

from torch_renderer_tpu.ops.gmm import gmm_fit
from torch_renderer_tpu.utils.plotting import (
    image_grid,
    plot_gaussian_wireframe,
    plot_gmm_ellipses,
)


def test_image_grid_layout():
    imgs = np.random.default_rng(0).uniform(size=(6, 8, 8, 3))
    fig = image_grid(imgs, rows=2, cols=3)
    assert len(fig.axes) == 6
    fig2 = image_grid(imgs)  # auto grid
    assert len(fig2.axes) >= 6


def test_gmm_ellipses_plot():
    X = jnp.asarray(
        np.random.default_rng(1).standard_normal((200, 2)).astype(np.float32)
    )
    gmm = gmm_fit(jax.random.PRNGKey(0), X, 3, n_iter=5)
    ax = plot_gmm_ellipses(gmm, points=X)
    assert len(ax.patches) == 3


def test_gaussian_wireframe():
    ax = plot_gaussian_wireframe([0, 0, 0], np.diag([1.0, 2.0, 0.5]))
    assert ax is not None
