"""Host-side plotting helpers (matplotlib, optional import).

Rebuild of the reference's plot utilities: `image_grid`
(plot_image_grid.py:10-53 — imported as utils.plot_image_grid by
mesh_deformer.py:45) and the GMM-ellipse scatter plots
(GMM.py:10-26, duplicated at pytorch3d_icp_evaluation.py:72-114).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def image_grid(
    images,
    rows: Optional[int] = None,
    cols: Optional[int] = None,
    fill: bool = True,
    show_axes: bool = False,
    rgb: bool = True,
):
    """Display a (N, H, W, C) image batch on a rows x cols grid; returns the
    matplotlib Figure (plot_image_grid.py parity)."""
    import matplotlib.pyplot as plt

    images = np.asarray(images)
    n = images.shape[0]
    if rows is None and cols is None:
        cols = int(np.ceil(np.sqrt(n)))
    if rows is None:
        rows = int(np.ceil(n / cols))
    if cols is None:
        cols = int(np.ceil(n / rows))

    gridspec_kw = {"wspace": 0.0, "hspace": 0.0} if fill else {}
    fig, axarr = plt.subplots(rows, cols, gridspec_kw=gridspec_kw, figsize=(15, 9))
    if fill:
        fig.subplots_adjust(left=0, bottom=0, right=1, top=1)
    for i, ax in enumerate(np.atleast_1d(axarr).ravel()):
        if i < n:
            im = images[i]
            if rgb and im.ndim == 3:
                ax.imshow(im[..., :3])
            else:
                ax.imshow(im[..., 0] if im.ndim == 3 else im)
        if not show_axes:
            ax.set_axis_off()
    return fig


def plot_gaussian_wireframe(mean, cov, ax=None, n_std: float = 2.0, n: int = 24):
    """3D wireframe of a Gaussian's n_std ellipsoid (the reference's
    3D_Gaussian_plot.py sandbox, component 19)."""
    import matplotlib.pyplot as plt

    mean = np.asarray(mean, np.float64).reshape(3)
    cov = np.asarray(cov, np.float64).reshape(3, 3)
    if ax is None:
        fig = plt.figure()
        ax = fig.add_subplot(projection="3d")
    w, V = np.linalg.eigh(cov)
    radii = n_std * np.sqrt(np.clip(w, 0, None))
    u = np.linspace(0, 2 * np.pi, n)
    v = np.linspace(0, np.pi, n)
    sphere = np.stack(
        [np.outer(np.cos(u), np.sin(v)), np.outer(np.sin(u), np.sin(v)),
         np.outer(np.ones_like(u), np.cos(v))], axis=-1,
    )  # (n, n, 3)
    pts = sphere * radii[None, None] @ V.T + mean
    ax.plot_wireframe(pts[..., 0], pts[..., 1], pts[..., 2],
                      rstride=2, cstride=2, alpha=0.4)
    return ax


def plot_gmm_ellipses(gmm, points=None, ax=None, n_std: float = 2.0):
    """Scatter 2D points with the GMM's covariance ellipses overlaid
    (GMM.py:10-26 parity, for DiagGMM over any 2 dims)."""
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse

    if ax is None:
        _, ax = plt.subplots()
    if points is not None:
        pts = np.asarray(points)
        ax.scatter(pts[:, 0], pts[:, 1], s=4, alpha=0.5)
    means = np.asarray(gmm.means)[:, :2]
    var = np.asarray(gmm.var)[:, :2]
    weights = np.asarray(gmm.weights)
    for mu, v, w in zip(means, var, weights):
        e = Ellipse(
            mu, 2 * n_std * np.sqrt(v[0]), 2 * n_std * np.sqrt(v[1]),
            alpha=min(0.8, max(0.1, float(w))), facecolor="C1", edgecolor="k",
        )
        ax.add_patch(e)
    return ax
