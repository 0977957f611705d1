"""Diagonal-covariance Gaussian mixture model — on-device EM fit + sampling.

Replaces sklearn.mixture.GaussianMixture in the GMM pose-search loop
(reference pytorch3d_icp_evaluation.py:185,205-239 fits/samples on the host
CPU every iteration, forcing a device->host->device ping-pong per step —
SURVEY.md §3.5). Here fit and sample are jittable, so the whole
cross-entropy-style pose search stays on the TPU.

k-means++-style seeding: first center uniform, subsequent centers sampled
proportionally to squared distance from the chosen set.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DiagGMM:
    weights: jax.Array  # (K,)
    means: jax.Array    # (K, D)
    var: jax.Array      # (K, D) diagonal covariances


def _kmeanspp_init(key: jax.Array, X: jax.Array, k: int) -> jax.Array:
    n = X.shape[0]
    k0, key = jax.random.split(key)
    first = jax.random.randint(k0, (), 0, n)
    centers = jnp.zeros((k, X.shape[1]), X.dtype).at[0].set(X[first])

    def body(i, carry):
        centers, key = carry
        d2 = jnp.min(
            jnp.sum((X[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
            + jnp.where(jnp.arange(k)[None, :] < i, 0.0, 1e30),
            axis=-1,
        )
        key, kc = jax.random.split(key)
        idx = jax.random.categorical(kc, jnp.log(jnp.clip(d2, 1e-12, None)))
        return centers.at[i].set(X[idx]), key

    centers, _ = jax.lax.fori_loop(1, k, body, (centers, key))
    return centers


def gmm_fit(
    key: jax.Array,
    X: jax.Array,
    n_components: int,
    n_iter: int = 20,
    reg_covar: float = 1e-6,
) -> DiagGMM:
    """EM fit of a diagonal GMM to X (N, D)."""
    n, d = X.shape
    means = _kmeanspp_init(key, X, n_components)
    var = jnp.broadcast_to(jnp.var(X, axis=0) + reg_covar, (n_components, d))
    weights = jnp.full((n_components,), 1.0 / n_components, X.dtype)

    def em_step(state, _):
        weights, means, var = state
        # E-step: log responsibilities (N, K)
        diff = X[:, None, :] - means[None]  # (N, K, D)
        logp = (
            -0.5 * jnp.sum(diff * diff / var[None], axis=-1)
            - 0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * var), axis=-1)[None]
            + jnp.log(jnp.clip(weights, 1e-12, None))[None]
        )
        logr = logp - jax.nn.logsumexp(logp, axis=-1, keepdims=True)
        r = jnp.exp(logr)
        # M-step
        nk = jnp.clip(jnp.sum(r, axis=0), 1e-8, None)  # (K,)
        new_means = (r.T @ X) / nk[:, None]
        d2 = (X[:, None, :] - new_means[None]) ** 2
        new_var = jnp.einsum("nk,nkd->kd", r, d2) / nk[:, None] + reg_covar
        new_w = nk / n
        return (new_w, new_means, new_var), None

    (weights, means, var), _ = jax.lax.scan(
        em_step, (weights, means, var), None, length=n_iter
    )
    return DiagGMM(weights=weights, means=means, var=var)


def gmm_sample(key: jax.Array, gmm: DiagGMM, n: int) -> jax.Array:
    """Draw n samples (n, D)."""
    kc, kn = jax.random.split(key)
    comp = jax.random.categorical(
        kc, jnp.log(jnp.clip(gmm.weights, 1e-12, None)), shape=(n,)
    )
    mu = gmm.means[comp]
    sd = jnp.sqrt(gmm.var[comp])
    return mu + sd * jax.random.normal(kn, mu.shape, dtype=mu.dtype)


def gmm_log_prob(gmm: DiagGMM, X: jax.Array) -> jax.Array:
    """Log density of X (N, D) under the mixture -> (N,)."""
    diff = X[:, None, :] - gmm.means[None]
    logp = (
        -0.5 * jnp.sum(diff * diff / gmm.var[None], axis=-1)
        - 0.5 * jnp.sum(jnp.log(2.0 * jnp.pi * gmm.var), axis=-1)[None]
        + jnp.log(jnp.clip(gmm.weights, 1e-12, None))[None]
    )
    return jax.nn.logsumexp(logp, axis=-1)
