"""Fused Pallas tile-bin gather: parity + gradients vs a reference einsum.

Runs in interpret mode on CPU (conftest forces cpu); the compiled kernel is
exercised on TPU by bench.py and the binned rasterizer paths, which dispatch
to it via binning.gather_bin_channels."""

import jax
import jax.numpy as jnp
import numpy as np

from torch_renderer_tpu.rasterize.pallas_gather import gather_tiles


def _ref_gather(idx, table):
    """Reference: one-hot einsum (the XLA path's math)."""
    F = table.shape[1]
    onehot = (idx[..., None] == jnp.arange(F)[None, None, None, :]) & (
        idx[..., None] >= 0
    )
    return jnp.einsum(
        "btkf,bfc->btkc", onehot.astype(table.dtype), table,
        precision=jax.lax.Precision.HIGHEST,
    )


def _case(B=2, T=24, Fmax=16, F=200, C=12, seed=0):
    rng = np.random.RandomState(seed)
    # slot ids: valid prefix with ascending unique-ish ids, -1 tail
    idx = np.full((B, T, Fmax), -1, np.int32)
    for b in range(B):
        for t in range(T):
            n = rng.randint(0, Fmax + 1)
            idx[b, t, :n] = np.sort(rng.choice(F, size=n, replace=False))
    table = rng.randn(B, F, C).astype(np.float32)
    return jnp.asarray(idx), jnp.asarray(table)


def test_gather_tiles_matches_einsum():
    idx, table = _case()
    out = gather_tiles(idx, table)
    ref = _ref_gather(idx, table)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_gather_tiles_odd_sizes():
    # T not a multiple of the kernel's tile-group, F not of 128
    idx, table = _case(B=1, T=5, Fmax=8, F=130, C=3, seed=1)
    out = gather_tiles(idx, table)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_gather(idx, table)), atol=1e-6
    )


def test_gather_tiles_grad_matches_einsum():
    idx, table = _case(B=2, T=8, Fmax=8, F=96, C=4, seed=2)
    w = jnp.cos(jnp.arange(out_size := 2 * 8 * 8 * 4, dtype=jnp.float32))
    w = w.reshape(2, 8, 8, 4)

    g_p = jax.grad(lambda t: jnp.sum(gather_tiles(idx, t) * w))(table)
    g_r = jax.grad(lambda t: jnp.sum(_ref_gather(idx, t) * w))(table)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r), atol=1e-5)
    assert float(jnp.linalg.norm(g_p)) > 0


def test_gather_tiles_multi_chunk_faces():
    # F large enough to exercise the in-kernel face-chunk loop on TPU
    # (chunk width caps at 2048); interpret mode follows the same path
    idx, table = _case(B=1, T=8, Fmax=8, F=2300, C=2, seed=3)
    out = gather_tiles(idx, table)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref_gather(idx, table)), atol=1e-6
    )
