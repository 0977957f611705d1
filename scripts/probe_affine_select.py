#!/usr/bin/env python
"""Probe: MXU-affine K=1/blur=0 selection vs the VPU channel form.

Hypothesis: at blur=0 every per-(pixel, face) selection quantity is
AFFINE in pixel coords — edge functions e_k(p) = A_k.px + B_k.py + C_k
and the interpolated inverse depth denom(p) = Σ b_k.invz_k (inverse
depth interpolates linearly in screen space). So the whole (tp, F)
selection slab can be built as four (tp, 3) @ (3, F) dots on the MXU
(~3 MACs/pair) plus VPU sign tests + argmin, instead of ~35 VPU ops per
pair in the current fused iota-argmin (the 5.4 ms dominator of the
720p 12-view depth call).

Selection key: argmin z == argmax denom for inside pixels (b sums to 1),
so the probe orders by -denom — division-free. Winner parity vs the
reference form is checked (ties at eps can differ; count them).

Run on TPU: python scripts/probe_affine_select.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from torch_renderer_tpu.rasterize.geometry import channel_edge_bary

INF = 3.0e38


def make_inputs(key, n_tiles, tile, F, znear=0.01):
    """Synthetic gathered channels shaped like the 720p chunk: (c, 1, F)
    channel rows + (c, tp, 1) pixel coords (NDC-ish units)."""
    tp = tile * tile
    ks = jax.random.split(key, 8)
    # random small triangles in [-1, 1]^2, z in [1, 4]
    c0 = jax.random.uniform(ks[0], (n_tiles, 1, F, 2), minval=-1, maxval=1)
    off1 = jax.random.normal(ks[1], (n_tiles, 1, F, 2)) * 0.15
    off2 = jax.random.normal(ks[2], (n_tiles, 1, F, 2)) * 0.15
    z = jax.random.uniform(ks[3], (n_tiles, 1, F, 3), minval=1.0, maxval=4.0)
    qx = [c0[..., 0], (c0 + off1)[..., 0], (c0 + off2)[..., 0]]
    qy = [c0[..., 1], (c0 + off1)[..., 1], (c0 + off2)[..., 1]]
    invz = [1.0 / z[..., k] for k in range(3)]
    valid = (jax.random.uniform(ks[4], (n_tiles, 1, F)) > 0.1).astype(
        jnp.float32
    )
    # tile-local pixel grid around a random origin
    orig = jax.random.uniform(ks[5], (n_tiles, 1, 2), minval=-1, maxval=0.8)
    d = jnp.arange(tile, dtype=jnp.float32) * (2.0 / 128)
    lx = jnp.tile(d, tile)
    ly = jnp.repeat(d, tile)
    px = (orig[..., 0] + lx[None, :])[..., None]      # (c, tp, 1)
    py = (orig[..., 1] + ly[None, :])[..., None]
    return px, py, qx, qy, invz, valid


def select_vpu(px, py, qx, qy, invz, valid, znear=0.01):
    """The current _select_tile_channels K=1/blur=0 form."""
    (b0, b1, b2), inside = channel_edge_bary(px, py, qx, qy)
    rb0, rb1, rb2 = jax.nn.relu(b0), jax.nn.relu(b1), jax.nn.relu(b2)
    denom = jnp.clip(
        rb0 * invz[0] + rb1 * invz[1] + rb2 * invz[2], 1e-12, None
    )
    zfrag = (rb0 + rb1 + rb2) / denom
    cover = inside & (valid > 0) & (zfrag > znear)
    priority = jnp.where(cover, zfrag, INF)
    zmin = jnp.min(priority, axis=-1)
    idx = jnp.argmin(priority, axis=-1).astype(jnp.int32)
    return jnp.where(zmin < INF, idx, -1)


def select_mxu(px, py, qx, qy, invz, valid, znear=0.01):
    """Affine form: per-face coefficient rows (cheap, F-sized), then
    batched (tp, 3) @ (3, F) dots."""
    # edge k opposite corner k: e_k(p) = (bx-ax)(py-ay) - (by-ay)(px-ax)
    #                                  = -(by-ay) px + (bx-ax) py + C
    def edge_coeffs(ax, ay, bx, by):
        gx = bx - ax
        gy = by - ay
        return -gy, gx, gy * ax - gx * ay             # A, B, C rows (c,1,F)

    A0, B0, C0 = edge_coeffs(qx[1], qy[1], qx[2], qy[2])
    A1, B1, C1 = edge_coeffs(qx[2], qy[2], qx[0], qy[0])
    A2, B2, C2 = edge_coeffs(qx[0], qy[0], qx[1], qy[1])
    area2 = (qx[1] - qx[0]) * (qy[2] - qy[0]) - (qy[1] - qy[0]) * (
        qx[2] - qx[0])
    inv_area = 1.0 / jnp.where(jnp.abs(area2) > 1e-12, area2, 1.0)
    s = jnp.sign(inv_area)  # orient edges so inside == all e >= 0
    # denom(p) = sum_k b_k invz_k = inv_area * sum_k e_k(p) invz_k (affine)
    Ad = inv_area * (A0 * invz[0] + A1 * invz[1] + A2 * invz[2])
    Bd = inv_area * (B0 * invz[0] + B1 * invz[1] + B2 * invz[2])
    Cd = inv_area * (C0 * invz[0] + C1 * invz[1] + C2 * invz[2])

    # stack coefficient planes: (c, 3, 4F) -> one dot (c, tp, 3)x(c, 3, 4F)
    coeff = jnp.concatenate(
        [
            jnp.concatenate([s * A0, s * B0, s * C0], axis=1),
            jnp.concatenate([s * A1, s * B1, s * C1], axis=1),
            jnp.concatenate([s * A2, s * B2, s * C2], axis=1),
            jnp.concatenate([Ad, Bd, Cd], axis=1),
        ],
        axis=-1,
    )                                                  # (c, 3, 4F)
    ones = jnp.ones_like(px)
    pmat = jnp.concatenate([px, py, ones], axis=-1)    # (c, tp, 3)
    vals = jnp.einsum(
        "ctk,ckf->ctf", pmat, coeff,
        precision=jax.lax.Precision.HIGHEST,
    )                                                  # (c, tp, 4F)
    F = valid.shape[-1]
    e0, e1, e2, denom = (
        vals[..., :F], vals[..., F:2 * F], vals[..., 2 * F:3 * F],
        vals[..., 3 * F:],
    )
    inside = (e0 >= 0.0) & (e1 >= 0.0) & (e2 >= 0.0)
    cover = inside & (valid > 0) & (denom * znear < 1.0) & (denom > 0)
    key = jnp.where(cover, -denom, INF)
    kmin = jnp.min(key, axis=-1)
    idx = jnp.argmin(key, axis=-1).astype(jnp.int32)
    return jnp.where(kmin < INF, idx, -1)


def main():
    tile = 32
    n_tiles, F = 384, 128          # ~the 720p 12-view active-tile load
    key = jax.random.PRNGKey(0)
    args = make_inputs(key, n_tiles, tile, F)

    f_vpu = jax.jit(select_vpu)
    f_mxu = jax.jit(select_mxu)
    a = jax.block_until_ready(f_vpu(*args))
    b = jax.block_until_ready(f_mxu(*args))
    agree = float(jnp.mean((a == b).astype(jnp.float32)))
    # winner parity: where both found a hit, do they agree?
    both = (a >= 0) & (b >= 0)
    same_hit = float(jnp.mean(jnp.where(both, (a == b), True)))
    print(f"winner agreement: {agree:.6f} (hit-pixels {same_hit:.6f})")

    for name, fn in (("vpu", f_vpu), ("mxu", f_mxu)):
        # timed: scan of dependent iterations to amortize dispatch
        def many(args, fn=fn, reps=30):
            def body(c, _):
                out = fn(*args)
                return c + jnp.sum(out), None
            return jax.lax.scan(body, jnp.float32(0), None, length=reps)[0]

        g = jax.jit(many)
        jax.block_until_ready(g(args))
        t0 = time.perf_counter()
        jax.block_until_ready(g(args))
        dt = (time.perf_counter() - t0) / 30
        print(f"{name}: {dt * 1e3:.3f} ms per selection pass "
              f"({n_tiles} tiles x {tile * tile} px x {F} lanes)")


if __name__ == "__main__":
    main()
