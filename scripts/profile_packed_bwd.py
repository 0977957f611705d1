"""Fine-grained profile of the packed soft kernel's BACKWARD.

The floor-calibrated north-star profile (docs/ROUND2_NOTES.md) reads the
grad delta as one 0.90 ms lump: bwd kernel + pack transpose + gather
transpose. This script splits that lump and sizes the bwd kernel's
internal blocks with variant kernels (same grid/blockspecs, reduced body):

  kfwd       isolated _tile_coverage_packed forward on PREBUILT planes
  kgrad      isolated fwd+bwd kernels (grad w.r.t. planes; custom_vjp)
  bwd_nosd2  variant: no _signed_d2 recompute (alpha := g_sel)
  bwd_su     variant: only the 3 Su moments per edge (no x/y/r2 moments)
  bwd_nogsel variant: g_sel MXU dot replaced by a broadcast constant row
  bwd_hier   variant: hierarchical two-pass moment reductions (see below)

MEASURED NEGATIVE RESULT (2026-08-19, north-star 256^2, v5e, same
session): bwd_hier 0.586 ms vs bwd_full 0.585 ms net of floor — a dead
tie. Factoring each (TP, F) pixel reduction through (tile, tile, F)
row/column partial sums cuts the slab TRAVERSAL count per edge from 13
to 7 (the x/y moment weighting moves to (tile, F) epilogues), and the
f32 result is slightly CLOSER to float64 than the direct form
(pairwise-partial summation), but Mosaic's strided/grouped sublane
reductions for the reshaped axes cost as much as the direct full-slab
tree sums, so no wall-clock moves. Kept as a variant body for future
re-measurement on other TPU generations.
  asm_fwd    full pipeline forward (setup + bin + gather + pack + kernel)
  asm_grad   full pipeline grad w.r.t. verts (adds all transposes)

Same dependent-carry scan harness as profile_northstar.py (min-of-N
repeats; floor printed for calibration). Same-session A/B only.
"""

from __future__ import annotations

import argparse
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--only", type=str, default=None,
                    help="comma-separated cut names (floor always runs)")
    ap.add_argument("--split", action="store_true",
                    help="occupancy split in the asm cuts (suggested hi)")
    ap.add_argument("--lo-lanes", type=int, default=32)
    ap.add_argument("--fc", type=int, default=None,
                    help="override pallas_soft._FC (face-chunk lane width)."
                         " MEASURED NEGATIVE at 256 on the north-star:"
                         " kfwd 0.32->0.35, kgrad 0.57->0.59, asm_grad"
                         " 1.455->1.471 ms — the kernels are math-bound,"
                         " not chunk-trip-bound")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.rasterize import binning
    from torch_renderer_tpu.rasterize import pallas_soft as ps

    if args.fc:
        ps._FC = args.fc  # experiment knob: face-chunk lane width
    from torch_renderer_tpu.rasterize.geometry import setup_face_planes
    from torch_renderer_tpu.rasterize.soft import SOFT_CUTOFF
    from torch_renderer_tpu.structures.meshes import Meshes

    B, IMAGE, SIGMA, TILE = args.batch, args.image, 1e-4, 16
    verts, faces = icosphere(args.level)
    f = 0.8 * IMAGE
    K = np.array(
        [[f, 0, IMAGE / 2.0], [0, f, IMAGE / 2.0], [0, 0, 1.0]], np.float32
    )
    t = np.array([0.0, 0.0, 3.0], np.float32)
    meshes = Meshes.from_single(verts, faces).extend(B)
    cam = PerspectiveCamera.from_K(
        K, (IMAGE, IMAGE),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)),
        t=np.tile(t, (B, 1)),
    )

    fp0 = setup_face_planes(meshes, cam)
    fpt = ps.suggest_faces_per_tile(fp0, (IMAGE, IMAGE))
    act = ps.suggest_active_tiles(fp0, (IMAGE, IMAGE))
    hi = lo = None
    if args.split:
        lo = args.lo_lanes
        hi = ps.suggest_occupancy_split(fp0, (IMAGE, IMAGE),
                                        active_tiles=act, lo_lanes=lo)
    gl = ps.suggest_group_lanes(fp0, (IMAGE, IMAGE), active_tiles=act,
                                faces_per_tile=fpt,
                                order="count" if hi else "tile")
    pad = math.sqrt(SOFT_CUTOFF * SIGMA)
    print(f"fpt={fpt} act={act} gl={gl} hi={hi} lo={lo}", file=sys.stderr)

    # ---- prebuild the packed planes once (static input to kernel cuts) ----
    def build_planes(v):
        fd = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fd, (IMAGE, IMAGE), TILE, pad, act)
        A = bins.slot.shape[1]
        Fmax = min(fpt, fd.num_faces)
        ch, mask = binning.gather_rank_planes(
            fd, bins, Fmax,
            channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
        )
        valid = mask.astype(jnp.float32)
        ox = bins.origin[..., 0:1]
        oy = bins.origin[..., 1:2]
        e = (jnp.arange(A, dtype=jnp.int32) % 8 + 1).astype(jnp.float32)
        ev = e[None, :, None] * valid
        slabs = jnp.stack(
            [ch["qx0"] - ox, ch["qy0"] - oy, ch["qx1"] - ox, ch["qy1"] - oy,
             ch["qx2"] - ox, ch["qy2"] - oy, ev],
            axis=-1,
        )
        capped = jnp.minimum(bins.count, Fmax)
        a_pad = (-A) % ps._TN
        if a_pad:
            slabs = jnp.pad(slabs, ((0, 0), (0, a_pad), (0, 0), (0, 0)))
            capped = jnp.pad(capped, ((0, 0), (0, a_pad)))
        G = (A + a_pad) // ps._TN
        S_g = gl + ((-gl) % ps._FC)
        packed, n_valid = binning.pack_groups(slabs, capped, S_g)
        n_chunks = -(-n_valid // ps._FC)
        meta = jnp.zeros((B * G, 1, S_g), jnp.float32)
        meta = meta.at[:, 0, 0].set(n_chunks.reshape(-1).astype(jnp.float32))
        return jnp.concatenate([jnp.swapaxes(packed, 1, 2), meta], axis=1)

    planes0 = jax.jit(build_planes)(meshes.verts)
    planes0 = jax.block_until_ready(planes0)
    Ng, _, S_g = planes0.shape
    tp = TILE * TILE
    inv_s = 1.0 / (min(IMAGE, IMAGE) / 2.0)
    print(f"planes {planes0.shape}", file=sys.stderr)

    # ---- variant backward kernels (same specs, reduced bodies) ----
    def _hier_moment_dq(inv_sigma, tile, q, valid, signed, d2, inside,
                        edges, gcot):
        """EXPERIMENT: hierarchical two-pass moment reductions.

        The production _moment_dq runs 7 full (TP, F) reductions + 6
        integrand multiplies per edge (13 slab traversals). Factoring the
        pixel axis as (y, x) = (tile, tile): P[x] = sum_y field and
        Q[y] = sum_x field give Su/Sux from P and Suy from Q with only 2
        full traversals per field — 7 traversals per edge total (s mul,
        r2 mul, P_u, Q_u, P_s, Q_s, Sr2), the x/y weighting moved to tiny
        (tile, F) epilogues."""
        import jax.numpy as jnp

        xs = jax.lax.broadcasted_iota(
            jnp.int32, (tile, 1), 0).astype(jnp.float32) * inv_s
        sgn = jnp.where(inside, -1.0, 1.0)
        alpha = gcot * jax.nn.sigmoid(-signed * inv_sigma) * (
            -2.0 * inv_sigma) * sgn
        alpha = jnp.where(valid > 0.0, alpha, 0.0)

        m0 = (edges[0][0] <= d2).astype(jnp.float32)
        m1 = (edges[1][0] <= d2).astype(jnp.float32)
        m2 = (edges[2][0] <= d2).astype(jnp.float32)
        norm = m0 + m1 + m2
        inv_norm = jnp.where(
            norm <= 1.0, 1.0, jnp.where(norm <= 2.0, 0.5, 1.0 / 3.0)
        )
        an = alpha * inv_norm

        def hier(field):
            a = field.reshape(tile, tile, -1)   # (y, x, F)
            P = jnp.sum(a, axis=0)              # (x, F)
            Q = jnp.sum(a, axis=1)              # (y, F)
            S0 = jnp.sum(P, axis=0)
            Sx = jnp.sum(P * xs, axis=0)
            Sy = jnp.sum(Q * xs, axis=0)        # ys == xs values
            return S0, Sx, Sy

        def edge_grads(e, m, qxa, qya):
            _, t, _, _, gx, gy = e
            u = an * m
            s = u * t
            r2 = s * t
            Su, Sux, Suy = hier(u)
            Ss, Ssx, Ssy = hier(s)
            Sr2 = jnp.sum(r2, axis=0)
            ax = qxa[0]
            ay = qya[0]
            dsu = Su - Ss
            dab = Ss - Sr2
            dqa_x = (Ssx - Sux) + ax * dsu + gx[0] * dab
            dqa_y = (Ssy - Suy) + ay * dsu + gy[0] * dab
            dqb_x = ax * Ss - Ssx + gx[0] * Sr2
            dqb_y = ay * Ss - Ssy + gy[0] * Sr2
            return dqa_x, dqa_y, dqb_x, dqb_y

        qx0, qy0, qx1, qy1, qx2, qy2 = q
        a0x, a0y, b0x, b0y = edge_grads(edges[0], m0, qx0, qy0)
        a1x, a1y, b1x, b1y = edge_grads(edges[1], m1, qx1, qy1)
        a2x, a2y, b2x, b2y = edge_grads(edges[2], m2, qx2, qy2)
        return (a0x + b2x, a0y + b2y,
                b0x + a1x, b0y + a1y,
                b1x + a2x, b1y + a2y)

    def make_bwd_variant(body_kind):
        inv_sigma = 1.0 / SIGMA
        fc = ps._FC
        n_fc = S_g // fc

        def kern(planes_ref, g_ref, dq_ref):
            xoff, yoff = ps._pixel_offsets(TILE, inv_s)
            g_rows = g_ref[...]

            def face_chunk(c, _):
                sl = pl.ds(pl.multiple_of(c * fc, fc), fc)
                q = tuple(planes_ref[0, r, sl][None, :] for r in range(6))
                ev = planes_ref[0, 6, sl][None, :]
                valid = (ev > 0.0).astype(jnp.float32)

                oh = ps._packed_oh(ev)
                if body_kind == "nogsel":
                    g_sel = jnp.ones((tp, fc), jnp.float32) * g_rows[0, 0]
                else:
                    g_sel = jax.lax.dot_general(
                        g_rows, oh, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST,
                    )

                if body_kind == "nosd2":
                    # no recompute: rows from g_sel directly
                    r0 = jnp.sum(g_sel * xoff, axis=0)
                    rows = (r0, r0, r0, r0, r0, r0)
                else:
                    signed, d2, inside, edges = ps._signed_d2(
                        xoff, yoff, q, valid)
                    if body_kind == "su_only":
                        sgn = jnp.where(inside, -1.0, 1.0)
                        alpha = g_sel * jax.nn.sigmoid(
                            -signed * inv_sigma) * (-2.0 * inv_sigma) * sgn
                        alpha = jnp.where(valid > 0.0, alpha, 0.0)
                        m0 = (edges[0][0] <= d2).astype(jnp.float32)
                        m1 = (edges[1][0] <= d2).astype(jnp.float32)
                        m2 = (edges[2][0] <= d2).astype(jnp.float32)
                        rows = []
                        for e_, m_ in ((edges[0], m0), (edges[1], m1),
                                       (edges[2], m2)):
                            u = alpha * m_
                            s = u * e_[1]
                            rows.append(jnp.sum(u, axis=0))
                            rows.append(jnp.sum(s, axis=0))
                        rows = tuple(rows)
                    elif body_kind == "hier":
                        rows = _hier_moment_dq(
                            inv_sigma, TILE, q, valid, signed, d2,
                            inside, edges, g_sel)
                    else:  # full
                        rows = ps._moment_dq(
                            inv_sigma, xoff, yoff, q, valid, signed, d2,
                            inside, edges, g_sel, 0.0, 0.0)
                for r in range(6):
                    dq_ref[0, r, sl] = rows[r]
                dq_ref[0, 6, sl] = jnp.zeros_like(rows[0])
                dq_ref[0, 7, sl] = jnp.zeros_like(rows[0])
                return 0

            def zero_chunk(c, _):
                sl = pl.ds(pl.multiple_of(c * fc, fc), fc)
                z = jnp.zeros((fc,), jnp.float32)
                for r in range(8):
                    dq_ref[0, r, sl] = z
                return 0

            nc = planes_ref[0, 7, 0].astype(jnp.int32)
            jax.lax.fori_loop(0, nc, face_chunk, 0)
            jax.lax.fori_loop(nc, n_fc, zero_chunk, 0)

        def call(planes, g):
            return pl.pallas_call(
                kern,
                grid=(Ng,),
                in_specs=[
                    pl.BlockSpec((1, 8, S_g), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((ps._TN, tp), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((1, 8, S_g), lambda i: (i, 0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((Ng, 8, S_g), jnp.float32),
                interpret=ps._interpret(),
            )(planes, g)

        return call

    g0 = jnp.ones((Ng * ps._TN, tp), jnp.float32)

    # ---- cuts ----
    def cut_floor(p):
        return jnp.sum(p)

    def cut_kfwd(p):
        return jnp.sum(ps._tile_coverage_packed(p, TILE, inv_s, SIGMA))

    def cut_kgrad(p):
        return jnp.sum(jax.grad(cut_kfwd)(p) ** 2)

    def make_variant_cut(kind):
        call = make_bwd_variant(kind)

        def cut(p):
            return jnp.sum(call(p, g0) ** 2)

        return cut

    # ---- transpose-chain isolation: grad through assembly prefixes ----
    def _setup_out(v):
        fd = setup_face_planes(meshes.update_padded(v), cam)
        return sum(jnp.sum(l) for l in jax.tree.leaves(fd)
                   if hasattr(l, "dtype") and l.dtype == jnp.float32)

    def cut_setup_grad(v):
        return jnp.sum(jax.grad(_setup_out)(v) ** 2)

    def _gather_out(v):
        fd = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fd, (IMAGE, IMAGE), TILE, pad, act)
        Fmax = min(fpt, fd.num_faces)
        ch, mask = binning.gather_rank_planes(
            fd, bins, Fmax,
            channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
        )
        return sum(jnp.sum(c) for c in ch.values())

    def cut_gather_grad(v):
        return jnp.sum(jax.grad(_gather_out)(v) ** 2)

    def _planes_out(v):
        return jnp.sum(build_planes(v))

    def cut_planes_grad(v):
        return jnp.sum(jax.grad(_planes_out)(v) ** 2)

    # WEIGHTED variants: grad-of-plain-sum has a CONSTANT cotangent, which
    # lets XLA fold the one-hot transpose contractions into cheap row sums
    # — planes_g/gather_g under-read the real transpose cost. A fixed
    # pseudo-random weight keeps the cotangent dense and unfoldable.
    def _weights_like(shape):
        n = int(np.prod(shape))
        return jnp.cos(jnp.arange(n, dtype=jnp.float32) * 0.37).reshape(shape)

    def cut_planes_gw(v):
        w = _weights_like(planes0.shape)

        def out(vv):
            return jnp.sum(build_planes(vv) * w)

        return jnp.sum(jax.grad(out)(v) ** 2)

    def cut_gather_gw(v):
        def out(vv):
            fd = setup_face_planes(meshes.update_padded(vv), cam)
            bins = binning.bin_faces_active(fd, (IMAGE, IMAGE), TILE, pad,
                                            act)
            Fmax = min(fpt, fd.num_faces)
            ch, _ = binning.gather_rank_planes(
                fd, bins, Fmax,
                channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
            )
            s = jnp.stack(list(ch.values()), axis=-1)
            return jnp.sum(s * _weights_like(s.shape))

        return jnp.sum(jax.grad(out)(v) ** 2)

    def cut_asm_fwd(v):
        fd = setup_face_planes(meshes.update_padded(v), cam)
        alpha = ps.soft_silhouette_pallas_fd(
            fd, (IMAGE, IMAGE), sigma=SIGMA, faces_per_tile=fpt,
            active_tiles=act, layout="packed", group_lanes=gl,
            hi_tiles=hi, lo_lanes=lo if lo else 32,
        )
        return jnp.sum(alpha)

    def cut_asm_grad(v):
        return jnp.sum(jax.grad(cut_asm_fwd)(v) ** 2)

    # value_and_grad keeps the fwd kernel LIVE: asm_vg - asm_grad tells
    # whether grad-only DCEs the fwd pallas_call (cotangent of sum is
    # constant, residual is the planes array).
    def cut_asm_vg(v):
        val, g = jax.value_and_grad(cut_asm_fwd)(v)
        return val + jnp.sum(g ** 2)

    # grad of the packed-kernel output SUM taken at the planes boundary but
    # reached THROUGH the full assembly: isolates the image epilogue
    # (untile + scatter_active_bg) fwd + cotangent from asm_grad.
    def _asm_nosum(v):
        fd = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fd, (IMAGE, IMAGE), TILE, pad, act)
        return jnp.sum(_asm_kernel_out(v, fd, bins, bins.slot.shape[1]))

    def cut_asm_grad_nosum(v):
        return jnp.sum(jax.grad(_asm_nosum)(v) ** 2)

    # epilogue attribution, staged on the raw kernel output:
    #   exp cost     = asm_g_exp - asm_g_nosum
    #   scatter cost = asm_g_scat - asm_g_exp
    #   untile cost  = asm_grad - asm_g_scat
    def _asm_stage(v, stage):
        fd = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fd, (IMAGE, IMAGE), TILE, pad, act)
        A = bins.slot.shape[1]
        Sk = _asm_kernel_out(v, fd, bins, A)
        if stage == "exp":
            return jnp.sum(1.0 - jnp.exp(-Sk))
        per_tile = Sk.reshape(B, -1, tp)[:, :A]
        per_tile = binning.scatter_active(per_tile, bins)
        return jnp.sum(1.0 - jnp.exp(-per_tile))

    def _asm_kernel_out(v, fd, bins, A):
        Fmax = min(fpt, fd.num_faces)
        ch, mask = binning.gather_rank_planes(
            fd, bins, Fmax,
            channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
        )
        valid = mask.astype(jnp.float32)
        ox = bins.origin[..., 0:1]
        oy = bins.origin[..., 1:2]
        e = (jnp.arange(A, dtype=jnp.int32) % 8 + 1).astype(jnp.float32)
        ev = e[None, :, None] * valid
        slabs = jnp.stack(
            [ch["qx0"] - ox, ch["qy0"] - oy, ch["qx1"] - ox, ch["qy1"] - oy,
             ch["qx2"] - ox, ch["qy2"] - oy, ev],
            axis=-1,
        )
        capped = jnp.minimum(bins.count, Fmax)
        a_pad = (-A) % ps._TN
        if a_pad:
            slabs = jnp.pad(slabs, ((0, 0), (0, a_pad), (0, 0), (0, 0)))
            capped = jnp.pad(capped, ((0, 0), (0, a_pad)))
        G = (A + a_pad) // ps._TN
        S_g = gl + ((-gl) % ps._FC)
        packed, n_valid = binning.pack_groups(slabs, capped, S_g)
        n_chunks = -(-n_valid // ps._FC)
        meta = jnp.zeros((B * G, 1, S_g), jnp.float32)
        meta = meta.at[:, 0, 0].set(n_chunks.reshape(-1).astype(jnp.float32))
        planes = jnp.concatenate([jnp.swapaxes(packed, 1, 2), meta], axis=1)
        return ps._tile_coverage_packed(planes, TILE, inv_s, SIGMA)

    def cut_asm_g_exp(v):
        return jnp.sum(jax.grad(lambda x: _asm_stage(x, "exp"))(v) ** 2)

    def cut_asm_g_scat(v):
        return jnp.sum(jax.grad(lambda x: _asm_stage(x, "scat"))(v) ** 2)

    kernel_cuts = [
        ("floor", cut_floor, planes0),
        ("kfwd", cut_kfwd, planes0),
        ("kgrad", cut_kgrad, planes0),
        ("bwd_full", make_variant_cut("full"), planes0),
        ("bwd_hier", make_variant_cut("hier"), planes0),
        ("bwd_su", make_variant_cut("su_only"), planes0),
        ("bwd_nosd2", make_variant_cut("nosd2"), planes0),
        ("bwd_nogsel", make_variant_cut("nogsel"), planes0),
        ("asm_fwd", cut_asm_fwd, meshes.verts),
        ("asm_grad", cut_asm_grad, meshes.verts),
        ("asm_vg", cut_asm_vg, meshes.verts),
        ("asm_g_nosum", cut_asm_grad_nosum, meshes.verts),
        ("asm_g_exp", cut_asm_g_exp, meshes.verts),
        ("asm_g_scat", cut_asm_g_scat, meshes.verts),
        ("setup_g", cut_setup_grad, meshes.verts),
        ("gather_g", cut_gather_grad, meshes.verts),
        ("planes_g", cut_planes_grad, meshes.verts),
        ("gather_gw", cut_gather_gw, meshes.verts),
        ("planes_gw", cut_planes_gw, meshes.verts),
    ]

    def scanned(fn):
        @jax.jit
        def run(v):
            def body(c, _):
                out = fn(c)
                dep = sum(jnp.sum(l).astype(jnp.float32)
                          for l in jax.tree.leaves(out))
                return c + 1e-30 * dep, ()
            vf, _ = jax.lax.scan(body, v, None, length=args.steps)
            return vf
        return run

    if args.only:
        keep = {"floor"} | set(args.only.split(","))
        kernel_cuts = [c for c in kernel_cuts if c[0] in keep]

    times = {}
    for name, fn, v0 in kernel_cuts:
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        run = scanned(fn)
        out = jax.block_until_ready(run(v0))
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            out = jax.block_until_ready(run(v0))
            best = min(best, time.perf_counter() - t0)
        times[name] = best / args.steps * 1e3
        print(f"{name:10s} {times[name]:7.3f} ms", flush=True)

    fl = times["floor"]
    print("\n--- net of floor ---")
    for name in times:
        if name != "floor":
            print(f"{name:10s} {times[name] - fl:7.3f} ms")
    if {"kgrad", "kfwd", "asm_fwd", "asm_grad"} <= set(times):
        # NOTE: kgrad's forward kernel is DCE'd (custom_vjp residual is the
        # planes array, the fwd VALUE is unused by grad-of-sum), so kgrad
        # measures the bwd kernel alone — consistent with bwd_full.
        print("\nderived:")
        print(f"  bwd kernel (kgrad, fwd DCE'd)   {times['kgrad'] - fl:7.3f} ms")
        print(f"  asm grad total                  {times['asm_grad'] - fl:7.3f} ms")
        print(f"  transposes (asm_g-asm_f-kgrad)  "
              f"{times['asm_grad'] - times['asm_fwd'] - (times['kgrad'] - fl):7.3f} ms")


if __name__ == "__main__":
    main()
