"""Roofline/MFU artifact: op-count bound vs measured time per hot kernel.

The committed evidence (docs/BENCHMARKS.md "Roofline") that the hot Pallas
kernels are saturated rather than stalled — VERDICT r2 weak-item #5 / task
#7. For each kernel the script:

  1. COUNTS the kernel's work with a jaxpr walker over a model function
     that mirrors the kernel body's per-chunk math (the real `_signed_d2` /
     `_moment_dq` / `_chunk_fragment_math` functions, not a re-derivation):
     VPU element-ops (elementwise ops x slab elements, reductions at
     operand size) and MXU FLOPs (2mkn per dot_general) are tallied
     separately.
  2. CALIBRATES what this chip actually sustains in the same units with
     microbenchmark kernels that mirror the usage pattern: an 8-chain
     deep-body elementwise kernel for the VPU rate (counted with the SAME
     walker), and dependent-accumulation dot loops at each kernel's exact
     dot shape/orientation for the MXU (small-m dots are latency-bound —
     peak-FLOPs would overstate the bound ~10x at m=8).
  3. MEASURES each kernel isolated on prebuilt inputs with the dependent-
     carry scan harness (min-of-N repeats, net of the trivial-body floor —
     the same protocol as scripts/profile_packed_bwd.py).

  bound_ms = max(vpu_ops / vpu_rate, mxu_flops / mxu_rate(shape))
  achieved = bound_ms / measured_ms     (>= 1.0 = at/beyond the modeled
                                         floor, i.e. saturated)

  Reading `achieved`: the bound is CONSERVATIVE on the VPU side — the
  walker counts every jaxpr eqn, but Mosaic fuses mul+add chains into
  FMAs and CSEs the edge terms _signed_d2 shares across its three edges,
  so the VPU-bound kernels sustain 1.4-2.6x the calibration loop's
  counter-op rate. The MXU-dominated texsample rows (shape-calibrated
  dots, no such slack) land at 1.0-1.2x and are the tightest direct
  saturation evidence. Through-tunnel measured times vary ~+-20 percent
  between sessions; compare within one run.

Scenes: the north-star soft-silhouette config (256^2, level-3 icosphere,
B=8, packed layout — bench.py's protocol) for the soft kernels; the
joint-fit config (128^2, level-4, K=8, bin 16 — docs/BENCHMARKS.md) for
the top-K selection kernel; the joint-fit texture scale (256^2 RGB map,
2 x 32768 points) for the texture sampler.

Regenerate the table:  python scripts/roofline.py            (real TPU)
Sanity-check op models: python scripts/roofline.py --cpu --counts-only
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


# ---------------------------------------------------------------------------
# jaxpr op counter
# ---------------------------------------------------------------------------

# layout/bookkeeping primitives that cost ~nothing per element on TPU (or
# are folded away by Mosaic): not counted.
_SKIP = {
    "broadcast_in_dim", "reshape", "squeeze", "expand_dims", "slice",
    "dynamic_slice", "dynamic_update_slice", "concatenate", "transpose",
    "iota", "pad", "stop_gradient", "copy", "rev",
}
_REDUCE = {
    "reduce_sum", "reduce_max", "reduce_min", "reduce_and", "reduce_or",
    "argmin", "argmax", "reduce_prod",
}


def count_ops(fn, *args):
    """(vpu_element_ops, mxu_flops, {dot shapes}) of one call of fn.

    Elementwise primitives count their largest output size; reductions
    count their operand size (one traversal); dot_general counts 2mkn
    FLOPs on the MXU tally and records (m, k, n, orientation) so the MXU
    rate can be calibrated at the exact shape."""
    import jax

    jaxpr = jax.make_jaxpr(fn)(*args)
    vpu = 0
    mxu = 0
    dots = []

    def size(v):
        s = 1
        for d in v.aval.shape:
            s *= int(d)
        return s

    def walk(jx):
        nonlocal vpu, mxu
        for eqn in jx.eqns:
            name = eqn.primitive.name
            if name in ("pjit", "custom_jvp_call", "custom_vjp_call",
                        "custom_vjp_call_jaxpr", "remat", "checkpoint",
                        "closed_call"):
                sub = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
                if sub is not None:
                    walk(sub.jaxpr if hasattr(sub, "jaxpr") else sub)
                continue
            if name == "dot_general":
                ((lc, rc), _) = eqn.params["dimension_numbers"]
                lsh = eqn.invars[0].aval.shape
                rsh = eqn.invars[1].aval.shape
                k = 1
                for d in lc:
                    k *= int(lsh[d])
                m = size(eqn.invars[0]) // k
                n = size(eqn.invars[1]) // k
                mxu += 2 * m * k * n
                dots.append((m, k, n, tuple(lc), tuple(rc)))
                continue
            if name in _SKIP:
                continue
            if name in _REDUCE:
                vpu += size(eqn.invars[0])
                continue
            vpu += max((size(v) for v in eqn.outvars), default=0)

    walk(jaxpr.jaxpr)
    return vpu, mxu, dots


# ---------------------------------------------------------------------------
# calibration kernels
# ---------------------------------------------------------------------------


def _calibrate(steps: int, repeats: int):
    """Measured device rates: (vpu element-ops/s, {dot_shape: flops/s}).

    The VPU kernel runs 8 independent deep-body chains (ILP-exposing,
    VMEM-amortizing); its op count comes from the SAME walker that counts
    the kernels. Each MXU shape runs a dependent-accumulation dot loop —
    the kernels accumulate across face chunks the same way."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interp = jax.default_backend() != "tpu"
    R = 200
    S0, S1 = 256, 512

    def _vpu_chains(a, b, c, d, e, f, g, h, x):
        """Eight INDEPENDENT chains of kernel-like math (fma, min/max,
        compare+select, abs) — each chain reads only its own carry and x,
        so the loop exposes 8-way ILP (a cross-linked first version was
        latency-bound and understated the roof 3x). Counted with the same
        jaxpr walker that counts the kernels, so any instruction fusion
        (e.g. mul+add -> one FMA) cancels out of the comparison."""
        def deep(v, c1, c2):
            # 6 ops per chain per iteration: enough vreg work to amortize
            # the loop-carry VMEM round trip (2-op chains measured
            # VMEM-bound at ~1/3 of what the kernels sustain)
            return ((v * c1 + x) * c2 + x) * c1 + x

        a = deep(a, 1.0000001, 0.9999999)
        b = jnp.minimum(deep(b, 0.9999998, 1.0000002), x * 2.0)
        c = jnp.where(c > x, deep(c, 0.9999997, 1.0000003), x)
        d = deep(d, 1.0000004, 0.9999996)
        e = jnp.abs(deep(e, 0.9999995, 1.0000005))
        f = jnp.maximum(deep(f, 1.0000006, 0.9999994), x * 0.5)
        g = deep(g, 0.9999993, 1.0000007)
        h = deep(h, 1.0000008, 0.9999992)
        return a, b, c, d, e, f, g, h

    x0 = jnp.ones((S0, S1), jnp.float32)
    ops_per_iter, _, _ = count_ops(
        _vpu_chains, *([x0] * 9))

    def vpu_kernel(x_ref, o_ref):
        x = x_ref[...]

        def body(i, acc):
            return _vpu_chains(*acc, x)

        acc = jax.lax.fori_loop(
            0, R, body, tuple(x + float(i) for i in range(8)))
        o_ref[...] = sum(acc)

    vpu_call = jax.jit(lambda x: pl.pallas_call(
        vpu_kernel,
        out_shape=jax.ShapeDtypeStruct((S0, S1), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interp,
    )(x))
    t = _scan_time(vpu_call, x0, steps, repeats)
    floor = _scan_time(lambda x: jnp.sum(x), x0, steps, repeats)
    vpu_rate = ops_per_iter * R / max(t - floor, 1e-9) * 1e3  # ops/s

    def mxu_rate(m, k, n, orient, dtype="f32"):
        RD = 100
        op_dtype = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        prec = (None if dtype == "bf16"
                else jax.lax.Precision.HIGHEST)

        def kern(a_ref, b_ref, o_ref):
            def body(i, acc):
                # feed the accumulator back into the lhs ADDITIVELY so the
                # dot cannot leave the loop: a multiplicative scalar gets
                # factored out of the dot by the algebraic simplifier
                # (dot(s*a, b) -> s*dot(a, b)) and the dot hoists as
                # loop-invariant — measured as a 5e7 TFLOP/s "rate"
                a = a_ref[...] + (1e-30 * acc[0, 0]).astype(op_dtype)
                return acc + jax.lax.dot_general(
                    a, b_ref[...], (orient, ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=prec,
                )

            o_ref[...] = jax.lax.fori_loop(
                0, RD, body, jnp.zeros(o_ref.shape, jnp.float32))

        lsh = _dot_operand_shape(m, k, orient[0])
        rsh = _dot_operand_shape(n, k, orient[1])
        a = jnp.ones(lsh, op_dtype)
        b = jnp.ones(rsh, op_dtype)
        osh = (m, n)
        call = jax.jit(lambda a, b: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct(osh, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interp,
        )(a, b))
        tm = _scan_time(lambda ab: call(*ab), (a, b), steps, repeats)
        return RD * 2 * m * k * n / max(tm - floor, 1e-9) * 1e3  # flops/s

    return vpu_rate, mxu_rate


def _dot_operand_shape(free, k, contract_dims):
    # 2-d operands only; contract dim is 0 or 1
    return (k, free) if contract_dims == (0,) else (free, k)


def _scan_time(fn, x0, steps, repeats):
    """Dependent-carry scan timing (ms per call of fn), tunnel-safe.

    The INPUT is the carry: each iteration perturbs the first (f32) leaf
    by 1e-30 x the previous output, so fn is loop-variant and XLA cannot
    hoist it out of the scan (fn(const) with only a scalar carry gets
    computed exactly once — the first version of this harness measured
    the floor for every kernel)."""
    import jax
    import jax.numpy as jnp

    leaves0, treedef = jax.tree.flatten(x0)

    @jax.jit
    def run(leaves):
        def body(lvs, _):
            out = fn(jax.tree.unflatten(treedef, lvs))
            dep = sum(jnp.sum(l).astype(jnp.float32)
                      for l in jax.tree.leaves(out))
            bump = (lvs[0] + 1e-30 * dep).astype(lvs[0].dtype)
            return [bump] + list(lvs[1:]), ()

        lf, _ = jax.lax.scan(body, list(leaves), None, length=steps)
        return lf[0]

    jax.block_until_ready(run(leaves0))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(run(leaves0))
        best = min(best, time.perf_counter() - t0)
    return best / steps * 1e3


# ---------------------------------------------------------------------------
# op models (mirror the kernel bodies with the REAL math functions)
# ---------------------------------------------------------------------------


def soft_fwd_chunk_ops(tile):
    import jax.numpy as jnp
    from torch_renderer_tpu.rasterize import pallas_soft as ps

    tp, fc = tile * tile, ps._FC
    inv_sigma = 1e4

    def body(q0, q1, q2, q3, q4, q5, valid, ev, xoff, yoff):
        import jax

        signed, _, _, _ = ps._signed_d2(
            xoff, yoff, (q0, q1, q2, q3, q4, q5), valid)
        contrib = jax.nn.softplus(-signed * inv_sigma)
        oh = ps._packed_oh(ev)
        return jax.lax.dot_general(
            oh, contrib, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )

    row = jnp.zeros((1, fc), jnp.float32)
    col = jnp.zeros((tp, 1), jnp.float32)
    return count_ops(body, *([row] * 8), col, col)


def soft_bwd_chunk_ops(tile):
    import jax
    import jax.numpy as jnp
    from torch_renderer_tpu.rasterize import pallas_soft as ps

    tp, fc = tile * tile, ps._FC
    inv_sigma = 1e4

    def body(q0, q1, q2, q3, q4, q5, valid, ev, xoff, yoff, g_rows):
        q = (q0, q1, q2, q3, q4, q5)
        signed, d2, inside, edges = ps._signed_d2(xoff, yoff, q, valid)
        oh = ps._packed_oh(ev)
        g_sel = jax.lax.dot_general(
            g_rows, oh, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
        )
        rows = ps._moment_dq(inv_sigma, xoff, yoff, q, valid, signed, d2,
                             inside, edges, g_sel, 0.0, 0.0)
        return jnp.stack(rows)

    row = jnp.zeros((1, fc), jnp.float32)
    col = jnp.zeros((tp, 1), jnp.float32)
    g = jnp.zeros((8, tp), jnp.float32)
    return count_ops(body, *([row] * 8), col, col, g)


def topk_chunk_ops(tile, blur, znear, clip_bary):
    import jax.numpy as jnp
    from torch_renderer_tpu.rasterize import pallas_hard as ph

    tp, fc = tile * tile, ph._FC

    def body(*args):
        px, py = args[0], args[1]
        q = args[2:8]
        zf = args[8:11]
        invzf = args[11:14]
        valid = args[14]
        return ph._chunk_fragment_math(
            px, py, q, zf, invzf, blur, znear, clip_bary, valid)[0]

    row = jnp.zeros((1, fc), jnp.float32)
    col = jnp.zeros((tp, 1), jnp.float32)
    return count_ops(body, col, col, *([row] * 13))


def topk_extract_ops(tile, F):
    """One of the K selection-only extraction passes over (tp, F)."""
    import jax
    import jax.numpy as jnp

    tp = tile * tile

    def body(prio, lane_iota):
        zmin = jnp.min(prio, axis=-1)
        amin = jnp.min(
            jnp.where(prio == zmin[:, None], lane_iota, F), axis=-1)
        live = zmin < 1e30
        return jnp.stack([
            jnp.where(live, amin.astype(jnp.float32), -1.0),
            live.astype(jnp.float32),
        ])

    return count_ops(body, jnp.zeros((tp, F), jnp.float32),
                     jnp.zeros((tp, F), jnp.int32))


def points_chunk_ops(tile):
    """One (tp, PC) priority-fill chunk of pallas_points._points_select_kernel
    (mirrors the kernel's chunk_body math)."""
    import jax.numpy as jnp
    from torch_renderer_tpu.rasterize import pallas_points as pp

    tp, pc = tile * tile, pp._PC

    def body(px, py, x, y, z, r2, valid):
        dx = px - x
        dy = py - y
        cover = (dx * dx + dy * dy <= r2) & (valid > 0.0) & (z > 1e-5)
        return jnp.where(cover, z * jnp.ones_like(dx), 3.0e38)

    row = jnp.zeros((1, pc), jnp.float32)
    col = jnp.zeros((tp, 1), jnp.float32)
    return count_ops(body, col, col, *([row] * 5))


def points_extract_ops(tile, P):
    """One of the K extraction passes over (tp, P) incl. the knockout
    (pallas_points k_body)."""
    import jax.numpy as jnp

    tp = tile * tile

    def body(prio, lane_iota):
        zmin = jnp.min(prio, axis=-1)
        amin = jnp.min(
            jnp.where(prio == zmin[:, None], lane_iota, P), axis=-1)
        live = zmin < 1e30
        band = jnp.stack([
            jnp.where(live, amin.astype(jnp.float32), -1.0),
            live.astype(jnp.float32),
        ])
        return band, jnp.where(lane_iota == amin[:, None], 3.0e38, prio)

    return count_ops(body, jnp.zeros((tp, P), jnp.float32),
                     jnp.zeros((tp, P), jnp.int32))


def points_gather_ops(t_chunk, Pmax, N, C3):
    """One tile-chunk of the candidate slot-gather (binning._slot_gather):
    the point path's dominant cost (7.5 of 17.1 ms at the 4x20k bench) —
    XLA, not Pallas, but the same bound logic applies. Model: the one-hot
    construct at ONE op per (slot, item) element (XLA fuses the compare
    into the dot's operand generation — an explicit compare+convert
    double-count put the VPU bound above the measured time), and the
    packed bf16 dot at its PADDED lane width (the MXU computes 128 output
    lanes whether the packed channel count is 21 or 128), calibrated with
    bf16 operands (the real dot is bf16 via _split3, NOT a 3-pass f32
    HIGHEST contraction — calibrating f32/HIGHEST overstated the bound
    8x)."""
    n_pad = -(-C3 // 128) * 128
    # Narrow-lane saturation (round-5 probe_point_gather on v5e): the dot's
    # per-chunk cost is AFFINE in the output lane count, cost = b*(n0 + n)
    # with n0 ~ 129 lanes (measured 0.111 ms at n=21 vs 0.190 ms at n=128
    # on identical operands), NOT proportional to the padded width. The old
    # n_pad=128 charge overstated the bound 1.7x at C3=21 (the row then
    # read "1.36x headroom" that two rearrangements — group-factored
    # 126-lane packing and a transposed m=3C dot — both failed to collect:
    # 12.3 / 8.2 ms vs 9.3 ms shipped; the gather is construction-bound).
    N0_LANES = 129
    n_eff = n_pad * (N0_LANES + C3) / (N0_LANES + n_pad)
    vpu = t_chunk * Pmax * N                # fused one-hot construct
    mxu = 2 * t_chunk * Pmax * N * n_eff    # saturation-model bf16 dot
    # m, k, n, lc, rc, dtype — k capped for a VMEM-sized calibration
    dot = (t_chunk * Pmax, N, n_pad, 1, 1, "bf16")
    return vpu, mxu, dot


def texsample_fwd_ops(Hmp, Wmp, C, pb):
    import jax
    import jax.numpy as jnp
    from torch_renderer_tpu.ops import pallas_texsample as pt

    Z = C * Wmp

    def body(maps, q):
        oyT = pt._onehot_pair(q[0:1], q[2:3], Hmp, pb)
        oxT = pt._onehot_pair(q[1:2], q[3:4], Wmp, pb)
        rowsT = jax.lax.dot_general(
            maps, oyT, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        outs = []
        for c in range(C):
            seg = rowsT[c * Wmp:(c + 1) * Wmp]
            outs.append(jnp.sum(oxT * seg, axis=0))
        return jnp.stack(outs)

    return count_ops(body, jnp.zeros((Hmp, Z), jnp.float32),
                     jnp.zeros((4, pb), jnp.float32))


def texsample_bwd_ops(Hmp, Wmp, C, pb):
    import jax
    import jax.numpy as jnp
    from torch_renderer_tpu.ops import pallas_texsample as pt

    Z = C * Wmp

    def body(maps, q, g):
        y0, x0, wy, wx = q[0:1], q[1:2], q[2:3], q[3:4]
        oyT = pt._onehot_pair(y0, wy, Hmp, pb)
        oxT = pt._onehot_pair(x0, wx, Wmp, pb)
        y0i, x0i = y0.astype(jnp.int32), x0.astype(jnp.int32)
        ioty = jax.lax.broadcasted_iota(jnp.int32, (Hmp, pb), 0)
        droyT = jnp.where(ioty == y0i + 1, 1.0, 0.0) - jnp.where(
            ioty == y0i, 1.0, 0.0)
        iotx = jax.lax.broadcasted_iota(jnp.int32, (Wmp, pb), 0)
        droxT = jnp.where(iotx == x0i + 1, 1.0, 0.0) - jnp.where(
            iotx == x0i, 1.0, 0.0)
        rowsT = jax.lax.dot_general(
            maps, oyT, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        drowT = jax.lax.dot_general(
            maps, droyT, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        dwy = jnp.zeros((1, pb), jnp.float32)
        dwx = jnp.zeros((1, pb), jnp.float32)
        tmps = []
        for c in range(C):
            gc = g[c:c + 1]
            sl = slice(c * Wmp, (c + 1) * Wmp)
            dwy = dwy + jnp.sum(oxT * drowT[sl], axis=0, keepdims=True) * gc
            dwx = dwx + jnp.sum(droxT * rowsT[sl], axis=0, keepdims=True) * gc
            tmps.append(oxT * gc)
        tmp = jnp.concatenate(tmps, axis=0)
        dmaps = jax.lax.dot_general(
            oyT, tmp, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
        return dmaps, dwy, dwx

    return count_ops(body, jnp.zeros((Hmp, Z), jnp.float32),
                     jnp.zeros((4, pb), jnp.float32),
                     jnp.zeros((8, pb), jnp.float32))


# ---------------------------------------------------------------------------
# scenes + prebuilt kernel inputs
# ---------------------------------------------------------------------------


def build_soft_planes():
    """North-star scene -> packed planes (bench.py protocol)."""
    import jax
    import jax.numpy as jnp
    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.rasterize import binning
    from torch_renderer_tpu.rasterize import pallas_soft as ps
    from torch_renderer_tpu.rasterize.geometry import setup_face_planes
    from torch_renderer_tpu.rasterize.soft import SOFT_CUTOFF
    from torch_renderer_tpu.structures.meshes import Meshes

    B, IMAGE, SIGMA, TILE = 8, 256, 1e-4, 16
    verts, faces = icosphere(3)
    f = 0.8 * IMAGE
    K = np.array(
        [[f, 0, IMAGE / 2.0], [0, f, IMAGE / 2.0], [0, 0, 1.0]], np.float32)
    meshes = Meshes.from_single(verts, faces).extend(B)
    cam = PerspectiveCamera.from_K(
        K, (IMAGE, IMAGE),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)),
        t=np.tile(np.array([0.0, 0.0, 3.0], np.float32), (B, 1)))
    fp0 = setup_face_planes(meshes, cam)
    fpt = ps.suggest_faces_per_tile(fp0, (IMAGE, IMAGE))
    act = ps.suggest_active_tiles(fp0, (IMAGE, IMAGE))
    gl = ps.suggest_group_lanes(fp0, (IMAGE, IMAGE), active_tiles=act,
                                faces_per_tile=fpt)
    pad = math.sqrt(SOFT_CUTOFF * SIGMA)

    def build(v):
        fd = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fd, (IMAGE, IMAGE), TILE, pad, act)
        A = bins.slot.shape[1]
        Fmax = min(fpt, fd.num_faces)
        ch, mask = binning.gather_rank_planes(
            fd, bins, Fmax,
            channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"))
        valid = mask.astype(jnp.float32)
        ox = bins.origin[..., 0:1]
        oy = bins.origin[..., 1:2]
        e = (jnp.arange(A, dtype=jnp.int32) % 8 + 1).astype(jnp.float32)
        ev = e[None, :, None] * valid
        slabs = jnp.stack(
            [ch["qx0"] - ox, ch["qy0"] - oy, ch["qx1"] - ox, ch["qy1"] - oy,
             ch["qx2"] - ox, ch["qy2"] - oy, ev], axis=-1)
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
        meta = meta.at[:, 0, 0].set(
            n_chunks.reshape(-1).astype(jnp.float32))
        return jnp.concatenate([jnp.swapaxes(packed, 1, 2), meta], axis=1)

    import jax as _j

    planes = _j.block_until_ready(_j.jit(build)(meshes.verts))
    return planes, TILE, 1.0 / (min(IMAGE, IMAGE) / 2.0), SIGMA


def build_topk_planes():
    """Joint-fit scene (128^2, level-4, K=8) -> selection-kernel planes,
    assembled exactly as rasterize_binned_pallas does."""
    import jax
    import jax.numpy as jnp
    from torch_renderer_tpu.cameras.look_at import look_at_view_transform
    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.rasterize import pallas_hard as ph
    from torch_renderer_tpu.rasterize.binning import (
        bin_faces_active, count_overflow, gather_rank_planes,
        suggest_active_tiles_fd,
    )
    from torch_renderer_tpu.rasterize.geometry import setup_faces
    from torch_renderer_tpu.structures.meshes import Meshes

    H = W = 128
    TILE, K_HITS = 16, 8
    B = 2  # views_per_step
    verts, faces = icosphere(4)
    meshes = Meshes.from_single(verts, faces).extend(B)
    f = 0.8 * H
    Km = np.array(
        [[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)
    Rs, ts = look_at_view_transform(2.7, [20.0, 40.0], [30.0, 150.0])
    cam = PerspectiveCamera.from_K(Km, (H, W), R=Rs, t=ts)
    blur = math.log(1.0 / 1e-4 - 1.0) * 1e-4
    pad_radius = math.sqrt(blur)

    fd = setup_faces(meshes, cam)
    mx, _ = count_overflow(fd, (H, W), TILE, 0, pad_radius)
    mfb = max(128, int(math.ceil(float(mx) * 1.5 / 128.0)) * 128)
    act = int(math.ceil(1.5 * suggest_active_tiles_fd(
        fd, (H, W), TILE, pad_radius)))

    def build(v):
        fdv = setup_faces(meshes.update_padded(v), cam)
        bins = bin_faces_active(fdv, (H, W), TILE, pad_radius, act)
        F = fdv.num_faces
        fid = jnp.broadcast_to(
            jax.lax.broadcasted_iota(jnp.float32, (1, F, 1), 1), (B, F, 1))
        ch, exg, mask = gather_rank_planes(
            fdv, bins, min(mfb, F), extra=fid)
        fidf = exg[..., -1]
        Bv, T, Fmax = mask.shape
        valid = mask.astype(jnp.float32)
        origins = bins.origin
        origin_row = jnp.zeros((Bv, T, Fmax), jnp.float32)
        origin_row = origin_row.at[..., 0].set(origins[..., 0])
        origin_row = origin_row.at[..., 1].set(origins[..., 1])
        fc = ph._face_chunk_width(Fmax + ((-Fmax) % ph._FC))
        n_chunks = -(-jnp.minimum(bins.count, Fmax) // fc)
        zrow = jnp.zeros((Bv, T, Fmax), jnp.float32)
        zrow = zrow.at[..., 0].set(n_chunks.astype(jnp.float32))
        planes = jnp.stack(
            [ch["qx0"], ch["qy0"], ch["qx1"], ch["qy1"], ch["qx2"],
             ch["qy2"], ch["z0"], ch["z1"], ch["z2"],
             ch["invz0"], ch["invz1"], ch["invz2"],
             fidf, valid, origin_row, zrow], axis=2,
        ).reshape(Bv * T, 16, Fmax)
        f_pad = (-Fmax) % ph._FC
        if f_pad:
            planes = jnp.pad(planes, ((0, 0), (0, 0), (0, f_pad)))
        n_pad = (-planes.shape[0]) % ph._TN
        if n_pad:
            planes = jnp.pad(planes, ((0, n_pad), (0, 0), (0, 0)))
        return planes

    planes = jax.block_until_ready(jax.jit(build)(meshes.verts))
    inv_s = 1.0 / (min(H, W) / 2.0)
    return planes, TILE, inv_s, blur, K_HITS


def topk_select_call(planes, tile, inv_s, blur, K):
    """The selection-only pallas_call, exactly as _tile_topk_reinterp
    issues it (pallas_hard.py:452-466) minus the XLA re-interpolation."""
    import functools as _ft

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from torch_renderer_tpu.rasterize import pallas_hard as ph

    N, _, F = planes.shape
    tp = tile * tile
    fc = ph._face_chunk_width(F)
    return pl.pallas_call(
        _ft.partial(ph._topk_select_kernel, tile, inv_s, blur, 1e-5, True,
                    K, F, fc),
        grid=(N // ph._TN,),
        in_specs=[pl.BlockSpec((ph._TN, 16, F), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ph._TN, 8 * K, tp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, 8 * K, tp), jnp_f32()),
        scratch_shapes=[pltpu.VMEM((tp, F), jnp_f32())],
        interpret=ph._interpret(),
    )(planes)


def build_points_planes(B=4, P=20000, S=256, K_PTS=8):
    """scripts/bench_points.py's point scene (default the 4x20k/256^2/K=8
    bench; pass B=2, P=100000, S=512 for the scale envelope) -> the point
    selection kernel's (N, 8, Ppad) planes slab + the gather's inputs
    (planes (B, N, C), RankBins, Pmax) — the same assembly as
    points._rasterize_points_binned's pallas branch."""
    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.rasterize.binning import bin_ranks
    from torch_renderer_tpu.rasterize.pallas_points import _PC, _TN
    from torch_renderer_tpu.rasterize.points import (
        PointsRasterizationSettings,
        project_points_screen,
        suggest_points_per_bin,
    )
    from torch_renderer_tpu.structures.pointclouds import Pointclouds

    TILE = 16
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((B, P, 3)).astype(np.float32) * 0.8
    feats = rng.uniform(0.0, 1.0, (B, P, 3)).astype(np.float32)
    pcd = Pointclouds(
        points=jnp.asarray(pts), num_points=jnp.full((B,), P, jnp.int32),
        features=jnp.asarray(feats),
    )
    f = 0.8 * S
    Kmat = np.array([[f, 0, S / 2], [0, f, S / 2], [0, 0, 1.0]], np.float32)
    cam = PerspectiveCamera.from_K(
        Kmat, (S, S),
        R=np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)),
        t=np.tile(np.array([0.0, 0.0, 2.5], np.float32), (B, 1)))
    settings = PointsRasterizationSettings(
        (S, S), radius=0.01, bin_size=TILE)
    Pmax = suggest_points_per_bin(pcd, cam, settings)
    q, z, valid = project_points_screen(pcd, cam, settings.znear)
    r = jnp.full((B, P), 0.01)
    bins = bin_ranks(q - r[..., None], q + r[..., None], valid,
                     (S, S), TILE)
    T = bins.slot.shape[1]
    r2 = jnp.full((B, P), 0.01 ** 2)
    planes = jnp.concatenate([
        jnp.stack([q[..., 0], q[..., 1], z], axis=-1),
        jnp.broadcast_to(jax.lax.broadcasted_iota(
            jnp.float32, (1, P, 1), 1), (B, P, 1)),
        jnp.asarray(feats),
    ], axis=-1)                                       # (B, P, 7)

    from torch_renderer_tpu.rasterize.binning import gather_rank_channels

    ch = gather_rank_channels(planes, bins, Pmax)     # (B, T, Pmax, 7)
    capped = jnp.minimum(bins.count, Pmax)
    valid_t = (jax.lax.broadcasted_iota(jnp.int32, (1, 1, Pmax), 2)
               < capped[:, :, None]).astype(jnp.float32)
    Ppad = Pmax + (-Pmax) % _PC
    padp = lambda a: jnp.pad(
        a, ((0, 0), (0, 0), (0, 0), (0, Ppad - Pmax)))
    ksl = jnp.swapaxes(ch[..., :3], 2, 3)
    ksl = jnp.concatenate(
        [ksl, jnp.full((B, T, 1, Pmax), 0.01 ** 2)], axis=2)
    origins = jnp.broadcast_to(bins.tile_origin[None], (B, T, 2))
    orow = jnp.zeros((B, T, 1, Ppad), jnp.float32)
    orow = orow.at[..., 0, 0].set(origins[..., 0])
    orow = orow.at[..., 0, 1].set(origins[..., 1])
    crow = jnp.zeros((B, T, 1, Ppad), jnp.float32)
    crow = crow.at[..., 0, 0].set(
        (-(-capped // _PC)).astype(jnp.float32))
    planes_k = jnp.concatenate([
        padp(ksl), padp(valid_t[:, :, None, :]),
        jnp.zeros((B, T, 1, Ppad), jnp.float32), orow, crow,
    ], axis=2).reshape(B * T, 8, Ppad)
    padN = (-(B * T)) % _TN
    if padN:
        planes_k = jnp.pad(planes_k, ((0, padN), (0, 0), (0, 0)))
    from torch_renderer_tpu.rasterize.binning import tile_pixel_coords

    plocal = tile_pixel_coords((S, S), TILE)          # (tp, 2)
    n_chunks = int(np.asarray(
        (-(-jnp.minimum(bins.count, Pmax) // _PC)).sum()))
    return (planes_k, planes, bins, Pmax, TILE, plocal, K_PTS,
            n_chunks, B, T, P)


def jnp_f32():
    import jax.numpy as jnp

    return jnp.float32


# ---------------------------------------------------------------------------
# main
# ---------------------------------------------------------------------------


def step_anatomy(profile_steps: int = 3):
    """North-star WHOLE-STEP accounting (VERDICT r3 weak #3): profile
    bench.py's scan pass on the device and itemize every HLO op >= 1% of
    the per-render-step time — kernels (bounded by the roofline table) AND
    the non-kernel residual (gathers, scatters, formatting, scan
    plumbing), so the measured-FPS vs kernel-ceiling gap is attributable
    line by line. Regenerate: python scripts/roofline.py --step"""
    import glob
    import gzip
    import json
    import shutil
    import tempfile

    import jax

    import bench

    step, sargs = bench.make_scan_step()
    out = jax.block_until_ready(step(*sargs))  # compile + warm
    log_dir = tempfile.mkdtemp(prefix="trt_step_")
    try:
        jax.profiler.start_trace(log_dir)
        for _ in range(profile_steps):
            out = step(*sargs)
        jax.block_until_ready(out)
        jax.profiler.stop_trace()

        from xprof.convert import raw_to_tool_data as rtd

        files = glob.glob(
            os.path.join(log_dir, "plugins/profile/*/*.xplane.pb"))
        data, _ = rtd.xspace_to_tool_data(files, "op_profile", {})
        if isinstance(data, bytes):
            try:
                data = gzip.decompress(data)
            except OSError:
                pass
        j = json.loads(data)
    finally:
        shutil.rmtree(log_dir, ignore_errors=True)

    denom = profile_steps * bench.STEPS  # render steps profiled

    def t_ms(node):
        m = node.get("metrics", {})
        return (m.get("rawTime", 0) or m.get("time", 0)) / 1e9 / denom

    progs = j["byProgramExcludeIdle"].get("children", [])
    prog = max(progs, key=t_ms)  # the scan pass program
    total = t_ms(prog)
    fps = bench.B / total * 1e3
    print(f"north-star step anatomy: {total:.4f} ms/render-step "
          f"({fps:.0f} img/s device-side), ops >= 1%:")
    print("| op | category | ms/step | % | expression |")
    print("|---|---|---|---|---|")
    entries = []
    for cat in prog.get("children", []):
        for op in cat.get("children", []):
            entries.append((t_ms(op), cat["name"], op))
    entries.sort(reverse=True, key=lambda e: e[0])
    shown = 0.0
    for ms, cname, op in entries:
        if ms < total * 0.01:
            continue
        shown += ms
        expr = (op.get("xla", {}) or {}).get("expression", "")
        expr = expr.split(" = ", 1)[-1][:80]
        print(f"| {op['name']} | {cname} | {ms:.4f} | "
              f"{ms / total * 100:.1f} | {expr} |")
    print(f"(listed {shown:.4f} ms = {shown / total * 100:.0f}%; "
          f"remainder is the sub-1% tail)")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--counts-only", action="store_true",
                    help="print op models and exit (no timing)")
    ap.add_argument("--envelope", action="store_true",
                    help="add the 2x100k-point/512^2 scale-envelope rows "
                         "for the point selection kernel + candidate "
                         "gather (VERDICT r4 task 4)")
    ap.add_argument("--step", action="store_true",
                    help="whole-step anatomy of the north-star scan pass "
                         "(device op profile, ops >= 1%)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_app_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if args.step:
        step_anatomy()
        return
    import jax.numpy as jnp

    from torch_renderer_tpu.rasterize import pallas_soft as ps

    rows = []

    # ---- soft packed fwd/bwd (north-star) ----
    planes, TILE, inv_s, SIGMA = build_soft_planes()
    meta = np.asarray(planes[:, 7, 0])
    chunks_soft = int(meta.sum())
    tp = TILE * TILE
    fwd_v, fwd_m, fwd_dots = soft_fwd_chunk_ops(TILE)
    bwd_v, bwd_m, bwd_dots = soft_bwd_chunk_ops(TILE)
    rows.append(dict(
        name="soft fwd (packed)", calls=chunks_soft,
        vpu=fwd_v * chunks_soft, mxu=fwd_m * chunks_soft,
        dot=fwd_dots[0]))
    rows.append(dict(
        name="soft bwd (packed)", calls=chunks_soft,
        vpu=bwd_v * chunks_soft, mxu=bwd_m * chunks_soft,
        dot=bwd_dots[0]))

    # ---- topk select (joint fit) ----
    tplanes, TTILE, tinv_s, blur, K_HITS = build_topk_planes()
    F_lanes = tplanes.shape[2]
    nck = np.asarray(tplanes[:, 15, 0])
    live_rows = int((nck > 0).sum())
    chunks_topk = int(nck.sum())
    ttp = TTILE * TTILE
    t1_v, t1_m, _ = topk_chunk_ops(TTILE, blur, 1e-5, True)
    t2_v, t2_m, _ = topk_extract_ops(TTILE, F_lanes)
    rows.append(dict(
        name="topk select", calls=chunks_topk,
        vpu=t1_v * chunks_topk + t2_v * K_HITS * live_rows,
        mxu=0, dot=None))

    # ---- point selection kernel + candidate gather (bench_points scene) ----
    (pplanes, gplanes, pbins, Pmax, PTILE, plocal, K_PTS, chunks_pts,
     B_pts, T_pts, N_pts) = build_points_planes()
    Ppad = pplanes.shape[2]
    ptp = PTILE * PTILE
    live_tiles = int((np.asarray(pplanes[:, 7, 0]) > 0).sum())
    p1_v, p1_m, _ = points_chunk_ops(PTILE)
    p2_v, p2_m, _ = points_extract_ops(PTILE, Ppad)
    rows.append(dict(
        name="points select", calls=chunks_pts,
        vpu=p1_v * chunks_pts + p2_v * K_PTS * live_tiles,
        mxu=0, dot=None))
    C3_pts = 3 * gplanes.shape[-1]
    from torch_renderer_tpu.rasterize.binning import gather_rank_channels
    # mirror gather_rank_channels' post-overshoot-fix chunking exactly
    # (the old `1 + budget // x` rounding here would model t_chunk=3 at
    # Pmax=384 — the cliff configuration the library no longer runs)
    t_chunk_g = max(1, 16_000_000 // (Pmax * N_pts))
    if (t_chunk_g + 1) * Pmax * N_pts <= int(1.1 * 16_000_000):
        t_chunk_g += 1
    t_chunk_g = min(T_pts, t_chunk_g)
    n_g_chunks = -(-T_pts // t_chunk_g)
    t_chunk_g = -(-T_pts // n_g_chunks)
    gv, gm, gdot = points_gather_ops(t_chunk_g, Pmax, N_pts, C3_pts)
    # calibrate the dot at a VMEM-sized k (rate is ~per-flop at large k)
    gdot = (gdot[0], min(gdot[1], 2048)) + gdot[2:]
    rows.append(dict(
        name="points gather (xla)", calls=n_g_chunks * B_pts,
        vpu=gv * n_g_chunks * B_pts, mxu=gm * n_g_chunks * B_pts,
        dot=gdot))

    # ---- scale envelope: 2x100k points at 512^2 (--envelope) ----
    env = None
    if args.envelope:
        (eplanes, egplanes, ebins, ePmax, _, eplocal, eK, echunks,
         eB, eT, eN) = build_points_planes(B=2, P=100000, S=512)
        ePpad = eplanes.shape[2]
        e_live = int((np.asarray(eplanes[:, 7, 0]) > 0).sum())
        e2_v, _, _ = points_extract_ops(PTILE, ePpad)
        rows.append(dict(
            name="points select @2x100k/512", calls=echunks,
            vpu=p1_v * echunks + e2_v * eK * e_live, mxu=0, dot=None))
        et_chunk = max(1, 16_000_000 // (ePmax * eN))
        if (et_chunk + 1) * ePmax * eN <= int(1.1 * 16_000_000):
            et_chunk += 1
        et_chunk = min(eT, et_chunk)
        e_n_chunks = -(-eT // et_chunk)
        et_chunk = -(-eT // e_n_chunks)
        egv, egm, egdot = points_gather_ops(
            et_chunk, ePmax, eN, 3 * egplanes.shape[-1])
        egdot = (egdot[0], min(egdot[1], 2048)) + egdot[2:]
        rows.append(dict(
            name="points gather @2x100k/512", calls=e_n_chunks * eB,
            vpu=egv * e_n_chunks * eB, mxu=egm * e_n_chunks * eB,
            dot=egdot))
        env = (eplanes, egplanes, ebins, ePmax, eplocal, eK)

    # ---- texsample fwd/bwd (joint-fit texture scale) ----
    from torch_renderer_tpu.ops import pallas_texsample as pt

    TH = TW = 256
    C, P, Btex = 3, 32768, 2
    Hmp, Wmp = pt._pad_up(TH, 8), pt._pad_up(TW, 128)
    pb = pt._PB
    nblk = pt._pad_up(P, pb) // pb
    tex_blocks = Btex * nblk
    xf_v, xf_m, xf_dots = texsample_fwd_ops(Hmp, Wmp, C, pb)
    xb_v, xb_m, xb_dots = texsample_bwd_ops(Hmp, Wmp, C, pb)
    rows.append(dict(
        name="texsample fwd", calls=tex_blocks,
        vpu=xf_v * tex_blocks, mxu=xf_m * tex_blocks, dot=xf_dots[0]))
    rows.append(dict(
        name="texsample bwd", calls=tex_blocks,
        vpu=xb_v * tex_blocks, mxu=xb_m * tex_blocks, dot=xb_dots[0]))

    if args.counts_only:
        for r in rows:
            print(f"{r['name']:18s} calls={r['calls']:6d} "
                  f"vpu={r['vpu']/1e6:9.1f}M  mxu={r['mxu']/1e6:9.1f}MF")
        return

    # ---- calibration ----
    print("calibrating device rates...", file=sys.stderr, flush=True)
    vpu_rate, mxu_rate_fn = _calibrate(args.steps, args.repeats)
    print(f"VPU sustained: {vpu_rate/1e12:.3f} T element-ops/s",
          flush=True)

    mxu_rates = {}

    def mxu_ms(r):
        if not r["mxu"]:
            return 0.0
        d = r["dot"]
        m, k, n, lc, rc = d[:5]
        dtype = d[5] if len(d) > 5 else "f32"
        key = (m, k, n, lc, rc, dtype)
        if key not in mxu_rates:
            mxu_rates[key] = mxu_rate_fn(m, k, n, (lc, rc), dtype)
            print(f"MXU {m}x{k}x{n} c{lc}/{rc} {dtype}: "
                  f"{mxu_rates[key]/1e12:.3f} TFLOP/s", flush=True)
        return r["mxu"] / mxu_rates[key] * 1e3

    # ---- measured cuts ----
    print("measuring kernels...", file=sys.stderr, flush=True)
    floor = _scan_time(lambda p: jnp.sum(p), planes, args.steps,
                       args.repeats)
    print(f"harness floor: {floor:.3f} ms", flush=True)

    def fwd_cut(p):
        return jnp.sum(ps._tile_coverage_packed(p, TILE, inv_s, SIGMA))

    t_fwd = _scan_time(fwd_cut, planes, args.steps, args.repeats) - floor
    t_grad = _scan_time(
        lambda p: jnp.sum(jax.grad(fwd_cut)(p) ** 2), planes,
        args.steps, args.repeats) - floor  # fwd kernel DCE'd: bwd alone

    t_topk = _scan_time(
        lambda p: jnp.sum(topk_select_call(p, TTILE, tinv_s, blur, K_HITS)),
        tplanes, args.steps, args.repeats) - floor

    from torch_renderer_tpu.rasterize.pallas_points import (
        points_select_pallas,
    )

    def pts_cut(p):
        lane, live = points_select_pallas(p, PTILE, plocal, 1e-5, K_PTS)
        return jnp.sum(lane) + jnp.sum(live)

    t_pts = _scan_time(pts_cut, pplanes, args.steps, args.repeats) - floor
    # the bins ride the carried pytree, NOT the closure: a closure-captured
    # slot array is baked into the HLO as a constant — 820 MB at the
    # 2x100k/512^2 envelope shape, which the tunnel's remote-compile
    # endpoint rejects with HTTP 413
    t_pgather = _scan_time(
        lambda gs: jnp.sum(gather_rank_channels(
            gs[0], pbins._replace(slot=gs[1]), Pmax)),
        (gplanes, pbins.slot), args.steps, args.repeats) - floor

    t_epts = t_egather = None
    if env is not None:
        eplanes, egplanes, ebins, ePmax, eplocal, eK = env

        def epts_cut(p):
            lane, live = points_select_pallas(p, PTILE, eplocal, 1e-5, eK)
            return jnp.sum(lane) + jnp.sum(live)

        t_epts = _scan_time(epts_cut, eplanes, args.steps,
                            args.repeats) - floor
        t_egather = _scan_time(
            lambda gs: jnp.sum(gather_rank_channels(
                gs[0], ebins._replace(slot=gs[1]), ePmax)),
            (egplanes, ebins.slot), args.steps, args.repeats) - floor

    key = jax.random.PRNGKey(0)
    maps = jax.random.uniform(key, (Btex, TH, TW, C), jnp.float32)
    y0 = jax.random.randint(key, (Btex, P), 0, TH - 2).astype(jnp.float32)
    x0 = jax.random.randint(key, (Btex, P), 0, TW - 2).astype(jnp.float32)
    wy = jax.random.uniform(key, (Btex, P), jnp.float32)
    wx = jax.random.uniform(key, (Btex, P), jnp.float32)

    def tex_fwd_cut(mwx):
        m, w = mwx
        return jnp.sum(pt.sample_bilinear_pallas(m, y0, x0, wy, w))

    def tex_bwd_cut(mwx):
        g = jax.grad(lambda m, w: tex_fwd_cut((m, w)), argnums=(0, 1))
        gm, gw = g(*mwx)
        return jnp.sum(gm ** 2) + jnp.sum(gw ** 2)

    tex_floor = _scan_time(lambda mw: jnp.sum(mw[1]), (maps, wx),
                           args.steps, args.repeats)
    t_texf = _scan_time(tex_fwd_cut, (maps, wx), args.steps,
                        args.repeats) - tex_floor
    t_texb = _scan_time(tex_bwd_cut, (maps, wx), args.steps,
                        args.repeats) - tex_floor  # fwd DCE'd: bwd alone

    measured = {
        "soft fwd (packed)": t_fwd,
        "soft bwd (packed)": t_grad,
        "topk select": t_topk,
        "points select": t_pts,
        "points gather (xla)": t_pgather,
        "texsample fwd": t_texf,
        "texsample bwd": t_texb,
    }
    if t_epts is not None:
        measured["points select @2x100k/512"] = t_epts
        measured["points gather @2x100k/512"] = t_egather

    # ---- table ----
    bounds = [(r["vpu"] / vpu_rate * 1e3, mxu_ms(r)) for r in rows]
    print("\n| kernel | VPU ops | MXU flops | VPU bound | MXU bound |"
          " bound ms | measured ms | achieved |")
    print("|---|---|---|---|---|---|---|---|")
    for r, (vb, mb) in zip(rows, bounds):
        bound = max(vb, mb)
        meas = measured[r["name"]]
        frac = bound / meas if meas > 0 else float("nan")
        print(f"| {r['name']} | {r['vpu']/1e6:.0f}M | {r['mxu']/1e6:.0f}M |"
              f" {vb:.3f} | {mb:.3f} | {bound:.3f} | {meas:.3f} |"
              f" {frac:.2f} |")


if __name__ == "__main__":
    main()
