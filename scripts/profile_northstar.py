"""Stage profile of the north-star step (256^2 soft silhouette grad).

Times cumulative sub-pipelines of the exact bench.py step (same scene,
same static parameters) and reports per-stage deltas:

    setup   = setup_face_planes
    bin     = + bin_faces_active (rank binning over compacted tiles)
    gather  = + gather_rank_planes + planes assembly (one-hot MXU)
    fwd     = + pallas fwd kernel + scatter/untile epilogue (full value)
    grad    = full jax.grad step (adds the bwd kernel + gather transpose)

Cumulative cuts keep every sub-pipeline a realistic fused XLA program;
deltas are approximate (fusion boundaries shift) but stable enough to
rank levers. Run on TPU (no flag) or CPU (--cpu). Same-session A/B only —
tunnel day-to-day variance reaches 1.6x (docs/ROUND2_NOTES.md).
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--image", type=int, default=256)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--layout", default="packed", choices=["lane", "packed"])
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.rasterize import binning
    from torch_renderer_tpu.rasterize.geometry import setup_face_planes
    from torch_renderer_tpu.rasterize.pallas_soft import (
        soft_silhouette_pallas_fd,
        suggest_active_tiles,
        suggest_faces_per_tile,
        suggest_group_lanes,
    )
    from torch_renderer_tpu.rasterize.soft import SOFT_CUTOFF
    from torch_renderer_tpu.structures.meshes import Meshes

    B, IMAGE, SIGMA = args.batch, args.image, 1e-4
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
    fpt = suggest_faces_per_tile(fp0, (IMAGE, IMAGE))
    act = suggest_active_tiles(fp0, (IMAGE, IMAGE))
    pad = math.sqrt(SOFT_CUTOFF * SIGMA)
    gl = None
    kernel_kw = {}
    if args.layout == "packed":
        gl = suggest_group_lanes(fp0, (IMAGE, IMAGE), active_tiles=act,
                                 faces_per_tile=fpt)
        kernel_kw = dict(layout="packed", group_lanes=gl)
    print(f"faces_per_tile={fpt} active_tiles={act} "
          f"layout={args.layout} group_lanes={gl}", file=sys.stderr)

    def cut_floor(v):
        # Calibrates the per-iteration cost of the dependent-carry scan
        # harness itself (carry add + dependence sum), so stage deltas can
        # be read net of the harness floor.
        return jnp.sum(v)

    def cut_w2c(v):
        # World->camera alone: the (B,V,3)x(B,3,3) einsum + translation.
        m = meshes.update_padded(v)
        Xc = jnp.einsum("bij,bvj->bvi", cam.R, m.verts) + cam.t[:, None, :]
        return jnp.sum(Xc)

    def cut_setup(v):
        fp = setup_face_planes(meshes.update_padded(v), cam)
        return jax.tree.map(jnp.sum, fp)

    def cut_bin(v):
        fp = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fp, (IMAGE, IMAGE), 16, pad, act)
        return bins.slot.sum() + bins.count.sum()

    def cut_gather(v):
        fp = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fp, (IMAGE, IMAGE), 16, pad, act)
        ch, mask = binning.gather_rank_planes(
            fp, bins, min(fpt, fp.num_faces),
            channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
        )
        return sum(jnp.sum(c) for c in ch.values()) + mask.sum()

    def cut_pack(v):
        # gather + translate + pack_groups (the packed layout's extra
        # contraction), stopping short of the kernel
        fp = setup_face_planes(meshes.update_padded(v), cam)
        bins = binning.bin_faces_active(fp, (IMAGE, IMAGE), 16, pad, act)
        Fmax = min(fpt, fp.num_faces)
        ch, mask = binning.gather_rank_planes(
            fp, bins, Fmax,
            channels=("qx0", "qy0", "qx1", "qy1", "qx2", "qy2"),
        )
        valid = mask.astype(jnp.float32)
        ox = bins.origin[..., 0:1]
        oy = bins.origin[..., 1:2]
        A = bins.slot.shape[1]
        e = (jnp.arange(A, dtype=jnp.int32) % 8 + 1).astype(jnp.float32)
        slabs = jnp.stack(
            [ch["qx0"] - ox, ch["qy0"] - oy, ch["qx1"] - ox, ch["qy1"] - oy,
             ch["qx2"] - ox, ch["qy2"] - oy, e[None, :, None] * valid],
            axis=-1,
        )
        packed, n_valid = binning.pack_groups(
            slabs, jnp.minimum(bins.count, Fmax), gl)
        return jnp.sum(packed) + jnp.sum(n_valid)

    def cut_fwd(v):
        fp = setup_face_planes(meshes.update_padded(v), cam)
        alpha = soft_silhouette_pallas_fd(
            fp, (IMAGE, IMAGE), sigma=SIGMA, faces_per_tile=fpt,
            active_tiles=act, **kernel_kw,
        )
        return jnp.sum(alpha)

    def cut_grad(v):
        return jnp.sum(jax.grad(cut_fwd)(v) ** 2)

    cuts = [
        ("floor", cut_floor),
        ("w2c", cut_w2c),
        ("setup", cut_setup),
        ("bin", cut_bin),
        ("gather", cut_gather),
        ("fwd", cut_fwd),
        ("grad", cut_grad),
    ]
    if args.layout == "packed":
        cuts.insert(5, ("pack", cut_pack))

    # Each cut runs as ONE jitted lax.scan whose carry depends on the cut's
    # output (v + 1e-30 * scalar: numerically a no-op, but a real data
    # dependence so XLA cannot hoist the loop-invariant body — measured:
    # an independent-body scan "ran" 4x faster because the body was CSE'd
    # to a single iteration). One dispatch per measurement also keeps the
    # tunnel's ~1.3 ms per-call host cost out of the numbers entirely.
    def scanned(fn):
        @jax.jit
        def run(v):
            def body(c, _):
                out = fn(c)
                leaves = jax.tree.leaves(out)
                dep = sum(jnp.sum(l).astype(jnp.float32) for l in leaves)
                return c + 1e-30 * dep, ()
            vf, _ = jax.lax.scan(body, v, None, length=args.steps)
            return vf
        return run

    v0 = meshes.verts
    times = {}
    for name, fn in cuts:
        print(f"compiling {name}...", file=sys.stderr, flush=True)
        run = scanned(fn)
        out = run(v0)
        jax.block_until_ready(out)  # compile + warm
        best = float("inf")
        for _ in range(args.repeats):  # min-of-N: tunnel hiccups inflate
            t0 = time.perf_counter()   # single-shot readings by >10x
            out = run(v0)
            jax.block_until_ready(out)
            best = min(best, time.perf_counter() - t0)
        times[name] = best / args.steps * 1e3

    prev = 0.0
    for name, _ in cuts:
        cum = times[name]
        print(f"{name:8s} cum {cum:7.3f} ms   delta {cum - prev:7.3f} ms")
        prev = cum
    fps = B / (times["grad"] / 1e3)
    print(f"grad step -> {fps:.1f} img/s")


if __name__ == "__main__":
    main()
