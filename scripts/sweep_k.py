"""faces_per_pixel sweep of the joint shape+texture fit — the reference's
exact K=50 soft-rasterization regime vs leaner K.

The reference runs faces_per_pixel=50 with sigma=1e-4 and blur
log(1/1e-4 - 1) * sigma (deform_mesh_with_color.py:153-159).
JointFitConfig defaults to K=8 on the claim that soft fragments beyond
~8 contribute negligibly at sigma=1e-4 — this sweep turns that claim
into a measurement: per-K steady ms/step (scan segments, min-of-N) and
converged quality (sil/rgb MSE from the fit history) on the flagship
128^2 level-4-icosphere workload.

  python scripts/sweep_k.py [--cpu] [--steps 500] [--ks 8,16,50]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--image", type=int, default=128)
    ap.add_argument("--ks", type=str, default="8,16,50")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_app_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax

    from torch_renderer_tpu.opt.deform_color import (
        JointFitConfig,
        JointShapeTextureFitter,
    )
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.structures.meshes import Meshes
    from torch_renderer_tpu.structures.textures import sphere_uv_mapping

    H = W = args.image
    verts, faces = icosphere(4)
    src = Meshes.from_single(verts, faces)
    tgt = Meshes.from_single(
        verts * np.array([1.0, 0.7, 0.9], np.float32), faces)
    verts_uvs = sphere_uv_mapping(verts)
    f = 0.8 * H
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)

    print("| K | ms/step | final sil MSE | final rgb MSE | fit wall s |")
    print("|---|---|---|---|---|")
    for k in [int(x) for x in args.ks.split(",")]:
        cfg = JointFitConfig(
            faces_per_pixel=k, n_steps=args.steps,
            scan_segment=min(250, args.steps),
            # shade_k stays at its default (2): the sweep isolates the
            # K-fragment cost the reference pays, not the shading cost
        )
        fitter = JointShapeTextureFitter(K, (H, W), cfg)
        dataset = fitter.make_dataset(tgt)
        # warm segment compiles everything; then the timed full fit
        jax.block_until_ready(fitter.fit(
            src, verts_uvs, dataset, jax.random.PRNGKey(args.seed + 1),
            n_steps=min(args.steps, cfg.scan_segment))[0])
        t0 = time.perf_counter()
        params, hist = fitter.fit(
            src, verts_uvs, dataset, jax.random.PRNGKey(args.seed))
        jax.block_until_ready(params)  # fit() ENQUEUES segments; block
        wall = time.perf_counter() - t0
        sil = float(np.asarray(hist["sil_mse"])[-10:].mean())
        rgb = float(np.asarray(hist["rgb_mse"])[-10:].mean())
        ms = wall / args.steps * 1e3
        print(f"| {k} | {ms:.2f} | {sil:.3e} | {rgb:.3e} | {wall:.1f} |",
              flush=True)


if __name__ == "__main__":
    main()
