"""faces_per_pixel sweep of the joint shape+texture fit — the reference's
exact K=50 soft-rasterization regime vs leaner K.

The reference runs faces_per_pixel=50 with sigma=1e-4 and blur
log(1/1e-4 - 1) * sigma (deform_mesh_with_color.py:153-159).
JointFitConfig defaults to K=8 on the claim that soft fragments beyond
~8 contribute negligibly at sigma=1e-4 — this sweep turns that claim
into a measurement: per-K steady ms/step (scan segments, min-of-N) and
converged quality on the flagship 128^2 level-4-icosphere workload.

Quality protocol (VERDICT r4 task 2): the round-4 table read quality off
the last 10 MINIBATCH steps (2 random views each) of a single seed — a
high-variance endpoint that mis-stated a noise-level gap as a 46% delta.
This version reports, per K, mean +- std over --seeds independent fits of

  * full-view sil/rgb MSE: every dataset view re-rendered with the fitted
    params through the fit's own renderer (self-consistent, same K);
  * CHAMFER distance between points sampled on the fitted and target
    surfaces — a renderer-independent geometry metric, so a real
    high-K optimization defect cannot hide behind a blend-regime change
    of the silhouette MSE scale;
  * the minibatch tail mean (the old column) for comparison.

  python scripts/sweep_k.py [--cpu] [--steps 500] [--ks 8,16,50] [--seeds 3]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def full_view_eval(fitter, params, src, verts_uvs, dataset):
    """(sil_mse, rgb_mse) over ALL dataset views with the fitted params."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from torch_renderer_tpu.structures.textures import TexturesUV

    n = dataset["R"].shape[0]
    mesh = src.offset_verts(params["deform"])
    tex = TexturesUV(
        maps=jnp.broadcast_to(
            params["texture_map"][None], (n,) + params["texture_map"].shape
        ),
        faces_uvs=jnp.repeat(src.faces[:1], n, axis=0),
        verts_uvs=jnp.broadcast_to(verts_uvs[None], (n,) + verts_uvs.shape),
    )
    batched = dataclasses.replace(mesh.extend(n), textures=tex)
    out = fitter.renderer.render(
        batched, dataset["R"], dataset["t"],
        with_silhouette=True, with_rgb=True,
    )
    sil = float(jnp.mean((out.silhouette - dataset["sil"]) ** 2))
    rgb = float(jnp.mean((out.rgb - dataset["rgb"]) ** 2))
    return sil, rgb


def chamfer_to_target(params, src, tgt, key, n_samples: int = 5000):
    """Renderer-independent geometry quality: chamfer between surfaces."""
    import jax

    from torch_renderer_tpu.ops.knn_chamfer import chamfer_distance
    from torch_renderer_tpu.ops.sample_points import sample_points_from_meshes

    k1, k2 = jax.random.split(key)
    fitted = src.offset_verts(params["deform"])
    p_fit = sample_points_from_meshes(fitted, n_samples, k1)
    p_tgt = sample_points_from_meshes(tgt, n_samples, k2)
    cham, _ = chamfer_distance(p_fit, p_tgt)
    return float(cham)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--image", type=int, default=128)
    ap.add_argument("--ks", type=str, default="8,16,50")
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--trajectory", action="store_true",
                    help="also print the per-100-step sil_mse trajectory "
                         "(is the fit still descending at the end?)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_app_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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

    fmt = lambda m, s: f"{m:.3e}±{s:.1e}"
    print(f"seeds={args.seeds} steps={args.steps} image={H}^2")
    print("| K | ms/step | full sil MSE | full rgb MSE | chamfer "
          "| tail sil MSE (old metric) |")
    print("|---|---|---|---|---|---|")
    for k in [int(x) for x in args.ks.split(",")]:
        cfg = JointFitConfig(
            faces_per_pixel=k, n_steps=args.steps,
            scan_segment=min(250, args.steps),
            # shade_k stays at its default (2): the sweep isolates the
            # K-fragment cost the reference pays, not the shading cost
        )
        fitter = JointShapeTextureFitter(K, (H, W), cfg)
        dataset = fitter.make_dataset(tgt)
        # warm segment compiles everything; then the timed full fits
        jax.block_until_ready(fitter.fit(
            src, verts_uvs, dataset, jax.random.PRNGKey(args.seed + 991),
            n_steps=min(args.steps, cfg.scan_segment))[0])
        sils, rgbs, chams, tails, walls = [], [], [], [], []
        for s in range(args.seeds):
            key = jax.random.PRNGKey(args.seed + s)
            t0 = time.perf_counter()
            params, hist = fitter.fit(src, verts_uvs, dataset, key)
            jax.block_until_ready(params)  # fit() ENQUEUES segments; block
            walls.append(time.perf_counter() - t0)
            sil_f, rgb_f = full_view_eval(fitter, params, src, verts_uvs,
                                          dataset)
            sils.append(sil_f)
            rgbs.append(rgb_f)
            chams.append(chamfer_to_target(
                params, src, tgt, jax.random.PRNGKey(1234)))
            tails.append(float(np.asarray(hist["sil_mse"])[-10:].mean()))
            if args.trajectory:
                traj = np.asarray(hist["sil_mse"])
                pts = ", ".join(
                    f"{traj[i]:.2e}"
                    for i in range(99, len(traj), 100)
                )
                print(f"  K={k} seed={s} sil trajectory@100s: {pts}",
                      flush=True)
        ms = min(walls) / args.steps * 1e3
        row = (f"| {k} | {ms:.2f} "
               f"| {fmt(np.mean(sils), np.std(sils))} "
               f"| {fmt(np.mean(rgbs), np.std(rgbs))} "
               f"| {fmt(np.mean(chams), np.std(chams))} "
               f"| {fmt(np.mean(tails), np.std(tails))} |")
        print(row, flush=True)


if __name__ == "__main__":
    main()
