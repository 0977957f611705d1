"""Camera pose optimization demo — the flagship analysis-by-synthesis loop.

CLI parity with the reference's camera_pose_optimizer.py (renders reference
depth/silhouette/RGB of a mesh, perturbs the pose, fits a 7-DoF
translation+quaternion camera with Adam; reference :205-341). The whole
optimization runs as ONE jitted lax.scan on device; prints per-phase loss,
final pose errors and iters/sec (the BASELINE.json secondary metric).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, pinhole_K, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--iters", type=int, default=500)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--no-rgb", action="store_true")
    p.add_argument("--occlusion", action="store_true",
                   help="patch-occlude the reference depth (robustness test)")
    p.add_argument("--perturb-t", type=float, default=0.1)
    p.add_argument("--bin-size", type=int, default=None,
                   help="coarse-to-fine rasterizer tile size (e.g. 16); "
                        "~1.6x faster steps on TPU")
    p.add_argument("--max-faces-per-bin", type=int, default=128)
    p.add_argument("--silhouette-impl", choices=["fragments", "pallas"],
                   default="fragments",
                   help="'pallas' = exact all-faces fused-kernel silhouette "
                        "+ K=1 fragments (~6x faster steps on TPU)")
    p.add_argument("--active-tiles", type=int, default=-1,
                   help="tile-compaction budget for the binned rasterizer "
                        "and pallas silhouette; -1 = auto-size from GT and "
                        "start poses with 2x margin (the footprint moves "
                        "during the fit), 0 = off")
    p.add_argument("--select-impl", choices=["auto", "affine"],
                   default="auto",
                   help="affine selection keys for the K=1/blur=0 depth/RGB "
                        "rasterization (pallas silhouette mode only)")
    p.add_argument("--sil-layout", choices=["lane", "packed"], default="lane",
                   help="pallas silhouette kernel layout; 'packed' shares "
                        "one lane axis across the 8 tiles of a program "
                        "(fastest; needs active tiles on — group budget is "
                        "auto-sized from GT and start poses with 2x margin)")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import numpy as np

    from torch_renderer_tpu.cameras.look_at import look_at_view_transform
    from torch_renderer_tpu.opt.pose_fit import (
        CameraPoseFitter, PoseFitConfig, pose_params_from_Rt, pose_params_to_Rt,
    )

    H = W = args.image_size
    meshes = load_scene_mesh(args)
    K = pinhole_K((H, W))
    R_gt, t_gt = look_at_view_transform(2.7, 15.0, 40.0)
    R_gt, t_gt = np.asarray(R_gt)[0], np.asarray(t_gt)[0]

    rng = np.random.default_rng(args.seed)
    t0_ = t_gt + args.perturb_t * rng.standard_normal(3).astype(np.float32)

    act = None if args.active_tiles == 0 else args.active_tiles
    sil_act = act if act and act > 0 else None
    need_auto_act = act is not None and act < 0
    need_sil_cfg = args.sil_layout == "packed"

    # project ONCE at both poses the fit traverses (GT and perturbed
    # start); every budget below is sized from both with 2x margin — the
    # moving-footprint protocol (candidates/tiles beyond a static budget
    # are dropped like bin overflow, silently zeroing their gradients)
    fds = None
    if need_auto_act or need_sil_cfg:
        from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
        from torch_renderer_tpu.rasterize.geometry import setup_faces

        fds = [
            setup_faces(meshes, PerspectiveCamera.from_K(
                K, (H, W), R=Rp[None], t=tp_[None]))
            for Rp, tp_ in ((R_gt, t_gt), (R_gt, t0_))
        ]

    if need_auto_act:
        from torch_renderer_tpu.rasterize.binning import (
            suggest_active_tiles_fd, tile_grid,
        )

        need = max(
            suggest_active_tiles_fd(fd, (H, W), args.bin_size or 16, 0.0,
                                    margin=2.0)
            for fd in fds
        )
        TH, TW, _ = tile_grid((H, W), args.bin_size or 16)
        act = need if need < TH * TW else None
        sil_act = act
        print(f"auto active_tiles = {act}")

    sil_cfg = None
    if need_sil_cfg:
        from torch_renderer_tpu.rasterize.pallas_soft import (
            suggest_soft_config,
        )

        sil_cfg = suggest_soft_config(fds, (H, W), margin=2.0,
                                      layout="packed")
        if sil_act is not None:
            # an explicit/auto --active-tiles budget wins over the
            # suggestion (kept consistent with the hard path's budget)
            sil_cfg = sil_cfg._replace(active_tiles=sil_act)
        print(f"auto sil config = {sil_cfg}")

    cfg = PoseFitConfig(lr=args.lr, n_steps=args.iters, use_rgb=not args.no_rgb)
    fitter = CameraPoseFitter(
        K, (H, W), cfg,
        bin_size=args.bin_size, max_faces_per_bin=args.max_faces_per_bin,
        silhouette_impl=args.silhouette_impl,
        sil_active_tiles=sil_act,
        sil_layout=args.sil_layout,
        sil_config=sil_cfg,  # overrides the individual sil_* knobs

        active_tiles=act if args.bin_size else None,
        # pallas mode renders depth/RGB at K=1/blur=0: the affine
        # selection keys apply (division-free; bit-exact winners on every
        # scene tested)
        select_impl=args.select_impl,
    )
    occ_key = jax.random.PRNGKey(args.seed) if args.occlusion else None
    refs = fitter.make_references(meshes, R_gt, t_gt, occlusion_key=occ_key)
    params0 = pose_params_from_Rt(R_gt, t0_)

    t_start = time.perf_counter()
    params, hist = fitter.fit(meshes, refs, params0)
    jax.block_until_ready(params)
    elapsed = time.perf_counter() - t_start

    losses = np.asarray(hist["loss"])
    ious = np.asarray(hist["iou"])
    _, t_fit = pose_params_to_Rt(params)
    err0 = float(np.linalg.norm(t0_ - t_gt))
    err1 = float(np.linalg.norm(np.asarray(t_fit)[0] - t_gt))
    print(f"loss: {losses[0]:.5f} -> {losses[-1]:.5f}   iou: {ious[0]:.3f} -> {ious[-1]:.3f}")
    print(f"translation error: {err0:.4f} -> {err1:.4f} m")
    print(f"{args.iters} iters in {elapsed:.2f}s (incl. compile) = "
          f"{args.iters / elapsed:.1f} iters/sec")


if __name__ == "__main__":
    main()
