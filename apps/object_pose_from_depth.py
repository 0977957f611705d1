"""Object pose fit against recorded depth frames.

CLI parity with the reference's pose_optimizer.py: load recorded sensor
frames (filtered_datas.pkl format: intrinsic/extrinsic/object_pose/
rendered_depth), build depth+silhouette references from the recorded depth
(:41-61), and optimize the object pose with Adam (:119-150 — note the
reference's loop is missing optimizer.step(); this one optimizes).
Without --pickle, it synthesizes a recording first (self-contained demo).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, pinhole_K, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--pickle", type=str, default=None)
    p.add_argument("--frame", type=int, default=0, help="recorded frame index")
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--perturb-t", type=float, default=0.08)
    p.add_argument("--object-pose", action="store_true",
                   help="optimize ONE object 4x4 pose through the recorded "
                        "fixed per-frame extrinsics (the reference's "
                        "cam_ext @ object_mat chain, pose_optimizer.py:88-91) "
                        "jointly over --frames")
    p.add_argument("--frames", type=int, nargs="*", default=None,
                   help="frame indices for --object-pose (default: just "
                        "--frame). Pass several ONLY when the recorded "
                        "frames observe the SAME object pose: "
                        "filtered_datas.pkl's frames 0/1 share an object id "
                        "but record two DIFFERENT object_pose matrices (two "
                        "time steps), so a joint fit over them would "
                        "average contradictory references")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import numpy as np

    from torch_renderer_tpu.cameras.look_at import look_at_view_transform
    from torch_renderer_tpu.io.fixtures import load_recorded_frames, save_recorded_frames
    from torch_renderer_tpu.opt.pose_fit import (
        DepthPoseFitter, PoseFitConfig, pose_params_from_Rt, pose_params_to_Rt,
    )
    from torch_renderer_tpu.renderer import DepthRender

    meshes = load_scene_mesh(args)

    if args.pickle is None:
        H = W = 160
        K = pinhole_K((H, W))
        R, t = look_at_view_transform(2.6, 25.0, 35.0)
        depth = np.asarray(DepthRender(K, (H, W)).render(meshes, R, t))[0]
        ext = np.eye(4, dtype=np.float32)
        ext[:3, :3] = np.asarray(R)[0]
        ext[:3, 3] = np.asarray(t)[0]
        args.pickle = "/tmp/object_pose_recording.pkl"
        save_recorded_frames(args.pickle, [{
            "object_id": 0, "object_pose": np.eye(4, dtype=np.float32),
            "extrinsic": ext, "intrinsic": K, "rendered_depth": depth,
        }])
        print(f"(demo mode: synthesized recording at {args.pickle})")

    rec = load_recorded_frames(args.pickle)
    i = args.frame
    H, W = rec["depth"].shape[1:]

    if args.object_pose:
        from torch_renderer_tpu.opt.pose_fit import ObjectPoseFitter

        # default: single frame — recorded datasets may store a DIFFERENT
        # object pose per frame of the same object (filtered_datas.pkl
        # does), and a joint fit needs frames that observe one static pose
        frames = args.frames if args.frames else [i]
        F = len(frames)
        fitter = ObjectPoseFitter(
            rec["K"][frames], (H, W), rec["extrinsic"][frames],
            PoseFitConfig(lr=args.lr, use_rgb=False),
        )
        refs = fitter.references_from_recorded(rec["depth"][frames])
        obj_gt = rec["object_pose"][i]
        rng = np.random.default_rng(args.seed)
        obj0 = obj_gt.copy()
        perturb = args.perturb_t * rng.standard_normal(3).astype(np.float32)
        obj0[:3, 3] += perturb
        params0 = ObjectPoseFitter.params_from_object_pose(obj0)

        t_start = time.perf_counter()
        params, hist = fitter.fit(
            meshes.extend(F), refs, params0, n_steps=args.iters
        )
        jax.block_until_ready(params)
        elapsed = time.perf_counter() - t_start
        losses = np.asarray(hist["loss"])
        M = np.asarray(fitter.object_pose(params))
        err0 = float(np.linalg.norm(perturb))
        err1 = float(np.linalg.norm(M[:3, 3] - obj_gt[:3, 3]))
        print(f"object-pose fit over {F} frame(s) {frames}: "
              f"loss {losses[0]:.5f} -> {losses[-1]:.5f}; "
              f"object translation err {err0:.4f} -> {err1:.4f} m; "
              f"{args.iters / elapsed:.1f} iters/sec (incl. compile)")
        return

    fitter = DepthPoseFitter(
        rec["K"][i], (H, W), PoseFitConfig(lr=args.lr, use_rgb=False)
    )
    refs = fitter.references_from_recorded(rec["depth"][i])

    rng = np.random.default_rng(args.seed)
    t0_ = rec["t"][i] + args.perturb_t * rng.standard_normal(3).astype(np.float32)
    params0 = pose_params_from_Rt(rec["R"][i], t0_)

    t_start = time.perf_counter()
    params, hist = fitter.fit(meshes, refs, params0, n_steps=args.iters)
    jax.block_until_ready(params)
    elapsed = time.perf_counter() - t_start

    losses = np.asarray(hist["loss"])
    _, t_fit = pose_params_to_Rt(params)
    err0 = float(np.linalg.norm(t0_ - rec["t"][i]))
    err1 = float(np.linalg.norm(np.asarray(t_fit)[0] - rec["t"][i]))
    print(f"loss {losses[0]:.5f} -> {losses[-1]:.5f}; "
          f"translation err {err0:.4f} -> {err1:.4f} m; "
          f"{args.iters / elapsed:.1f} iters/sec (incl. compile)")


if __name__ == "__main__":
    main()
