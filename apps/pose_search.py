"""GMM cross-entropy global pose search (+ optional ICP refinement).

CLI parity with pytorch3d_icp_evaluation.py (ICPTensorEvalutor :117-341):
perturb a ground-truth pose, optionally crop/noise the target cloud, then
search SE(3) with chamfer-scored GMM resampling — fully on-device (the
reference round-trips to sklearn on the host every EM iteration).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, setup_platform


def write_iteration_plots(plot_dir: str, out, gt_t=None) -> None:
    """Per-EM-iteration hypothesis scatter + GMM ellipse overlay PNGs
    (translation x/y dims), the reference's PUResults diagnostic
    (pytorch3d_icp_evaluation.py:244-279 saves one scatter+ellipse figure
    per EM iteration)."""
    import os
    from types import SimpleNamespace

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import numpy as np

    from torch_renderer_tpu.utils.plotting import plot_gmm_ellipses

    os.makedirs(plot_dir, exist_ok=True)
    poses = np.asarray(out["iter_poses"])      # (n_iters, H, 6)
    scores = np.asarray(out["iter_scores"])    # (n_iters, H)
    means = np.asarray(out["gmm_means"])
    var = np.asarray(out["gmm_var"])
    weights = np.asarray(out["gmm_weights"])
    for i in range(poses.shape[0]):
        gmm_i = SimpleNamespace(
            means=means[i], var=var[i], weights=weights[i]
        )
        _, ax = plt.subplots(figsize=(5, 5))
        plot_gmm_ellipses(gmm_i, ax=ax)
        sc = ax.scatter(
            poses[i, :, 0], poses[i, :, 1], c=scores[i], s=6,
            cmap="viridis",
        )
        plt.colorbar(sc, ax=ax, label="chamfer")
        if gt_t is not None:
            g = np.asarray(gt_t)
            ax.plot(g[0], g[1], "r*", markersize=12, label="gt")
            ax.legend(loc="upper right")
        ax.set_xlabel("t_x")
        ax.set_ylabel("t_y")
        ax.set_title(
            f"EM iter {i}: best {float(np.min(scores[i])):.4f}"
        )
        path = os.path.join(plot_dir, f"em_iter_{i:02d}.png")
        plt.savefig(path, dpi=110, bbox_inches="tight")
        plt.close()
    print(f"wrote {poses.shape[0]} EM-iteration plots to {plot_dir}/")


def main():
    p = base_parser(__doc__)
    p.add_argument("--points", type=int, default=500)
    p.add_argument("--hypotheses", type=int, default=400)
    p.add_argument("--elite", type=int, default=100)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--refine", action="store_true", help="ICP-refine the result")
    p.add_argument("--batch", type=int, default=0,
                   help="also run a vmapped multi-target search over N targets "
                        "(serving-scale demo)")
    p.add_argument("--mesh-shape", type=str, default=None,
                   help="'d,m' device-mesh shape: shard the hypothesis sweep "
                        "(and --batch targets) over the 'data' axis "
                        "(d*m must equal the device count)")
    p.add_argument("--plot-dir", type=str, default=None,
                   help="write a per-EM-iteration hypothesis scatter + GMM "
                        "ellipse overlay PNG (the reference's PUResults "
                        "diagnostic, pytorch3d_icp_evaluation.py:244-279)")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_renderer_tpu.ops.icp import SimilarityTransform, iterative_closest_point
    from torch_renderer_tpu.ops.sample_points import sample_points_from_meshes
    from torch_renderer_tpu.opt.pose_search import (
        GMMPoseSearch, PoseSearchConfig, pose_errors,
    )
    from torch_renderer_tpu.transforms.so3 import (
        euler_angles_to_matrix, transform_points,
    )

    meshes = load_scene_mesh(args)
    key = jax.random.PRNGKey(args.seed)
    k_pts, k_pose, k_search = jax.random.split(key, 3)
    ref = sample_points_from_meshes(meshes, args.points, k_pts)[0]
    if args.obj is None:
        # generated icosphere is rotationally symmetric -> squash it and bolt
        # on an off-axis lobe so the rotation is observable (the reference
        # uses asymmetric YCB objects)
        ref = ref * jnp.asarray([1.0, 0.6, 0.35])
        ref = ref.at[: args.points // 6].add(jnp.asarray([0.7, 0.3, 0.0]))

    gt_rpy = jax.random.uniform(k_pose, (3,), minval=-0.8, maxval=0.8)
    gt_t = jnp.asarray([0.15, -0.1, 0.2])
    gt_R = euler_angles_to_matrix(gt_rpy, "XYZ")
    target = transform_points(gt_R, gt_t, ref)

    cfg = PoseSearchConfig(
        n_hypotheses=args.hypotheses, n_elite=args.elite, n_iters=args.iters,
    )
    device_mesh = None
    if args.mesh_shape:
        from torch_renderer_tpu.parallel.mesh import make_mesh

        shape = tuple(int(s) for s in args.mesh_shape.split(","))
        device_mesh = make_mesh(shape)
        print(f"device mesh {dict(device_mesh.shape)} over "
              f"{len(device_mesh.devices.flat)} devices")

    searcher = GMMPoseSearch(ref, cfg)
    t0 = time.perf_counter()
    out = searcher.search(k_search, target, device_mesh=device_mesh)
    jax.block_until_ready(out["score"])
    elapsed = time.perf_counter() - t0

    terr, rerr = pose_errors(out["pose6d"][None], gt_R, gt_t)
    print(f"search: {args.iters} EM iters x {args.hypotheses} hypotheses in "
          f"{elapsed:.2f}s (incl. compile); best chamfer {float(out['score']):.5f}")
    print(f"pose error: trans {float(terr[0]):.4f} m, "
          f"rot {np.degrees(float(rerr[0])):.2f} deg")
    hist = np.asarray(out["best_history"])
    print("best-score history:", np.array2string(hist, precision=4))

    if args.plot_dir:
        write_iteration_plots(args.plot_dir, out, gt_t)

    if args.refine:
        init = SimilarityTransform(
            R=out["R"][None], t=out["t"][None], s=jnp.ones((1,))
        )
        sol = iterative_closest_point(
            ref[None], target[None], init_transform=init, max_iterations=50
        )
        from torch_renderer_tpu.ops.knn_chamfer import chamfer_distance

        cham, _ = chamfer_distance(sol.Xt, target[None])
        print(f"after ICP refinement: surface chamfer {float(cham):.6f}, "
              f"rmse {float(sol.rmse[0]):.6f}")

    if args.batch:
        B = args.batch
        kb, kp = jax.random.split(jax.random.PRNGKey(args.seed + 1))
        rpys = jax.random.uniform(kp, (B, 3), minval=-0.8, maxval=0.8)
        tb = jax.random.uniform(kb, (B, 3), minval=-0.2, maxval=0.2)
        Rb = euler_angles_to_matrix(rpys, "XYZ")
        targets = transform_points(
            Rb, tb, jnp.broadcast_to(ref, (B,) + ref.shape)
        )
        t0 = time.perf_counter()
        outs = searcher.search_batch(
            jax.random.PRNGKey(args.seed + 2), targets,
            device_mesh=device_mesh,
        )
        jax.block_until_ready(outs["score"])
        dt = time.perf_counter() - t0
        scores = np.asarray(outs["score"])
        print(f"batched search over {B} targets: {dt:.2f}s (incl. compile), "
              f"chamfer mean {scores.mean():.5f} max {scores.max():.5f}")


if __name__ == "__main__":
    main()
