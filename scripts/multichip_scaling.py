#!/usr/bin/env python
"""Multi-chip scaling harness for the dp+tp north-star training step.

Runs the sharded soft-silhouette pose-optimization step
(parallel.sharded.make_sharded_pose_step — batch over the 'data' axis,
faces over the 'model' axis) across mesh shapes (1,1) -> (d,m) and reports
steady images/sec and images/sec/chip.

Today this runs on an N-virtual-device CPU mesh
(xla_force_host_platform_device_count) because only one physical TPU chip
is reachable; the SAME script runs unchanged on real multi-chip hardware
(drop --cpu and it uses jax.devices()). Committed CPU-mesh numbers live in
docs/BENCHMARKS.md.

Usage:
  python scripts/multichip_scaling.py --cpu --devices 8 --steps 30
  python scripts/multichip_scaling.py            # real hardware, all chips
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--cpu", action="store_true",
                   help="force an N-virtual-device CPU mesh")
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--batch-per-chip", type=int, default=2)
    p.add_argument("--image-size", type=int, default=64)
    p.add_argument("--level", type=int, default=2, help="icosphere level")
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--json", type=str, default=None,
                   help="write results to this JSON file")
    p.add_argument("--workload",
                   choices=["pose", "search", "icp", "points"],
                   default="pose",
                   help="pose: dp+tp soft-silhouette pose step; search: "
                        "hypothesis-sharded GMM pose search; icp: object-"
                        "sharded batched registration; points: cloud-"
                        "batch-sharded alpha point render (weak scaling: "
                        "work grows with the data-axis size)")
    p.add_argument("--hypotheses-per-chip", type=int, default=128)
    p.add_argument("--objects-per-chip", type=int, default=16)
    p.add_argument("--clouds-per-chip", type=int, default=2)
    p.add_argument("--points-per-cloud", type=int, default=5000)
    args = p.parse_args()

    if args.cpu:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags
                + f" --xla_force_host_platform_device_count={args.devices}"
            ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np
    import optax

    from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.opt.pose_fit import pose_params_from_Rt
    from torch_renderer_tpu.parallel.mesh import make_mesh, shard_batch
    from torch_renderer_tpu.parallel.sharded import (
        make_sharded_pose_step,
        soft_silhouette_sharded,
    )
    from torch_renderer_tpu.structures.meshes import Meshes

    devices = jax.devices()
    n = min(args.devices, len(devices))
    print(f"platform={devices[0].platform} devices={n}")

    # mesh shapes to sweep: (1,1) single-chip baseline, then all (d, m)
    # factorizations of n
    shapes = [(1, 1)]
    for d in sorted({d for d in range(1, n + 1) if n % d == 0}):
        shapes.append((d, n // d))

    HW = (args.image_size, args.image_size)
    f = 0.8 * args.image_size
    K = np.array(
        [[f, 0, HW[1] / 2], [0, f, HW[0] / 2], [0, 0, 1]], np.float32
    )
    verts, faces = icosphere(args.level)

    if args.workload in ("search", "icp"):
        _run_point_workload(args, devices, shapes)
        return
    if args.workload == "points":
        _run_points_render(args, devices, shapes, K, HW)
        return

    results = []
    for (d, m) in shapes:
        nd = d * m
        B = args.batch_per_chip * d
        mesh2 = make_mesh((d, m), ("data", "model"), devices[:nd])
        meshes = Meshes.from_single(verts, faces).extend(B)
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
        t = np.tile(np.array([0.0, 0.0, 3.0], np.float32), (B, 1))
        base_cam = PerspectiveCamera.from_K(K, HW)
        cam_gt = base_cam.replace_pose(R, t)

        meshes_s = shard_batch(meshes, mesh2)
        ref = soft_silhouette_sharded(
            meshes_s, cam_gt, mesh2, pixel_chunk=2048, face_chunk=128,
        )
        refs_s = shard_batch(ref, mesh2)
        params = shard_batch(
            pose_params_from_Rt(
                R, t + np.array([0.05, -0.05, 0.1], np.float32)
            ),
            mesh2,
        )
        tx = optax.adam(1e-3)
        step = make_sharded_pose_step(
            mesh2, base_cam, tx, pixel_chunk=2048, face_chunk=128,
        )
        opt_state = tx.init(params)

        # warmup/compile
        params_w, opt_w, loss = step(params, opt_state, meshes_s, refs_s)
        jax.block_until_ready(loss)

        t0 = time.perf_counter()
        for _ in range(args.steps):
            params, opt_state, loss = step(params, opt_state, meshes_s, refs_s)
        jax.block_until_ready(loss)
        dt = time.perf_counter() - t0

        img_s = B * args.steps / dt
        row = {
            "mesh": f"({d},{m})", "chips": nd, "batch": B,
            "img_per_sec": round(img_s, 2),
            "img_per_sec_per_chip": round(img_s / nd, 2),
            "loss": float(loss),
        }
        results.append(row)
        print(
            f"mesh ({d},{m}) chips={nd} B={B}: {img_s:8.2f} img/s"
            f"  {img_s / nd:8.2f} img/s/chip  loss={float(loss):.5f}"
        )

    if args.json:
        with open(args.json, "w") as fjson:
            json.dump(
                {"platform": devices[0].platform, "image_size": HW,
                 "level": args.level, "results": results},
                fjson, indent=1,
            )
        print(f"wrote {args.json}")


def _run_points_render(args, devices, shapes, K, HW):
    """Weak-scaling sweep of the cloud-batch-sharded point render
    (parallel.sharded.render_points_sharded; SURVEY §2d — FPS/chip applies
    to every renderer): clouds per chip stay fixed, the data axis grows."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_renderer_tpu.parallel.mesh import make_mesh
    from torch_renderer_tpu.parallel.sharded import render_points_sharded
    from torch_renderer_tpu.renderer import AlphaPointRender
    from torch_renderer_tpu.structures.pointclouds import Pointclouds

    results = []
    for (d, m) in shapes:
        if m != 1:
            continue  # the cloud axis is pure data parallelism
        nd = d
        B = args.clouds_per_chip * d
        P = args.points_per_cloud
        mesh2 = make_mesh((d, 1), ("data", "model"), devices[:nd])
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((B, P, 3)).astype(np.float32) * 0.8
        feats = rng.uniform(0, 1, (B, P, 3)).astype(np.float32)
        pcd = Pointclouds(
            points=jnp.asarray(pts),
            num_points=jnp.full((B,), P, jnp.int32),
            features=jnp.asarray(feats))
        R = np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3))
        t = np.tile(np.array([0.0, 0.0, 2.5], np.float32), (B, 1))
        r = AlphaPointRender(K, HW, radius=0.02, bin_size=16,
                             max_points_per_bin=128)
        out = render_points_sharded(r, pcd, R, t, mesh2)
        jax.block_until_ready(out)  # compile + warm
        t0 = time.perf_counter()
        for _ in range(args.steps):
            out = render_points_sharded(r, pcd, R, t, mesh2)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        img_s = B * args.steps / dt
        row = {"mesh": f"({d},1)", "chips": nd, "clouds": B,
               "img_per_sec": round(img_s, 2),
               "img_per_sec_per_chip": round(img_s / nd, 2)}
        results.append(row)
        print(f"mesh ({d},1) chips={nd} clouds={B}: {img_s:8.2f} img/s"
              f"  {img_s / nd:8.2f} img/s/chip")
    if args.json:
        with open(args.json, "w") as fjson:
            json.dump({"platform": devices[0].platform,
                       "workload": "points", "results": results}, fjson,
                      indent=1)
        print(f"wrote {args.json}")


def _run_point_workload(args, devices, shapes):
    """Weak-scaling sweeps of the point-cloud workloads: per mesh shape the
    'data'-axis work grows with d (hypotheses or objects per chip stay
    fixed), so flat per-chip throughput = perfect scaling."""
    import json
    import time

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_renderer_tpu.parallel.mesh import make_mesh
    from torch_renderer_tpu.transforms.so3 import (
        euler_angles_to_matrix,
        transform_points,
    )

    key = jax.random.PRNGKey(0)
    ref = jax.random.normal(key, (256, 3)) * 0.2
    ref = ref * jnp.asarray([1.0, 0.6, 0.35])  # break rotational symmetry
    gt_R = euler_angles_to_matrix(jnp.array([0.3, -0.5, 0.9]), "XYZ")
    gt_t = jnp.array([0.15, -0.05, 0.2])
    target = transform_points(gt_R, gt_t, ref)

    results = []
    for (d, m) in shapes:
        nd = d * m
        dm = make_mesh((d, m), ("data", "model"), devices[:nd])
        if args.workload == "search":
            from torch_renderer_tpu.opt.pose_search import (
                GMMPoseSearch,
                PoseSearchConfig,
            )

            H = args.hypotheses_per_chip * d
            cfg = PoseSearchConfig(
                n_hypotheses=H, n_elite=max(8, H // 4), n_iters=5
            )
            searcher = GMMPoseSearch(ref, cfg)
            run = lambda: searcher.search(
                jax.random.PRNGKey(1), target, device_mesh=dm
            )
            out = run()  # compile
            jax.block_until_ready(out["score"])
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                out = run()
            jax.block_until_ready(out["score"])
            dt = time.perf_counter() - t0
            unit, work = "hypothesis-scores/s", H * (cfg.n_iters + 1) * reps
        else:
            from torch_renderer_tpu.opt.registration import (
                RegisterDataConfig,
                create_register_data,
                register_batch_sharded,
            )

            B = args.objects_per_chip * d
            data = create_register_data(
                jax.random.PRNGKey(2), ref,
                RegisterDataConfig(n_objects=B, crop_fraction=0.3),
            )
            run = lambda: register_batch_sharded(data, dm, max_iterations=25)
            sol = run()
            jax.block_until_ready(sol.rmse)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                sol = run()
            jax.block_until_ready(sol.rmse)
            dt = time.perf_counter() - t0
            unit, work = "objects/s", B * reps

        rate = work / dt
        row = {
            "mesh": f"({d},{m})", "chips": nd, "unit": unit,
            "rate": round(rate, 2),
            "rate_per_chip": round(rate / nd, 2),
        }
        results.append(row)
        print(f"mesh ({d},{m}) chips={nd}: {rate:10.2f} {unit}"
              f"  {rate / nd:10.2f} per chip")

    if args.json:
        with open(args.json, "w") as fjson:
            json.dump(
                {"platform": devices[0].platform,
                 "workload": args.workload, "results": results},
                fjson, indent=1,
            )
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
