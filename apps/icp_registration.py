"""Batched ICP registration benchmark: accuracy + device-vs-CPU timing sweep.

CLI parity with pytorch3d_icp_registeration.py: N synthetic pairs with known
SE(3) perturbations + crop/noise (reference :77-152), one batched on-device
ICP vs a per-object CPU solver (reference ICP_on_GPU :154-185 / ICP_on_CPU
:191-238), translation/rotation error stats (:299-330) and the object-count
scaling sweep (time_running_statistic :240-257).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--objects", type=int, default=300)
    p.add_argument("--points", type=int, default=500)
    p.add_argument("--icp-iters", type=int, default=100)
    p.add_argument("--crop", type=float, default=0.0)
    p.add_argument("--noise", type=float, default=0.0)
    p.add_argument("--sweep", action="store_true",
                   help="object-count scaling sweep (1..100) vs CPU reference")
    p.add_argument("--mesh-shape", type=str, default=None,
                   help="'d,m' device-mesh shape: shard the object axis over "
                        "the 'data' axis (d*m must equal the device count)")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import numpy as np

    from torch_renderer_tpu.ops.sample_points import sample_points_from_meshes
    from torch_renderer_tpu.opt.registration import (
        RegisterDataConfig, create_register_data, evaluate_registration,
        icp_cpu_reference, register_batch, register_batch_sharded,
    )

    if args.mesh_shape:
        from torch_renderer_tpu.parallel.mesh import make_mesh

        shape = tuple(int(s) for s in args.mesh_shape.split(","))
        dm = make_mesh(shape)
        print(f"device mesh {dict(dm.shape)} over "
              f"{len(dm.devices.flat)} devices")
        register_batch = lambda data, max_iterations: register_batch_sharded(
            data, dm, max_iterations=max_iterations
        )

    meshes = load_scene_mesh(args)
    key = jax.random.PRNGKey(args.seed)
    k_pts, k_data = jax.random.split(key)
    base = sample_points_from_meshes(meshes, args.points, k_pts)[0]

    cfg = RegisterDataConfig(
        n_objects=args.objects, crop_fraction=args.crop, noise_std=args.noise,
    )
    data = create_register_data(k_data, base, cfg)

    t0 = time.perf_counter()
    sol = register_batch(data, max_iterations=args.icp_iters)
    jax.block_until_ready(sol.rmse)
    compile_and_run = time.perf_counter() - t0
    t0 = time.perf_counter()
    sol = register_batch(data, max_iterations=args.icp_iters)
    jax.block_until_ready(sol.rmse)
    steady = time.perf_counter() - t0

    m = evaluate_registration(sol, data["gt_R"], data["gt_t"])
    print(f"batched ICP over {args.objects} x {args.points}-pt clouds: "
          f"{steady:.3f}s steady ({compile_and_run:.2f}s with compile)")
    print(f"mean translation err {float(m['mean_trans_err']):.5f} m, "
          f"mean rotation err {np.degrees(float(m['mean_rot_err'])):.3f} deg, "
          f"converged {int(np.asarray(sol.converged).sum())}/{args.objects}")

    if args.sweep:
        print("\nobject-count sweep (device batched vs numpy CPU serial):")
        for n in (1, 5, 10, 25, 50, 100):
            sub = {k: v[:n] for k, v in data.items()}
            # warm up (each n is a new compiled shape)
            jax.block_until_ready(
                register_batch(sub, max_iterations=args.icp_iters).rmse
            )
            t0 = time.perf_counter()
            jax.block_until_ready(
                register_batch(sub, max_iterations=args.icp_iters).rmse
            )
            dev = time.perf_counter() - t0
            t0 = time.perf_counter()
            for b in range(min(n, 5)):  # CPU is slow; extrapolate from 5
                icp_cpu_reference(
                    np.asarray(sub["source"][b]), np.asarray(sub["target"][b]),
                    max_iterations=args.icp_iters,
                )
            cpu = (time.perf_counter() - t0) / min(n, 5) * n
            print(f"  n={n:4d}: device {dev:.3f}s  cpu(est) {cpu:.3f}s  "
                  f"speedup {cpu / dev:.1f}x")


if __name__ == "__main__":
    main()
