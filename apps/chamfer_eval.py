"""Chamfer loss-landscape evaluation: is chamfer a good pose metric?

CLI parity with chamfer_loss_evaluation.py (:77-201): sample random poses
around ground truth, score each with one batched chamfer call, and
scatter-plot chamfer vs translation/rotation error.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--poses", type=int, default=1000)
    p.add_argument("--points", type=int, default=500)
    p.add_argument("--trans-std", type=float, default=0.1)
    p.add_argument("--rot-std", type=float, default=0.5)
    p.add_argument("--plot", type=str, default=None, help="output PNG path")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_renderer_tpu.ops.sample_points import sample_points_from_meshes
    from torch_renderer_tpu.opt.pose_search import chamfer_loss_landscape

    meshes = load_scene_mesh(args)
    key = jax.random.PRNGKey(args.seed)
    k_pts, k_land = jax.random.split(key)
    pts = sample_points_from_meshes(meshes, args.points, k_pts)[0]

    out = chamfer_loss_landscape(
        k_land, pts, jnp.eye(3), jnp.zeros(3),
        n_poses=args.poses, translation_std=args.trans_std,
        rotation_std=args.rot_std,
    )
    cham = np.asarray(out["chamfer"])
    terr = np.asarray(out["trans_err"])
    rerr = np.asarray(out["rot_err"])
    print(f"{args.poses} poses: chamfer [{cham.min():.5f}, {cham.max():.5f}]")
    print(f"corr(chamfer, trans_err) = {np.corrcoef(cham, terr)[0, 1]:.3f}")
    print(f"corr(chamfer, rot_err)   = {np.corrcoef(cham, rerr)[0, 1]:.3f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, (a1, a2) = plt.subplots(1, 2, figsize=(10, 4))
        a1.scatter(terr, cham, s=3, alpha=0.4)
        a1.set_xlabel("translation error (m)"); a1.set_ylabel("chamfer")
        a2.scatter(np.degrees(rerr), cham, s=3, alpha=0.4)
        a2.set_xlabel("rotation error (deg)")
        fig.tight_layout(); fig.savefig(args.plot, dpi=120)
        print("saved", args.plot)


if __name__ == "__main__":
    main()
