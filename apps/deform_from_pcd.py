"""Mesh deformation demo: sphere -> target via chamfer + regularizers.

CLI parity with the reference's deform_mesh_from_pcd.py (sphere->dolphin,
SGD lr=1.0 momentum=0.9, weights 1.0/1.0/0.01/0.1, periodic OBJ snapshots;
reference :131-250). Saves snapshot OBJs + the final mesh.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--target-obj", type=str, default=None,
                   help="target mesh OBJ (default: generated ellipsoid)")
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--samples", type=int, default=1000)
    p.add_argument("--lr", type=float, default=1.0)
    p.add_argument("--snapshot-every", type=int, default=500)
    p.add_argument("--out-dir", type=str, default="deform_out")
    p.add_argument("--level", type=int, default=4,
                   help="icosphere subdivision of the source (4 = 2562 verts)")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import numpy as np

    from torch_renderer_tpu.io.obj import load_objs_as_meshes, save_obj
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.opt.deform import DeformConfig, MeshDeformer
    from torch_renderer_tpu.structures.meshes import Meshes

    verts, faces = icosphere(args.level)
    src = Meshes.from_single(verts, faces)

    if args.target_obj:
        tgt = load_objs_as_meshes([args.target_obj])
        tgt, _, _ = tgt.center_and_scale_to_unit_sphere()
    else:
        tv, tf = icosphere(args.level)
        tgt = Meshes.from_single(
            tv * np.array([1.0, 0.6, 0.4], np.float32), tf
        )

    cfg = DeformConfig(n_samples=args.samples, lr=args.lr, n_steps=args.iters)
    deformer = MeshDeformer(src, target_meshes=tgt, config=cfg)

    t0 = time.perf_counter()
    mesh, deform, hist, snaps = deformer.fit(
        jax.random.PRNGKey(args.seed), snapshot_every=args.snapshot_every
    )
    jax.block_until_ready(deform)
    elapsed = time.perf_counter() - t0

    cham = np.asarray(hist["chamfer"])
    print(f"chamfer: {cham[0]:.5f} -> {cham[-1]:.5f}")
    print(f"{args.iters} iters in {elapsed:.2f}s = {args.iters / elapsed:.1f} iters/sec")

    os.makedirs(args.out_dir, exist_ok=True)
    for i, s in enumerate(snaps):
        v, f = s.detach_to_lists()[0]
        save_obj(os.path.join(args.out_dir, f"snapshot_{i:03d}.obj"), v, f)
    v, f = mesh.detach_to_lists()[0]
    out = os.path.join(args.out_dir, "geometry_result.obj")
    save_obj(out, v, f)
    print("saved", out)


if __name__ == "__main__":
    main()
