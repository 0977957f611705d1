"""Joint shape + UV-texture optimization from multi-view renders.

CLI parity with deform_mesh_with_color.py (component 7): generate an N-view
RGB/silhouette dataset from a target mesh, then jointly optimize vertex
offsets and a full texture map; exports result_colored.obj (+MTL/PNG).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, pinhole_K, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--target-obj", type=str, default=None)
    p.add_argument("--image-size", type=int, default=128)
    p.add_argument("--views", type=int, default=15)
    p.add_argument("--iters", type=int, default=2000)
    p.add_argument("--texture-size", type=int, default=256)
    p.add_argument("--level", type=int, default=4)
    p.add_argument("--out-dir", type=str, default="joint_out")
    p.add_argument("--active-tiles", type=int, default=-1,
                   help="-1 = auto-size tile compaction (default), 0 = off, "
                        ">0 = fixed budget")
    args = p.parse_args()
    setup_platform(args)

    import dataclasses

    import jax
    import numpy as np

    from torch_renderer_tpu.io.obj import load_objs_as_meshes, save_obj
    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.opt.deform_color import (
        JointFitConfig, JointShapeTextureFitter,
    )
    from torch_renderer_tpu.structures.meshes import Meshes
    from torch_renderer_tpu.structures.textures import TexturesUV, sphere_uv_mapping

    H = W = args.image_size
    verts, faces = icosphere(args.level)
    src = Meshes.from_single(verts, faces)
    verts_uvs = sphere_uv_mapping(verts)

    if args.target_obj:
        tgt = load_objs_as_meshes([args.target_obj])
        tgt, _, _ = tgt.center_and_scale_to_unit_sphere()
    else:
        import jax.numpy as jnp

        tex = np.zeros((128, 128, 3), np.float32)
        tex[:, :, 0] = 0.8
        tex[::16, :, 1] = 0.9
        tv = verts * np.array([1.0, 0.7, 0.9], np.float32)
        tgt = Meshes.from_single(tv, faces)
        tgt = dataclasses.replace(
            tgt,
            textures=TexturesUV(
                maps=jnp.asarray(tex)[None], faces_uvs=tgt.faces[:1],
                verts_uvs=verts_uvs[None],
            ),
        )

    cfg = JointFitConfig(
        n_views=args.views, n_steps=args.iters, texture_size=args.texture_size,
        active_tiles=None if args.active_tiles < 0 else args.active_tiles,
    )
    fitter = JointShapeTextureFitter(pinhole_K((H, W)), (H, W), cfg)
    dataset = fitter.make_dataset(tgt)

    # warm the segment jit with one throwaway segment so the timed run
    # reports steady-state throughput (compile is multi-minute on the
    # tunneled TPU and would otherwise dominate the iters/sec figure)
    t0 = time.perf_counter()
    warm, _ = fitter.fit(
        src, verts_uvs, dataset, jax.random.PRNGKey(args.seed + 1),
        n_steps=min(args.iters, fitter.config.scan_segment),
    )
    jax.block_until_ready(warm["deform"])
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    params, hist = fitter.fit(src, verts_uvs, dataset, jax.random.PRNGKey(args.seed))
    jax.block_until_ready(params["deform"])
    elapsed = time.perf_counter() - t0

    sil = np.asarray(hist["sil_mse"]); rgb = np.asarray(hist["rgb_mse"])
    print(f"sil MSE {sil[:20].mean():.5f} -> {sil[-20:].mean():.5f}; "
          f"rgb MSE {rgb[:20].mean():.5f} -> {rgb[-20:].mean():.5f}")
    print(f"{args.iters} iters in {elapsed:.1f}s = "
          f"{args.iters / elapsed:.1f} iters/sec steady "
          f"(one-time compile+warmup {compile_s:.1f}s)")

    os.makedirs(args.out_dir, exist_ok=True)
    final = fitter.textured_mesh(src, verts_uvs, params)
    v, f = final.detach_to_lists()[0]
    out = os.path.join(args.out_dir, "result_colored.obj")
    save_obj(
        out, v, f,
        verts_uvs=np.asarray(verts_uvs), faces_uvs=f,
        texture_image=np.asarray(params["texture_map"]),
    )
    print("saved", out)


if __name__ == "__main__":
    main()
