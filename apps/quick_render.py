"""Minimal renderer demo — load a mesh, render color + depth, save PNGs.

CLI parity with the reference's renderer.py (component 13: hardcoded-camera
render + imshow at import, :105-114) and myrenderer.py's GIF turntable
(:187): renders a turntable of Phong/depth frames and writes PNGs (and an
optional GIF when imageio is available).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, pinhole_K, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--frames", type=int, default=8)
    p.add_argument("--out-dir", type=str, default="render_out")
    p.add_argument("--gif", action="store_true")
    args = p.parse_args()
    setup_platform(args)

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from torch_renderer_tpu.cameras.look_at import look_at_view_transform
    from torch_renderer_tpu.renderer import MeshRenderer

    H = W = args.image_size
    meshes = load_scene_mesh(args)
    renderer = MeshRenderer(pinhole_K((H, W)), (H, W), faces_per_pixel=1)

    azims = jnp.linspace(-180.0, 180.0, args.frames, endpoint=False)
    Rs, ts = look_at_view_transform(2.7, 20.0, azims)
    out = renderer.render(
        meshes.extend(args.frames), Rs, ts, with_silhouette=True, with_rgb=True
    )

    os.makedirs(args.out_dir, exist_ok=True)
    rgb = np.asarray(out.rgb)
    depth = np.asarray(out.depth)
    frames = []
    for i in range(args.frames):
        img = (np.clip(rgb[i], 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(args.out_dir, f"rgb_{i:03d}.png"))
        d = depth[i]
        dn = (d / d.max() * 255).astype(np.uint8) if d.max() > 0 else d.astype(np.uint8)
        Image.fromarray(dn).save(os.path.join(args.out_dir, f"depth_{i:03d}.png"))
        frames.append(img)
    print(f"wrote {args.frames} rgb+depth frames to {args.out_dir}/ "
          f"(coverage {float((depth > 0).mean()):.3f})")

    if args.gif:
        try:
            import imageio

            imageio.mimsave(os.path.join(args.out_dir, "turntable.gif"), frames, fps=8)
            print("wrote turntable.gif")
        except ImportError:
            print("imageio not installed; skipped GIF")


if __name__ == "__main__":
    main()
