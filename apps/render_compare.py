"""Renderer fidelity comparison on recorded sensor data.

CLI parity with renderer_comparison_with_pyrender.py: load recorded frames
(filtered_datas.pkl format: K / extrinsic / object_pose / rendered_depth),
render the same views with OUR renderer, and report per-frame depth
differences + per-stage timings. Without --pickle it self-checks: renders a
synthetic scene, perturbs nothing, and verifies the recorded-ingestion path
round-trips (diff == 0).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, pinhole_K, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--pickle", type=str, default=None,
                   help="recorded frames pickle (filtered_datas.pkl format)")
    p.add_argument("--image-size", type=int, default=180)
    p.add_argument("--plot", type=str, default=None, help="diff image PNG")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import numpy as np

    from torch_renderer_tpu.io.fixtures import load_recorded_frames, save_recorded_frames
    from torch_renderer_tpu.renderer import DepthRender
    from torch_renderer_tpu.cameras.look_at import look_at_view_transform
    from torch_renderer_tpu.utils.timing import StageTimer

    meshes = load_scene_mesh(args)

    if args.pickle is None:
        # synthesize a recorded file with our own renderer, then ingest it —
        # validates the fixture pathway end to end
        H = W = args.image_size
        K = pinhole_K((H, W))
        R, t = look_at_view_transform(2.5, 20.0, [0.0, 60.0, 140.0])
        dr = DepthRender(K, (H, W))
        depth = np.asarray(dr.render(meshes.extend(3), R, t))
        frames = []
        for i in range(3):
            ext = np.eye(4, dtype=np.float32)
            ext[:3, :3] = np.asarray(R)[i]
            ext[:3, 3] = np.asarray(t)[i]
            frames.append({
                "object_id": i, "object_pose": np.eye(4, dtype=np.float32),
                "extrinsic": ext, "intrinsic": K, "rendered_depth": depth[i],
            })
        args_pickle = "/tmp/recorded_selfcheck.pkl"
        save_recorded_frames(args_pickle, frames)
        print(f"(self-check mode: wrote {args_pickle})")
    else:
        args_pickle = args.pickle

    rec = load_recorded_frames(args_pickle)
    N, H, W = rec["depth"].shape
    print(f"{N} recorded frames @ {H}x{W}")

    timer = StageTimer()
    with timer.stage("camera+renderer construction"):
        dr = DepthRender(rec["K"], (H, W))
    with timer.stage("batched depth render"):
        ours = dr.render(meshes.extend(N), rec["R"], rec["t"])
        jax.block_until_ready(ours)
    print(timer.report())

    ours = np.asarray(ours)
    recd = rec["depth"]
    both = (ours > 0) & (recd > 0)
    union = (ours > 0) | (recd > 0)
    for i in range(N):
        d = np.abs(ours[i] - recd[i])[both[i]]
        iou = both[i].sum() / max(union[i].sum(), 1)
        print(f"frame {i}: coverage IoU {iou:.4f}, "
              f"depth |diff| mean {d.mean() if d.size else 0:.5f} "
              f"max {d.max() if d.size else 0:.5f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(3, min(N, 4), figsize=(4 * min(N, 4), 9),
                                 squeeze=False)
        for i in range(min(N, 4)):
            axes[0][i].imshow(recd[i]); axes[0][i].set_title("recorded")
            axes[1][i].imshow(ours[i]); axes[1][i].set_title("ours")
            axes[2][i].imshow(np.abs(ours[i] - recd[i])); axes[2][i].set_title("|diff|")
            for r in range(3):
                axes[r][i].axis("off")
        fig.tight_layout(); fig.savefig(args.plot, dpi=110)
        print("saved", args.plot)


if __name__ == "__main__":
    main()
