"""Renderer fidelity comparison on recorded sensor data.

CLI parity with renderer_comparison_with_pyrender.py: load recorded frames
(filtered_datas.pkl format: K / extrinsic / object_pose / rendered_depth),
render the same views with OUR renderer AND an independent oracle renderer,
and report per-frame depth differences + per-stage timings — the reference's
pixel-fidelity gate (renderer_comparison_with_pyrender.py:254-259).

Oracle selection (--oracle):
  raytrace  (default) the framework's float64 numpy ray caster
            (baselines.VisRaytrace) — fully independent of the rasterizer's
            formulation and runnable in any image;
  pyrender  the reference's own OpenGL oracle, used when installed;
  none      skip the cross-renderer diff (recorded-vs-ours only).

Without --pickle it synthesizes a recording with our renderer first
(exercising the fixture pathway end to end), then still runs the
cross-renderer diff against the oracle.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, pinhole_K, setup_platform


def _diff_report(name, ours, other, interior_only=True):
    """Per-frame coverage IoU + depth diff stats. Edge pixels legitimately
    differ by sub-pixel sampling between renderers, so depth stats are taken
    on interior pixels (3x3-stable coverage) when interior_only."""
    import numpy as np

    N = ours.shape[0]
    worst = 0.0
    for i in range(N):
        cov_a, cov_b = ours[i] > 0, other[i] > 0
        both = cov_a & cov_b
        union = cov_a | cov_b
        iou = both.sum() / max(union.sum(), 1)
        sel = both
        if interior_only:
            sel = both.copy()
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    sel &= np.roll(both, (dy, dx), axis=(0, 1))
            sel[0, :] = sel[-1, :] = False
            sel[:, 0] = sel[:, -1] = False
        d = np.abs(ours[i] - other[i])[sel]
        mean_d = d.mean() if d.size else 0.0
        max_d = d.max() if d.size else 0.0
        worst = max(worst, max_d)
        print(f"[{name}] frame {i}: coverage IoU {iou:.4f}, "
              f"interior depth |diff| mean {mean_d:.5f} max {max_d:.5f}")
    return worst


def main():
    p = base_parser(__doc__)
    p.add_argument("--pickle", type=str, default=None,
                   help="recorded frames pickle (filtered_datas.pkl format)")
    p.add_argument("--image-size", type=int, default=180)
    p.add_argument("--oracle", choices=("raytrace", "pyrender", "none"),
                   default="raytrace")
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
    with timer.stage("batched depth render (ours)"):
        ours = dr.render(meshes.extend(N), rec["R"], rec["t"])
        jax.block_until_ready(ours)
    ours = np.asarray(ours)

    # cross-renderer oracle pass (the reference compares against pyrender
    # serially, one frame per OpenGL call — same shape here)
    oracle = None
    if args.oracle == "pyrender":
        from torch_renderer_tpu.baselines import VisPyrender, pyrender_available

        if not pyrender_available():
            print("pyrender not installed; falling back to --oracle raytrace")
            args.oracle = "raytrace"
        else:
            vis = VisPyrender((H, W))
    if args.oracle == "raytrace":
        from torch_renderer_tpu.baselines import VisRaytrace

        vis = VisRaytrace((H, W))
    if args.oracle != "none":
        verts, faces = meshes.verts_list()[0], meshes.faces_list()[0]
        Ks = np.asarray(rec["K"])
        if Ks.ndim == 2:
            Ks = np.broadcast_to(Ks, (N, 3, 3))
        with timer.stage(f"serial oracle renders ({args.oracle})"):
            oracle = np.stack([
                vis.quick_depth_render(
                    verts, faces, Ks[i],
                    np.concatenate([
                        np.concatenate([np.asarray(rec["R"][i], np.float64),
                                        np.asarray(rec["t"][i], np.float64)[:, None]], 1),
                        [[0.0, 0.0, 0.0, 1.0]],
                    ], 0),
                )
                for i in range(N)
            ])
    print(timer.report())

    recd = rec["depth"]
    _diff_report("ours vs recorded", ours, recd,
                 interior_only=args.pickle is not None)
    if oracle is not None:
        worst = _diff_report(f"ours vs {args.oracle}", ours, oracle)
        print(f"cross-renderer gate: worst interior |diff| {worst:.5f}")

    if args.plot:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        rows = [("recorded", recd), ("ours", ours)]
        if oracle is not None:
            rows.append((args.oracle, oracle))
        rows.append(("|ours-ref|", np.abs(ours - (oracle if oracle is not None else recd))))
        fig, axes = plt.subplots(len(rows), min(N, 4),
                                 figsize=(4 * min(N, 4), 3 * len(rows)),
                                 squeeze=False)
        for i in range(min(N, 4)):
            for r, (title, img) in enumerate(rows):
                axes[r][i].imshow(img[i]); axes[r][i].set_title(title)
                axes[r][i].axis("off")
        fig.tight_layout(); fig.savefig(args.plot, dpi=110)
        print("saved", args.plot)


if __name__ == "__main__":
    main()
