"""Batched depth-render benchmark — the reference's metric harness.

CLI parity with batch_rendering_test.py:341-358 (renders N depth images in
one batched call and prints per-stage timings) and myrenderer.py:258-289
(per-call latency). The serial-pyrender side of the reference comparison is
an external-oracle baseline, not a capability; here the comparison is
batched-vs-serial on the same device.
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from apps._common import base_parser, load_scene_mesh, pinhole_K, setup_platform


def main():
    p = base_parser(__doc__)
    p.add_argument("--n-views", type=int, default=120)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--reps", type=int, default=10)
    p.add_argument("--view-chunk", type=int, default=12,
                   help="views per device call (bounds the per-pixel buffers "
                        "at large image sizes)")
    p.add_argument("--bin-size", type=int, default=32)
    p.add_argument("--raster-impl", choices=["auto", "xla", "pallas"],
                   default="auto")
    p.add_argument("--max-faces-per-bin", type=int, default=0,
                   help="0 = auto-size from the scene's measured max tile "
                        "occupancy (pallas_soft.suggest_faces_per_tile)")
    p.add_argument("--active-tiles", type=int, default=0,
                   help="active-tile compaction budget; 0 = auto-size from "
                        "the scene's non-empty tile count (at 720p ~80%% of "
                        "tiles are empty), -1 = disable compaction")
    p.add_argument("--select-impl", choices=["auto", "affine"],
                   default="affine",
                   help="affine: MXU affine selection keys for K=1/blur=0 "
                        "(division-free -denom ordering; winner parity "
                        "except eps-level z ties)")
    p.add_argument("--no-occupancy-split", action="store_true",
                   help="disable the two-budget occupancy split (auto-sized "
                        "via suggest_occupancy_split_fd when active tiles "
                        "are compacted)")
    args = p.parse_args()
    setup_platform(args)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from torch_renderer_tpu.cameras.look_at import look_at_view_transform
    from torch_renderer_tpu.renderer import DepthRender
    from torch_renderer_tpu.utils.timing import StageTimer, time_fn

    H, W = args.height, args.width
    N = args.n_views
    meshes = load_scene_mesh(args)
    K = pinhole_K((H, W))

    azims = jnp.linspace(0.0, 360.0, N, endpoint=False)
    Rs, ts = look_at_view_transform(2.7, 15.0, azims)

    mfb = args.max_faces_per_bin
    act = args.active_tiles
    split = None
    if mfb == 0 or act == 0:
        from torch_renderer_tpu.cameras.perspective import PerspectiveCamera
        from torch_renderer_tpu.rasterize.binning import (
            count_overflow,
            suggest_active_tiles_fd,
            suggest_occupancy_split_fd,
        )
        from torch_renderer_tpu.rasterize.geometry import setup_faces

        # size budgets from ALL views (a single chunk's azimuth range can
        # under-count an asymmetric scene's densest tiles; overflowing
        # bins silently drop faces)
        cam0 = PerspectiveCamera.from_K(K, (H, W), R=Rs, t=ts)
        fd0 = setup_faces(meshes.extend(N), cam0)
        if mfb == 0:
            max_count, _ = count_overflow(fd0, (H, W), args.bin_size, 0, 0.0)
            mfb = max(8, int(float(max_count) * 1.3))
            print(f"auto max_faces_per_bin = {mfb} "
                  f"(measured max {int(max_count)})")
        if act == 0:
            act = suggest_active_tiles_fd(fd0, (H, W), args.bin_size, 0.0)
            print(f"auto active_tiles = {act}")
        if act > 0 and not args.no_occupancy_split:
            split = suggest_occupancy_split_fd(
                fd0, (H, W), args.bin_size, 0.0, act, mfb
            )
            print(f"auto occupancy_split = {split}")

    renderer = DepthRender(
        K, (H, W), pixel_chunk=1048576,
        bin_size=args.bin_size, max_faces_per_bin=mfb,
        impl=args.raster_impl,
        active_tiles=None if act < 0 else act,
        occupancy_split=split if act > 0 else None,
        select_impl=args.select_impl,
    )
    vc = min(args.view_chunk, N)
    batched = meshes.extend(vc)

    timer = StageTimer()
    with timer.stage("h2d+setup"):
        Rs = jax.device_put(Rs)
        ts = jax.device_put(ts)
        jax.block_until_ready((Rs, ts))

    # Multi-chip: shard each chunk's VIEW axis over every chip (views are
    # independent — zero collectives). shard_map rather than sharded-inputs
    # jit: the K=1 Pallas selection kernel is opaque to GSPMD's auto
    # partitioner. Validated on the 8-virtual-CPU-device mesh
    # (tests/test_apps_smoke.py); engages automatically on real multi-chip
    # hardware. (SURVEY.md §2d's FPS/chip protocol, like bench.py.)
    n_chips = len(jax.devices())
    if n_chips > 1 and vc % n_chips == 0:
        from jax import shard_map

        from torch_renderer_tpu.parallel.mesh import data_mesh, data_specs

        device_mesh = data_mesh()
        render = jax.jit(shard_map(
            lambda m, R, t: renderer.render(m, R, t),
            mesh=device_mesh,
            in_specs=(data_specs(batched), data_specs(Rs[:vc]),
                      data_specs(ts[:vc])),
            out_specs=data_specs(jax.ShapeDtypeStruct((vc, H, W),
                                                      jnp.float32)),
            check_vma=False,
        ))
        print(f"view axis sharded over {n_chips} chips "
              f"({vc // n_chips} views/chip/call)")
    else:
        if n_chips > 1:
            print(f"NOT sharding: view_chunk {vc} % {n_chips} chips != 0")
        render = jax.jit(lambda m, R, t: renderer.render(m, R, t))

    def render_all():
        outs = []
        for v0 in range(0, N, vc):
            idx = [min(v0 + i, N - 1) for i in range(vc)]
            outs.append(render(batched, Rs[idx, :], ts[idx, :]))
        jax.block_until_ready(outs)
        return outs

    res = time_fn(render_all, reps=args.reps,
                  name=f"batched depth render {N}x{H}x{W} (chunks of {vc})")
    print(res)
    fps = N / res.mean_s
    print(f"throughput: {fps:.1f} depth images/sec (batched)"
          + (f" = {fps / n_chips:.1f}/chip over {n_chips} chips"
             if n_chips > 1 and vc % n_chips == 0 else ""))

    # serial single-view loop for comparison (the pyrender-style pattern)
    single = jax.jit(lambda m, R, t: renderer.render(m, R, t))
    r1 = time_fn(single, meshes, Rs[:1], ts[:1], reps=min(args.reps, 5),
                 name="serial single-view render")
    print(r1)
    print(f"serial-equivalent: {1.0 / r1.mean_s:.1f} images/sec "
          f"-> batching speedup {fps * r1.mean_s:.1f}x")

    depth = np.asarray(render(batched, Rs[:vc, :], ts[:vc, :]))
    print("depth stats: shape", depth.shape, "coverage",
          float((depth > 0).mean()), "max", float(depth.max()))


if __name__ == "__main__":
    main()
