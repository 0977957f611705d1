"""Same-session A/B of the joint shape+texture fit step with and without
active-tile compaction (ROUND2 continuation; run on the real TPU).

Usage: python scripts/ab_jointfit_compact.py [--iters 250]
Prints steady it/s for active_tiles=0 (off) and auto, interleaved twice.
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=250)
    ap.add_argument("--views", type=int, default=15)
    ap.add_argument("--image-size", type=int, default=128)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:  # must run before the first backend query
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from torch_renderer_tpu.ops.icosphere import icosphere
    from torch_renderer_tpu.opt.deform_color import (
        JointFitConfig,
        JointShapeTextureFitter,
    )
    from torch_renderer_tpu.structures.meshes import Meshes

    H = W = args.image_size
    verts, faces = icosphere(args.level)
    src = Meshes.from_single(verts, faces)
    tv = verts * np.array([1.0, 0.7, 0.9], np.float32)
    tgt = Meshes.from_single(tv, faces)
    f = 0.8 * H
    K = np.array([[f, 0, W / 2.0], [0, f, H / 2.0], [0, 0, 1.0]], np.float32)

    results = {}
    fitters = {}
    for name, act in (("off", 0), ("auto", None)):
        cfg = JointFitConfig(
            n_views=args.views, n_steps=args.iters,
            scan_segment=args.iters, active_tiles=act,
        )
        fitters[name] = JointShapeTextureFitter(K, (H, W), cfg)

    from torch_renderer_tpu.structures.textures import sphere_uv_mapping

    verts_uvs = sphere_uv_mapping(verts)
    key = jax.random.PRNGKey(0)
    for round_i in range(2):
        for name, fitter in fitters.items():
            data = fitter.make_dataset(tgt)
            # warm (compile) run then timed run
            t0 = time.perf_counter()
            out = fitter.fit(src, verts_uvs, data, key)
            jax.block_until_ready(out[0])
            warm = time.perf_counter() - t0
            t0 = time.perf_counter()
            out = fitter.fit(src, verts_uvs, data, key)
            jax.block_until_ready(out[0])
            dt = time.perf_counter() - t0
            rate = args.iters / dt
            results.setdefault(name, []).append(rate)
            print(f"[round {round_i}] {name:5s}: {rate:7.1f} it/s "
                  f"({dt:.2f}s steady, first {warm:.1f}s)  "
                  f"active_tiles={fitter.renderer.settings.active_tiles}")

    for name, rates in results.items():
        print(f"{name}: {max(rates):.1f} it/s best of {len(rates)}")


if __name__ == "__main__":
    main()
